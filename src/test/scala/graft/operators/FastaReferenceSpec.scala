package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** Pure-JVM faidx random access ([[FastaReference]]): byte-offset
  * arithmetic across line boundaries, terminator stripping, final line
  * without a newline, CRLF files, genome edges, and unknown contigs —
  * verified against naive whole-string indexing of the same fixture. */
class FastaReferenceSpec extends AnyFunSuite {

  private def write(dir: String, name: String, fasta: String, fai: String): String = {
    val p = Paths.get(dir, name)
    Files.write(p, fasta.getBytes("UTF-8"))
    Files.write(Paths.get(dir, name + ".fai"), fai.getBytes("UTF-8"))
    p.toString
  }

  test("faidx byte math matches naive indexing across line boundaries and EOF") {
    val dir = Files.createTempDirectory("fasta_spec").toString
    val c1 = "ACGTACGTAC" * 7 + "TTGCA" // 75 bases over 10-base lines
    val c2 = "GGGCCCAATT"               // exactly one full line...
    val c3 = "ACGT"                     // ...and a last line with NO newline
    val fasta = s">c1\n${c1.grouped(10).mkString("\n")}\n" +
      s">c2\n$c2\n" +
      s">c3 some description\n$c3" // no trailing newline; name stops at space
    // Offsets: ">c1\n" = 4; c1 = 75 bases + 8 newlines = 83; ">c2\n" at 87
    // (offset 91); c2 = 11; ">c3 some description\n" at 102 (offset 123).
    val fai = s"c1\t75\t4\t10\t11\nc2\t10\t91\t10\t11\nc3\t4\t123\t10\t11\n"
    val path = write(dir, "ref.fasta", fasta, fai)
    FastaReference.clearCaches()
    for ((contig, seq) <- Seq(("c1", c1), ("c2", c2), ("c3", c3))) {
      for (pos <- 1 to seq.length) {
        assert(FastaReference.base(path, contig, pos) === seq.charAt(pos - 1).toString,
          s"mismatch at ($contig, $pos)")
      }
      // Edges: 0, negative, one past the end.
      assert(FastaReference.base(path, contig, 0) === null)
      assert(FastaReference.base(path, contig, -5) === null)
      assert(FastaReference.base(path, contig, seq.length + 1) === null)
    }
    assert(FastaReference.base(path, "absent", 1) === null)
    assert(FastaReference.base(path, null, 1) === null)
  }

  test("CRLF line terminators strip correctly (lineWidth = bases + 2)") {
    val dir = Files.createTempDirectory("fasta_spec_crlf").toString
    val seq = "ACGTTGCAACGTTGCAAC" // 18 bases over 8-base lines
    val body = seq.grouped(8).mkString("\r\n") + "\r\n"
    val fasta = s">cr\r\n$body"
    val fai = s"cr\t18\t5\t8\t10\n" // ">cr\r\n" = 5 bytes; 8 bases + CRLF
    val path = write(dir, "ref.fasta", fasta, fai)
    FastaReference.clearCaches()
    for (pos <- 1 to seq.length) {
      assert(FastaReference.base(path, "cr", pos) === seq.charAt(pos - 1).toString,
        s"mismatch at (cr, $pos)")
    }
  }

  test("refBase column annotates a frame (unknown contig and off-end are null)") {
    val spark = graft.SharedSpark.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("fasta_spec_col").toString
    val seq = "ACGTACGTACGTACGTACGT"
    val path = write(dir, "ref.fasta", s">k\n$seq\n", s"k\t20\t3\t60\t61\n")
    FastaReference.clearCaches()
    val df = Seq(("k", 1), ("k", 20), ("k", 21), ("zz", 3))
      .toDF("contig", "pos")
    val ref = new FastaReference(path)
    val q = df.select(org.apache.spark.sql.functions.col("pos"),
      ref.refBase("contig", "pos").as("ref"))
    val got = q
      .collect().map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.getString(1))).toSet
    assert(got === Set((1, "A"), (20, "T"), (21, null), (3, null)))
    // The ref base is a native expression, not a Scala UDF. (Over this
    // local relation the optimizer eval-folds the projection entirely —
    // itself proof the interpreted path works; the codegen path is pinned
    // by the pileup test below.)
    val analyzed = q.queryExecution.analyzed.toString
    assert(!analyzed.contains("ScalaUDF"), analyzed)
    assert(analyzed.contains("fasta_ref_base"), analyzed)
  }

  test("pileup over the FASTA reference plans UDF-free (flagship path)") {
    val spark = graft.SharedSpark.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("fasta_spec_pileup").toString
    val seq = "ACGTTGCA" * 16
    val path = write(dir, "ref.fasta", s">1\n$seq\n", s"1\t128\t3\t200\t201\n")
    FastaReference.clearCaches()
    val reads = Seq(
      ("s1", "1", 5, 12, 60, 0, "8M", "8", "ACGTACGT", "IIIIIIII"),
      ("s1", "1", 9, 16, 60, 0, "8M", "3T4", "TGCATGCA", "IIIIIIII"))
      .toDF("sample_id", "contig", "pos_start", "pos_end", "mapq", "flag",
        "cigar", "md_tag", "seq", "qual_str")
    val pile = PileupOps.pileup(reads, withQuals = false,
      ref = new FastaReference(path))
    val plan = pile.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"),
      "pileup-with-FASTA must not invoke a Scala UDF:\n" + plan)
    val rows = pile.collect()
    assert(rows.nonEmpty)
    // Every emitted ref base matches the fixture genome arithmetically.
    rows.foreach { r =>
      val pos = r.getAs[Int]("pos")
      assert(r.getAs[String]("ref") === seq.charAt(pos - 1).toString)
    }
  }
}
