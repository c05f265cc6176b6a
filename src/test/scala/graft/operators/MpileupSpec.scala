package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** §2.9 samtools-mpileup converter: the round-trip law over real pileup
  * output, plus the mark/indel/deletion grammar on a hand-written row
  * (reference `SamtoolsConverter` / `PileupStringUtils` semantics).
  */
class MpileupSpec extends SparkSpec {

  /** Map columns can't feed set ops; compare through the canonical
    * string renderings (the F7-F14 UDF pack) + the scalar columns. */
  private def canon(df: DataFrame): Seq[Row] = {
    graft.Graft.ensure(spark)
    df.select(col("contig"), col("pos"), col("ref"), col("coverage"),
        col("count_ref"), col("count_nonref"),
        expr("altmap_to_str(alts_to_char(alts))").as("alts"),
        expr("qualsmap_to_str(to_charmap(quals))").as("quals"))
      .collect().toSeq.sortBy(r => (r.getString(0), r.getInt(1)))
  }

  test("round-trip law: fromMpileup(toMpileup(pm)) == pm on sf0.001 reads") {
    val pm = PileupOps.pileupMaps(
      Tables.reads(spark, sf0001).filter(col("sample_id") === "s1"))
    val rt = MpileupOps.fromMpileup(MpileupOps.toMpileup(pm))
    val a = canon(pm)
    val b = canon(rt)
    assert(a.nonEmpty, "fixture must yield alt positions")
    assert(a == b)
  }

  test("fromMpileup parses marks, indels, deleted bases, lowercase folds") {
    import graft.SharedSpark.spark.implicits._
    // base-consuming symbols in order: . . G g . t *  → 7 qual chars
    // ^F = read-start mark (+mapq char), +2AC = insertion, $ = read end.
    val in = Seq(("1", 100, "A", "..Gg^F.t+2AC*$", "IIABIC5"))
      .toDF("contig", "pos", "ref", "pileup", "quals")
    val r = MpileupOps.fromMpileup(in).collect()(0)
    assert(r.getString(0) == "1" && r.getInt(1) == 100 && r.getString(2) == "A")
    assert(r.getInt(3) == 6)      // 3 ref + 3 alts; '*' not counted
    assert(r.getLong(4) == 3L)    // count_ref
    assert(r.getLong(5) == 3L)    // count_nonref
    val alts = r.getAs[Map[Byte, Short]](6)
    assert(alts == Map('G'.toByte -> 2.toShort, 'T'.toByte -> 1.toShort))
    val quals = r.getAs[Map[Byte, scala.collection.Seq[Short]]](7)
    // dense histograms: G saw quals 'A'-33=32 and 'B'-33=33; t→T saw 'C'-33=34
    assert(quals('G'.toByte).zipWithIndex.collect { case (n, q) if n > 0 => (q, n) }.toSeq
      == Seq((32, 1.toShort), (33, 1.toShort)))
    assert(quals('T'.toByte).zipWithIndex.collect { case (n, q) if n > 0 => (q, n) }.toSeq
      == Seq((34, 1.toShort)))
  }

  test("fromGatkPileup: raw char counts, case handling, contig cleaning, null quals") {
    import graft.SharedSpark.spark.implicits._
    val in = Seq(("chrM", 42, "a", 7, "..GgNt,")).toDF("contig", "pos", "ref", "cov", "pileup")
    // caseSensitive: lowercase alts stay distinct keys (reference default).
    val cs = MpileupOps.fromGatkPileup(in).collect()(0)
    assert(cs.getString(0) == "MT" && cs.getInt(1) == 42 && cs.getString(2) == "A")
    assert(cs.getInt(3) == 7)      // coverage = string length (reference parity)
    assert(cs.getLong(4) == 3L)    // '.' + ','
    assert(cs.getLong(5) == 4L)    // G g N t
    assert(cs.getAs[Map[Byte, Short]](6) ==
      Map('G'.toByte -> 1.toShort, 'g'.toByte -> 1.toShort,
          'N'.toByte -> 1.toShort, 't'.toByte -> 1.toShort))
    assert(cs.isNullAt(7))
    // caseSensitive = false folds minus-strand bases into upper keys.
    val ci = MpileupOps.fromGatkPileup(in, caseSensitive = false).collect()(0)
    assert(ci.getAs[Map[Byte, Short]](6) ==
      Map('G'.toByte -> 2.toShort, 'N'.toByte -> 1.toShort, 'T'.toByte -> 1.toShort))
  }

  test("delTransfer subtracts deletion spans from following loci (reference DelTransfer)") {
    import graft.SharedSpark.spark.implicits._
    // Row 100 declares -3 (covers 101-103) and -1 (covers 101); row 102
    // declares +2 (an INSERTION - no transfer). Raw coverages are inflated
    // as samtools would count the deleted reads' '*' placeholders.
    val in = Seq(
      ("1", 100, "A", 5, ".....-3acg-1a", "IIIII"),
      ("1", 101, "A", 6, "....", "IIII"),   // 4 real + 2 deleted
      ("1", 102, "C", 5, "....+2gg", "IIII"), // 4 real + 1 deleted
      ("1", 103, "G", 5, "....", "IIII"),   // 4 real + 1 deleted
      ("1", 104, "T", 4, "....", "IIII"),   // past both spans
      ("2", 101, "A", 3, "...", "III"))     // other contig untouched
      .toDF("contig", "pos", "ref", "coverage", "pileup", "quals")
    val out = MpileupOps.delTransfer(in)
      .select(col("contig"), col("pos"), col("coverage"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(out(("1", 100)) === 5, "anchor locus itself is not covered by its span")
    assert(out(("1", 101)) === 4, "both spans cover 101")
    assert(out(("1", 102)) === 4, "only -3 covers 102; +2 does not transfer")
    assert(out(("1", 103)) === 4, "span end is inclusive")
    assert(out(("1", 104)) === 4, "past the span")
    assert(out(("2", 101)) === 3, "contig-scoped")
    // Span extraction grammar: ^-marks guard, digits multi-char.
    val spans = MpileupOps.deletionSpans(
        Seq(("1", 50, "X", 1, "^I.-12acgtacgtacgt", "I"))
          .toDF("contig", "pos", "ref", "coverage", "pileup", "quals"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    assert(spans.toSeq === Seq(("1", 51, 62)), "multi-digit span parses")
  }

  test("round-trip with deletions: string-derived counts are del-invariant") {
    // fromMpileup derives coverage from the string (deleted '*' excluded),
    // so parsing a deletion-bearing frame equals parsing the clean one.
    val pm = PileupOps.pileupMaps(
      Tables.reads(spark, sf0001).filter(col("sample_id") === "s1"))
    val txt = MpileupOps.toMpileup(pm)
    val withDel = txt.withColumn("pileup",
      when(col("pos") % 13 === 0,
        concat(col("pileup"), lit("-2aa"))).otherwise(col("pileup")))
    assert(canon(MpileupOps.fromMpileup(withDel)) == canon(MpileupOps.fromMpileup(txt)))
  }

  test("toMpileup renders ref dots first, then alts ascending with quals aligned") {
    import graft.SharedSpark.spark.implicits._
    val pm = Seq(("1", 5, "C", 4, 2L, 2L,
        Map('G'.toByte -> 1.toShort, 'A'.toByte -> 1.toShort),
        Map('G'.toByte -> Seq[Short](0, 1),   // one G at qual 1
            'A'.toByte -> Seq[Short](1))))    // one A at qual 0
      .toDF("contig", "pos", "ref", "coverage", "count_ref", "count_nonref",
        "alts", "quals")
    val r = MpileupOps.toMpileup(pm).collect()(0)
    assert(r.getString(4) == "..AG")   // dots then bases ascending
    assert(r.getString(5) == "II!\"")  // I per ref, chr(0+33)='!', chr(1+33)='"'
  }
}
