package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row

import scala.util.Random

/** Pins the SQL function surface (expression compositions registered via
  * the extensions) to the pure-Scala executable spec in
  * [[RangeFunctions]], over a randomized input grid evaluated in one
  * distributed pass. */
class GraftFunctionsSqlSpec extends SparkSpec {

  test("SQL functions agree with the RangeFunctions mirror on a random grid") {
    val rnd = new Random(4242)
    val rows = Seq.fill(500) {
      val s = rnd.nextInt(100000) + 1
      val e = s + rnd.nextInt(400)
      val k = rnd.nextInt(2001) - 1000
      val fix = Seq("start", "end", "center")(rnd.nextInt(3))
      val w = rnd.nextInt(199) - 99
      (s, e, k, fix, if (w == 0) 7 else w, rnd.nextBoolean(), rnd.nextBoolean())
    }
    import graft.SharedSpark.spark.implicits._
    rows.toDF("s", "e", "k", "fix", "w", "sf", "bo").createOrReplaceTempView("grid")

    val got = spark.sql(
      """SELECT s, e, k, fix, w, sf, bo,
        |  shift(s, e, k).start, shift(s, e, k).`end`,
        |  resize(s, e, k, fix).start, resize(s, e, k, fix).`end`,
        |  bdg_overlaplength(s, e, s + 10, e + 10),
        |  flank(s, e, w, sf, bo).start, flank(s, e, w, sf, bo).`end`,
        |  promoters(s, e, 100, 50).start, promoters(s, e, 100, 50).`end`,
        |  bdg_reflect(s, e, 1, 200000).start, bdg_reflect(s, e, 1, 200000).`end`
        |FROM grid""".stripMargin).collect()

    got.foreach { r =>
      val (s, e, k, fix, w, sf, bo) =
        (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3), r.getInt(4), r.getBoolean(5), r.getBoolean(6))
      val shift = RangeFunctions.shift(s, e, k)
      assert((r.getInt(7), r.getInt(8)) === (shift.start, shift.end), s"shift($s,$e,$k)")
      val resize = RangeFunctions.resize(s, e, k, fix)
      assert((r.getInt(9), r.getInt(10)) === (resize.start, resize.end), s"resize($s,$e,$k,$fix)")
      assert(r.getInt(11) === RangeFunctions.overlapLength(s, e, s + 10, e + 10))
      val flank = RangeFunctions.flank(s, e, w, sf, bo)
      assert((r.getInt(12), r.getInt(13)) === (flank.start, flank.end), s"flank($s,$e,$w,$sf,$bo)")
      val prom = RangeFunctions.promoters(s, e, 100, 50)
      assert((r.getInt(14), r.getInt(15)) === (prom.start, prom.end))
      val refl = RangeFunctions.reflect(s, e, 1, 200000)
      assert((r.getInt(16), r.getInt(17)) === (refl.start, refl.end))
    }
  }

  test("stock Java-reflection reflect() is not shadowed by the engine") {
    // Interval reflection is bdg_reflect only; plain reflect must stay
    // Spark's built-in (r2 ADVICE — a graft session must not lose stock SQL).
    val r = spark.sql("SELECT reflect('java.lang.String', 'valueOf', 42)").collect()
    assert(r.head.getString(0) === "42")
  }

  test("cigar_coverage_events and md_mismatches are SQL-callable") {
    val ev = spark.sql(
      "SELECT cigar_coverage_events(100, 109, '5M3N2M') AS e").collect().head
    val rows = ev.getSeq[org.apache.spark.sql.Row](0)
    assert(rows.map(r => (r.getInt(0), r.getInt(1))) ===
      Seq((100, 1), (105, -1), (108, 1), (110, -1)))
    val mm = spark.sql(
      "SELECT md_mismatches(100, '10M', '4A5', 'CCCCGCCCCC', 'IIIIJIIIII') AS m")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(mm.map(r => (r.getInt(0), r.getString(1), r.getInt(2))) ===
      Seq((104, "G", 'J' - 33)))
  }

  test("clean_contig SQL matches the mirror on representative names") {
    import graft.SharedSpark.spark.implicits._
    val names = Seq("chr1", "chr22", "chrX", "chrM", "chrMT", "M", "MT", "7", "chr7_alt")
    names.toDF("c").createOrReplaceTempView("contigs")
    spark.sql("SELECT c, clean_contig(c), bdg_clean_contig(c) FROM contigs")
      .collect().foreach { r =>
        assert(r.getString(1) === r.getString(2), r.getString(0))
        assert(r.getString(1) === RangeFunctions.cleanContig(r.getString(0)), r.getString(0))
      }
  }

  test("text-curation SQL functions match the DataFrame columns exactly") {
    import graft.SharedSpark.spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "the quick brown fox and the lazy dog"),
      (2L, "der hund und die katze"), (3L, "a a a a a"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("tf_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, token_count(text) AS n_tokens,
        |  quality_score(text) AS q, lang_guess(text) AS lg,
        |  doc_fingerprint(text) AS fp, split_assign(doc_id) AS split
        |FROM tf_docs""".stripMargin).collect()
    val viaDf = graft.operators.TextOps.assignSplits(docs)
      .select(col("doc_id"), graft.operators.TextOps.tokenCount(col("text")),
        graft.operators.TextOps.qualityScore(col("text")),
        graft.operators.TextOps.langGuess(col("text")),
        graft.operators.TextOps.fingerprint(col("text")), col("split"))
      .collect()
    assert(viaSql.map(_.toString).sorted.toSeq === viaDf.map(_.toString).sorted.toSeq)
    // Registration must not shadow any stock function the session uses.
    assert(spark.sql("SELECT reflect('java.lang.String','valueOf', 7)").head.getString(0) === "7")
  }

  test("unclean_contig restores UCSC names and inverts clean_contig") {
    import graft.SharedSpark.spark.implicits._
    val names = Seq("1", "22", "X", "Y", "MT", "7_alt")
    names.toDF("c").createOrReplaceTempView("norm_contigs")
    spark.sql("SELECT c, unclean_contig(c), bdg_unclean_contig(c), clean_contig(unclean_contig(c)) FROM norm_contigs")
      .collect().foreach { r =>
        assert(r.getString(1) === r.getString(2), r.getString(0))
        assert(r.getString(1) === RangeFunctions.unCleanContig(r.getString(0)), r.getString(0))
        // Round trip back to the normalized name.
        assert(r.getString(3) === r.getString(0), r.getString(0))
      }
  }
}
