package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-only aggregate pushdown into the interval join
  * ([[IntervalCountPushdownRule]] / [[IntervalCountJoinExec]]): the
  * canonical `GROUP BY key, COUNT(*)` annotation-count never materializes
  * pair rows — counts come from rank differences over the broadcast
  * index. Equality against the general join+aggregate path is the
  * correctness pin; the guards keep every non-count shape on the general
  * path. */
class IntervalCountJoinSpec extends AnyFunSuite {

  private def spark = graft.SharedSpark.spark

  private def withConf[T](key: String, value: String)(f: => T): T = {
    val old = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try f finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def hasCountExec(df: DataFrame): Boolean = {
    def walk(p: SparkPlan): Boolean = p match {
      case _: IntervalCountJoinExec => true
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case other => other.children.exists(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  private def ivs(n: Int, seed: Int, key: String): DataFrame = {
    import graft.SharedSpark.spark.implicits._
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      val s = rnd.nextInt(1000) + 1
      (i.toLong, (rnd.nextInt(3) + 1).toString, s, s + rnd.nextInt(120))
    }.toDF(key, "contig", "pos_start", "pos_end")
  }

  private def joined(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b, a("contig") === b("contig") &&
      a("pos_end") >= b("pos_start") && a("pos_start") <= b("pos_end"))

  test("count pushdown fires for both grouping sides and matches the general path") {
    graft.Graft.ensure(spark)
    val a = ivs(400, 11, "a_key")
    val b = ivs(60, 12, "b_key")
    for (key <- Seq("b_key", "a_key")) {
      val q = joined(a, b).groupBy(col(key)).agg(count(lit(1)).as("n"))
      assert(hasCountExec(q), s"pushdown did not fire grouping by $key")
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val want = withConf("spark.graft.rangejoin.countPushdown", "false") {
        val g = joined(a, b).groupBy(col(key)).agg(count(lit(1)).as("n"))
        assert(!hasCountExec(g), "conf off must keep the general path")
        g.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      }
      assert(got === want, s"pushdown result diverged grouping by $key")
      assert(got.nonEmpty)
    }
  }

  test("guards: non-count aggregates, mixed grouping, conf'd overlap stay general") {
    graft.Graft.ensure(spark)
    val a = ivs(100, 13, "a_key")
    val b = ivs(30, 14, "b_key")
    // An extra aggregate consuming a real column — counts alone can't
    // answer it.
    assert(!hasCountExec(joined(a, b).groupBy(col("b_key"))
      .agg(count(lit(1)).as("n"), sum(a("pos_start")).as("s"))))
    // count(nullable expr) counts non-nulls, not pairs. (count of a
    // NON-nullable column canonicalizes to count(1) upstream of the rule,
    // so it correctly pushes down — only a genuinely nullable child pins
    // the guard.)
    assert(!hasCountExec(joined(a, b).groupBy(col("b_key"))
      .agg(count(when(a("pos_start") > 500, a("a_key"))).as("n"))))
    // Grouping attributes from both sides.
    assert(!hasCountExec(joined(a, b).groupBy(col("b_key"), col("a_key"))
      .agg(count(lit(1)).as("n"))))
    // DISTINCT shape (grouping only, no count) is not a count.
    assert(!hasCountExec(joined(a, b).select(col("b_key")).distinct()))
    // Conf-modified overlap semantics take the general path.
    withConf("spark.graft.rangejoin.minOverlap", "5") {
      assert(!hasCountExec(joined(a, b).groupBy(col("b_key"))
        .agg(count(lit(1)).as("n"))))
    }
    withConf("spark.graft.rangejoin.maxGap", "10") {
      assert(!hasCountExec(joined(a, b).groupBy(col("b_key"))
        .agg(count(lit(1)).as("n"))))
    }
  }

  test("global count (no grouping) pushes down and matches") {
    graft.Graft.ensure(spark)
    val a = ivs(300, 15, "a_key")
    val b = ivs(40, 16, "b_key")
    val q = joined(a, b).agg(count(lit(1)).as("n"))
    assert(hasCountExec(q))
    val got = q.collect()(0).getLong(0)
    val want = withConf("spark.graft.rangejoin.countPushdown", "false") {
      joined(a, b).agg(count(lit(1)).as("n")).collect()(0).getLong(0)
    }
    assert(got === want && got > 0L)
  }

  test("rank-difference counting survives duplicate coordinates and high partition counts") {
    graft.Graft.ensure(spark)
    import graft.SharedSpark.spark.implicits._
    // Duplicate starts/ends, abutting intervals, a contig with no rights.
    val a = Seq((1L, "1", 10, 20), (2L, "1", 10, 20), (3L, "1", 21, 30),
      (4L, "1", 500, 600), (5L, "2", 5, 9), (6L, "3", 1, 2))
      .toDF("a_key", "contig", "pos_start", "pos_end")
    val b = Seq((1L, "1", 20, 25), (2L, "1", 20, 25), (3L, "1", 26, 28),
      (4L, "2", 9, 9))
      .toDF("b_key", "contig", "pos_start", "pos_end")
    withConf("spark.sql.shuffle.partitions", "16") {
      val q = joined(a, b).groupBy(col("b_key")).agg(count(lit(1)).as("n"))
      assert(hasCountExec(q))
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      // By hand: b1/b2 (20,25) overlap a1,a2 (10,20) and a3 (21,30) -> 3 each;
      // b3 (26,28) overlaps a3 -> 1; b4 (2,"9..9") overlaps a5 (5,9) -> 1.
      assert(got === Seq((1L, 3L), (2L, 3L), (3L, 1L), (4L, 1L)))
    }
  }
}
