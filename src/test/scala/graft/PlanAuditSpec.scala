package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.SparkPlan

/** Plan audit across every registered query: no accidental cartesian
  * products or nested-loop joins — the plans that would die at 100x data.
  * `ann_topk` is the one sanctioned exception: brute-force cosine is
  * *defined* as broadcast-nested-loop over the query set (the exact
  * baseline the LSH path is measured against).
  */
class PlanAuditSpec extends SparkSpec {

  private val nestedLoopAllowed = Set("ann_topk")

  private def treeStrings(p: SparkPlan): Seq[String] = {
    val self = p.toString
    p match {
      case a: AdaptiveSparkPlanExec => Seq(self, a.executedPlan.toString)
      case _ => Seq(self)
    }
  }

  test("no cartesian products; nested-loop joins only where sanctioned") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sf0001).queryExecution.executedPlan
      val text = treeStrings(plan).mkString("\n")
      assert(!text.contains("CartesianProduct"), s"$name plans a cartesian product:\n$text")
      if (!nestedLoopAllowed(name)) {
        assert(!text.contains("BroadcastNestedLoopJoin"),
          s"$name plans a nested-loop join:\n$text")
      }
    }
  }

  test("DDL source scan pushes filters and prunes columns") {
    val plan = SparkEntry.queries("ddl_alignment_scan")(spark, sf0001)
      .queryExecution.executedPlan.toString
    // '*' marks filters fully handled by the source.
    assert(plan.contains("PushedFilters: [*"), plan)
    assert(!plan.contains("has_alt"), s"unused columns not pruned:\n$plan")
  }

  test("coverage/pileup TVFs plan the lazy pipeline execs") {
    Seq("coverage_tvf" -> "Coverage", "pileup_tvf" -> "Pileup").foreach {
      case (name, node) =>
        val plan = SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan
        assert(plan.toString.contains(node), s"$name should plan ${node}Exec")
    }
  }

  test("interval-join queries plan the forest join") {
    Seq("interval_join_count", "interval_join_pairs", "interval_join_nochr",
        "interval_join_overlap10", "grange_tvf").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan
      assert(plan.toString.contains("IntervalForestJoin"), name)
    }
  }
}
