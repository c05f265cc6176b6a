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
}
