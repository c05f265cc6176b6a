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
