package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pileup/coverage format converters (SURVEY §2.9) — the cross-format
  * canonicalization harness the reference uses to compare its output with
  * samtools/GATK renditions (reference `pileup/converters` package). With no external
  * tools offline, the two formats that matter are RLE blocks vs per-base
  * rows; these are exact inverses of each other and the test suite uses
  * them to round-trip coverage results.
  */
object Converters {

  /** RLE blocks → one row per covered position (reference
    * `SequilaConverter` blocks→per-base expansion). */
  def blocksToPerBase(blocks: DataFrame): DataFrame =
    blocks.select(col("contig"),
      explode(sequence(col("pos_start"), col("pos_end"))).as("pos"),
      col("coverage"))
      .withColumn("pos", col("pos").cast("int"))

  /** Per-base rows → maximal RLE blocks (gaps-and-islands). Note the
    * window is per (contig, coverage) — fine for a test-harness utility,
    * not a scale path (CoverageOps.blocks is the scale path). */
  def perBaseToBlocks(perBase: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("contig"), col("coverage")).orderBy(col("pos"))
    perBase
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("contig"), col("coverage"), col("grp"))
      .agg(min(col("pos")).cast("int").as("pos_start"), max(col("pos")).cast("int").as("pos_end"))
      .select(col("contig"), col("pos_start"), col("pos_end"), col("coverage"))
  }
}
