package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Format-converter round trip (SURVEY §2.9): blocks → per-base → blocks
  * reproduces the original RLE exactly, and per-base totals match the
  * block span arithmetic. */
class ConvertersSpec extends SparkSpec {

  test("blocks -> per-base -> blocks is the identity on real coverage") {
    val reads = Tables.reads(spark, sf0001).filter(col("sample_id") === "s1")
    val blocks = CoverageOps.blocks(reads)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    val perBase = Converters.blocksToPerBase(blocks)
    assert(perBase.count() ===
      blocks.agg(sum(col("pos_end") - col("pos_start") + 1)).collect()(0).getLong(0))
    assert(key(Converters.perBaseToBlocks(perBase)) === key(blocks))
  }
}
