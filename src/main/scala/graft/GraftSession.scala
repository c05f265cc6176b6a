package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed Scala facade — parity with the reference's
  * `SequilaSession(spark)` API (`utvf/SequilaSession.scala:89-113`,
  * `ss.coverage(...)`/`ss.pileup(...)`), extended with the
  * training-data-pipeline operators. Construction attaches the engine to
  * the session (strategies, scalar functions, TVFs) via [[Graft.ensure]].
  */
class GraftSession(val spark: SparkSession) {
  Graft.ensure(spark)

  /** Depth-of-coverage RLE blocks (SURVEY §2.4 A1/A2). */
  def coverage(reads: DataFrame): DataFrame = CoverageOps.blocks(reads)

  /** Mean coverage per fixed-size window (W1). */
  def coverageWindowed(reads: DataFrame, windowSize: Int): DataFrame =
    CoverageOps.windowed(reads, windowSize)

  /** Per-alt-position pileup (A3/A4), optional quality binning (A5). */
  def pileup(reads: DataFrame, qualsBinSize: Option[Int] = None): DataFrame =
    PileupOps.pileup(reads, qualsBinSize)

  /** Exact-duplicate groups over normalized text. */
  def exactDuplicates(docs: DataFrame): DataFrame = DedupOps.exactDupGroups(docs)

  /** MinHash+LSH near-duplicate pairs, exact-Jaccard verified. */
  def nearDuplicates(docs: DataFrame, threshold: Double = 0.8): DataFrame =
    DedupOps.nearDupPairs(docs, threshold)

  /** Exact cosine top-k neighbors. */
  def similarityTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    EmbeddingOps.exactTopK(corpus, queries, k)

  /** LSH-bucketed approximate cosine top-k. */
  def similarityTopKApprox(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    EmbeddingOps.lshTopK(corpus, queries, k)

  /** Text quality/language/fingerprint stats. */
  def textStats(docs: DataFrame): DataFrame = TextOps.stats(docs)

  def sql(text: String): DataFrame = spark.sql(text)
}

object GraftSession {
  def apply(spark: SparkSession): GraftSession = new GraftSession(spark)
}
