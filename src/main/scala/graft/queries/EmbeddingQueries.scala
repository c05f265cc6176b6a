package graft.queries

import graft.Tables
import graft.operators.EmbeddingOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search queries over the embeddings table. `ann_topk` is the
  * exact brute-force baseline with a DuckDB `list_cosine_similarity`
  * oracle (rank-only output — rank margins are >= 2e-4, far above any
  * double-rounding divergence). `ann_lsh_topk` is the approximate scale
  * path; no SQL oracle (bucketing isn't SQL-expressible), recall is
  * asserted in ScalaTest against the exact result.
  */
/** Train-once-per-JVM cache of the persisted IVF index, keyed by scale
  * dir — shared by the batch and streaming serve queries. Re-training on
  * every invocation would (a) make the benched "serve" number mostly
  * measure Lloyd training + artifact IO (pass 2 of the bench now times
  * the true probe-only serve), and (b) leak a fresh temp directory per
  * run. This mirrors production: training is per corpus snapshot,
  * serving is per query batch. */
private[queries] object ServeIndexCache {
  private val paths = scala.collection.concurrent.TrieMap.empty[String, String]
  def indexFor(s: SparkSession, dir: String,
      corpus: org.apache.spark.sql.DataFrame): String =
    paths.getOrElseUpdate(dir, {
      val p = java.nio.file.Files.createTempDirectory("graft-ivf-idx").toString
      new graft.GraftSession(s).ivfTrain(corpus, p)
      p
    })
}

object EmbeddingQueries {

  type Q = (SparkSession, String) => DataFrame

  private def split(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val emb = Tables.embeddings(s, dir)
    (emb, emb.filter(col("vec_id") < 20))
  }

  val queries: Map[String, Q] = Map(
    "ann_topk" -> { (s, dir) =>
      val (corpus, queries) = split(s, dir)
      EmbeddingOps.exactTopK(corpus, queries, k = 3)
    },
    "ann_lsh_topk" -> { (s, dir) =>
      val (corpus, queries) = split(s, dir)
      EmbeddingOps.lshTopK(corpus, queries, k = 3)
    },
    // IVF ANN variant (rows-only: approximate, recall asserted in spec).
    "ann_ivf_topk" -> { (s, dir) =>
      val (corpus, queries) = split(s, dir)
      EmbeddingOps.ivfTopK(corpus, queries, k = 3)
    },
    // The ANN serve lifecycle end-to-end: train the IVF index once, save
    // the artifacts (quantizer parquet + corpus assignment parquet), then
    // answer STRICTLY from the reloaded artifacts — no Lloyd pass and no
    // corpus-wide assignment on the serve side, which is the shape every
    // query batch after the first takes on a real vector store (training
    // is per corpus snapshot, serving is per batch). Rows-only like the
    // other ANN rows; served == in-memory equality asserted in
    // DedupAnnSpec.
    "ann_ivf_served" -> { (s, dir) =>
      val (corpus, queries) = split(s, dir)
      val path = ServeIndexCache.indexFor(s, dir, corpus)
      new graft.GraftSession(s).similarityTopKIvfServed(corpus, queries, k = 3, path)
    },
    // Int8-quantized scan + exact re-rank (rows-only: int8 rounding is
    // approximate; recall vs exactTopK asserted in spec).
    "ann_quantized_topk" -> { (s, dir) =>
      val (corpus, queries) = split(s, dir)
      EmbeddingOps.quantizedTopK(corpus, queries, k = 3)
    },
    // The production three-stage shape: IVF probe bounds the candidates,
    // int8 integer-dot prunes to k·factor, exact double re-ranks only
    // that pool. Rows-only; no-prune degeneracy to ivfTopKWith and
    // default-prune recall asserted in spec.
    "ann_ivf_quantized" -> { (s, dir) =>
      val (corpus, queries) = split(s, dir)
      EmbeddingOps.ivfQuantizedTopK(corpus, queries, k = 3)
    },
    // Embedding-cosine near-dup (dedup family, vector modality). No SQL
    // oracle: sign-LSH recall at this similarity band is ~0.5, so the
    // driver records a rows-only check; precision/recall are asserted in
    // DedupAnnSpec against brute force.
    "embedding_neardup" -> { (s, dir) =>
      EmbeddingOps.cosineNearDupPairs(Tables.embeddings(s, dir), threshold = 0.4)
    },
    // SemDedup (cluster-then-prune semantic dedup, Abbas et al. 2023). No
    // SQL oracle (the trained quantizer isn't SQL-expressible); the
    // nLists=1 degenerate case is proven identical to global brute force
    // and the clustered case precision/recall-asserted in DedupAnnSpec.
    "ann_semdedup" -> { (s, dir) =>
      EmbeddingOps.semDedup(Tables.embeddings(s, dir), threshold = 0.4)
    })

  val oracle: Map[String, String] = Map(
    "ann_topk" ->
      """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20),
        |sims AS (
        |  SELECT q.vec_id AS vec_id, e.vec_id AS neighbor_id,
        |         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                                CAST(e.embedding AS DOUBLE[])) AS sim
        |  FROM q JOIN embeddings e ON q.vec_id <> e.vec_id),
        |ranked AS (SELECT vec_id, neighbor_id, sim,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id
        |                              ORDER BY sim DESC, neighbor_id) AS rank
        |           FROM sims WHERE NOT isnan(sim))
        |SELECT vec_id, CAST(rank AS INT) AS rank, neighbor_id
        |FROM ranked WHERE rank <= 3""".stripMargin)
}
