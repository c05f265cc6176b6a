package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

/** Similarity search over an embedding column (`array<float>`).
  *
  * - [[exactTopK]] — brute-force cosine top-k: broadcast the (small) query
  *   set, stream the corpus, per-query top-k via window rank. This is the
  *   exact baseline; at 100 TB it is one corpus scan with no shuffle of
  *   the corpus (only the tiny (query, k) results move).
  * - [[lshTopK]] — random-hyperplane LSH: vectors bucketed by the sign
  *   pattern of `nPlanes` fixed random projections; candidates = corpus
  *   vectors sharing a bucket with the query (multi-probe over bands),
  *   then exact cosine re-rank. The scale path: bucket join instead of
  *   corpus × queries.
  *
  * Dot products and norms run through `zip_with`/`aggregate` higher-order
  * functions in double precision — codegen'd, sequential index order, so
  * results are reproducible across engines.
  */
object EmbeddingOps {

  /** Sequential-order double-precision cosine similarity — the native
    * codegen'd [[graft.functions.CosineSimilarity]] expression (one fused
    * loop in whole-stage codegen; the previous `zip_with`/`aggregate`
    * formulation was interpreted per element). */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact top-k neighbors (cosine, excluding self) of each query vector.
    * Output (vec_id, rank, neighbor_id) — ranks only, deterministic
    * tie-break on neighbor id. */
  def exactTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("q_id"), asDouble(col("embedding")).as("q_emb")))
    val c = corpus.select(col("vec_id").as("c_id"), asDouble(col("embedding")).as("c_emb"))
    val sims = c.join(q, col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"), cosine(col("q_emb"), col("c_emb")).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id").asc)
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id").as("vec_id"), col("rank"), col("c_id").as("neighbor_id"))
  }

  val NumPlanes = 16

  /** Fixed random hyperplanes (deterministic seed), one per signature bit. */
  private val planes: Array[Array[Double]] = {
    val rnd = new Random(987654321L)
    Array.fill(NumPlanes)(Array.fill(64)(rnd.nextGaussian()))
  }

  /** Signature bucket id: sign bits of the random projections. */
  def lshBucket(emb: Column): Column = {
    val e = asDouble(emb)
    (0 until NumPlanes).map { i =>
      val proj = aggregate(
        zip_with(e, typedLit(planes(i)), (x, p) => x * p), lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1), i)).otherwise(0)
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Approximate top-k: candidates share the full 16-bit bucket or one of
    * four 4-bit band buckets (band multi-probe keeps recall up while the
    * join stays a plain shuffle join on band keys). Exact cosine re-ranks
    * the candidates. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    // Bands carry only ids — candidate dedup happens on two longs, and
    // the (fat) embedding arrays are joined back just for the survivors.
    def banded(df: DataFrame, idCol: String): DataFrame = {
      val withB = df.select(col("vec_id").as(idCol), lshBucket(col("embedding")).as("bucket"))
      val bands = (0 until 4).map(j =>
        struct(lit(j).as("band"), shiftright(col("bucket"), j * 4).bitwiseAND(0xF).as("bh")))
      withB.select(col(idCol), explode(array(bands: _*)).as("b"))
        .select(col(idCol), col("b.band").as("band"), col("b.bh").as("bh"))
        // Barrier: stop the 16-projection bucket expression from being
        // inlined into the join keys (same pathology as DedupOps bands).
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val candidates = banded(queries, "q_id").as("x")
      .join(banded(corpus, "c_id").as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
        col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"))
      .dropDuplicates("q_id", "c_id")
    val qe = queries.select(col("vec_id").as("q_id"), asDouble(col("embedding")).as("q_emb"))
    val ce = corpus.select(col("vec_id").as("c_id"), asDouble(col("embedding")).as("c_emb"))
    val sims = candidates.join(broadcast(qe), "q_id").join(ce, "c_id")
      .select(col("q_id"), col("c_id"), cosine(col("q_emb"), col("c_emb")).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id").asc)
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id").as("vec_id"), col("rank"), col("c_id").as("neighbor_id"))
  }

  /** IVF (inverted-file) approximate top-k — the other classic ANN scale
    * path besides LSH. Coarse quantizer: `nLists` centroids sampled
    * deterministically from the corpus (lowest vec_ids — no training step
    * offline; a k-means refinement would slot in here). Every corpus
    * vector is assigned to its nearest centroid (one JIT-compiled
    * `mapPartitions` pass over a broadcast centroid array — same
    * hot-kernel reasoning as the MinHash signatures); queries probe their
    * `nProbe` nearest lists and exact cosine re-ranks the candidates.
    * At scale the assignment is a narrow map, the probe is a shuffle join
    * on list id, and candidate volume is ~nProbe/nLists of the corpus. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nLists: Int = 16, nProbe: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._

    val centroids: Array[Array[Double]] = corpus
      .orderBy(col("vec_id")).limit(nLists)
      .select(asDouble(col("embedding"))).as[Seq[Double]]
      .collect().map(_.toArray)
    val bc = spark.sparkContext.broadcast(centroids)

    def cosTo(c: Array[Double], v: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < v.length) { dot += c(i) * v(i); na += c(i) * c(i); nb += v(i) * v(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    def assign(df: DataFrame, idCol: String, lists: Int): DataFrame =
      df.select(col("vec_id"), asDouble(col("embedding")))
        .as[(Long, Seq[Double])]
        .mapPartitions { it =>
          val cs = bc.value
          it.flatMap { case (id, emb) =>
            val v = emb.toArray
            cs.indices.map(li => (li, cosTo(cs(li), v)))
              .sortBy(-_._2).take(lists).map { case (li, _) => (id, li) }
          }
        }.toDF(idCol, "list")

    val assigned = assign(corpus, "c_id", 1)
    val probes = assign(queries, "q_id", nProbe)
    val candidates = probes.join(assigned, "list")
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"))
      .dropDuplicates("q_id", "c_id")
    val qe = queries.select(col("vec_id").as("q_id"), asDouble(col("embedding")).as("q_emb"))
    val ce = corpus.select(col("vec_id").as("c_id"), asDouble(col("embedding")).as("c_emb"))
    val sims = candidates.join(broadcast(qe), "q_id").join(ce, "c_id")
      .select(col("q_id"), col("c_id"), cosine(col("q_emb"), col("c_emb")).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id").asc)
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id").as("vec_id"), col("rank"), col("c_id").as("neighbor_id"))
  }

  /** Embedding-cosine near-duplicate pairs (the vector member of the dedup
    * family): LSH self-join candidates, exact-cosine verified against
    * `threshold`. Same no-all-pairs shape as
    * [[graft.operators.DedupOps.nearDupPairs]]; recall depends on the LSH
    * band match probability at the threshold's angle (asserted against
    * brute force in tests, not oracle-checked). */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val bands = (0 until 4).map(j =>
      struct(lit(j).as("band"), shiftright(col("bucket"), j * 4).bitwiseAND(0xF).as("bh")))
    val banded = corpus
      .select(col("vec_id"), lshBucket(col("embedding")).as("bucket"))
      .select(col("vec_id"), explode(array(bands: _*)).as("b"))
      .select(col("vec_id"), col("b.band").as("band"), col("b.bh").as("bh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val candidates = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
        col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val ea = corpus.select(col("vec_id").as("id_a"), asDouble(col("embedding")).as("emb_a"))
    val eb = corpus.select(col("vec_id").as("id_b"), asDouble(col("embedding")).as("emb_b"))
    candidates.join(ea, "id_a").join(eb, "id_b")
      .select(col("id_a"), col("id_b"), cosine(col("emb_a"), col("emb_b")).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
