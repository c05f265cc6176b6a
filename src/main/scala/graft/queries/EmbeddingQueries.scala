package graft.queries

import graft.Tables
import graft.operators.EmbeddingOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search queries over the embeddings table. `ann_topk` is the
  * exact brute-force baseline with a DuckDB `list_cosine_similarity`
  * oracle (rank-only output — rank margins are >= 2e-4, far above any
  * double-rounding divergence). `ann_lsh_topk` and `embedding_neardup`
  * are ALSO oracle-checked since the r7 move to Rademacher (±1,
  * integer-hash-derived) planes: the sign buckets are a sequential
  * ±emb[j] fold both engines compute bit-identically, and the exact
  * re-rank / threshold verify uses a `list_reduce` mirror of the
  * [[graft.functions.CosineSimilarity]] op order (same sequential sums,
  * same sqrt/divide shape), so even the emitted `sim` doubles match
  * bit-for-bit.
  *
  * The IVF family (ann_ivf_topk / _served / _quantized, ann_semdedup,
  * stream_ann_ivf) is oracle-checked as of r8: the Lloyd refinement
  * accumulates FIXED-POINT Longs (order-independent exact sums — see
  * [[graft.operators.EmbeddingOps.ivfIndex]]) and the seed sample orders
  * by a 63-bit-safe integer hash, so the trained centroids are a pure
  * function of the data that [[centroidChain]] replays in DuckDB CTE by
  * CTE (seed → 3×(assign, fixed-point mean) → final centroids),
  * bit-identically.
  */
/** Train-once-per-JVM cache of the persisted IVF index, keyed by scale
  * dir — shared by the batch and streaming serve queries. Re-training on
  * every invocation would (a) make the benched "serve" number mostly
  * measure Lloyd training + artifact IO (pass 2 of the bench now times
  * the true probe-only serve), and (b) leak a fresh temp directory per
  * run. This mirrors production: training is per corpus snapshot,
  * serving is per query batch. */
private[queries] class ServeCache(prefix: String,
    train: (graft.GraftSession, org.apache.spark.sql.DataFrame, String) => Unit) {
  // A lazy-val slot per dir rather than getOrElseUpdate(dir, train()):
  // getOrElseUpdate on a TrieMap is only value-atomic, so two concurrent
  // first accesses would BOTH run the full training pass and orphan the
  // loser's temp index directory (r15 review). putIfAbsent publishes one
  // slot; the JVM's lazy-val lock then runs training at most once per dir.
  private class Slot(s: SparkSession, corpus: org.apache.spark.sql.DataFrame) {
    lazy val path: String = {
      val p = java.nio.file.Files.createTempDirectory(prefix).toString
      train(new graft.GraftSession(s), corpus, p)
      p
    }
  }
  private val slots = scala.collection.concurrent.TrieMap.empty[String, Slot]
  def indexFor(s: SparkSession, dir: String,
      corpus: org.apache.spark.sql.DataFrame): String = {
    slots.putIfAbsent(dir, new Slot(s, corpus))
    slots(dir).path
  }
}
private[queries] object ServeIndexCache
  extends ServeCache("graft-ivf-idx", (gs, c, p) => gs.ivfTrain(c, p))
private[queries] object PqServeCache
  extends ServeCache("graft-pq-idx", (gs, c, p) => gs.pqTrain(c, p))

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
    // IVF ANN variant. Oracle-checked since r8: deterministic Lloyd
    // (fixed-point sums) makes the trained quantizer SQL-replayable;
    // recall vs exact additionally asserted in spec.
    "ann_ivf_topk" -> { (s, dir) =>
      val (corpus, queries) = split(s, dir)
      EmbeddingOps.ivfTopK(corpus, queries, k = 3)
    },
    // The ANN serve lifecycle end-to-end: train the IVF index once, save
    // the artifacts (quantizer parquet + corpus assignment parquet), then
    // answer STRICTLY from the reloaded artifacts — no Lloyd pass and no
    // corpus-wide assignment on the serve side, which is the shape every
    // query batch after the first takes on a real vector store (training
    // is per corpus snapshot, serving is per batch). Shares the
    // deterministic-Lloyd oracle with ann_ivf_topk (doubles round-trip
    // the artifact parquet exactly); served == in-memory equality is
    // additionally asserted in DedupAnnSpec.
    "ann_ivf_served" -> { (s, dir) =>
      val (corpus, queries) = split(s, dir)
      val path = ServeIndexCache.indexFor(s, dir, corpus)
      new graft.GraftSession(s).similarityTopKIvfServed(corpus, queries, k = 3, path)
    },
    // Int8-quantized scan + exact re-rank. Oracle-checked: the whole
    // quantize → integer-cosine prune → re-rank pipeline is
    // deterministic, so the oracle replays it (the approximation itself
    // is driver-verified; recall vs exactTopK additionally in spec).
    "ann_quantized_topk" -> { (s, dir) =>
      val (corpus, queries) = split(s, dir)
      EmbeddingOps.quantizedTopK(corpus, queries, k = 3)
    },
    // The production three-stage shape: IVF probe bounds the candidates,
    // int8 integer-dot prunes to k·factor, exact double re-ranks only
    // that pool. Oracle-checked since r8 (deterministic Lloyd + the r7
    // int8 replay); no-prune degeneracy to ivfTopKWith and default-prune
    // recall asserted in spec.
    "ann_ivf_quantized" -> { (s, dir) =>
      val (corpus, queries) = split(s, dir)
      EmbeddingOps.ivfQuantizedTopK(corpus, queries, k = 3)
    },
    // Embedding-cosine near-dup (dedup family, vector modality). Oracle
    // replicates the WHOLE approximate pipeline — deterministic
    // Rademacher banding, capped pairs, bit-exact cosine verify — so the
    // approximation itself is driver-checked, not just spec-bounded.
    // The oracle's bucketsCte hardcodes 4-bit bands; fail here, loudly,
    // if a threshold change ever desynchronizes that (r7 ADVICE).
    "embedding_neardup" -> { (s, dir) =>
      require(EmbeddingOps.bandBitsFor(0.4) == 4,
        s"embedding_neardup oracle assumes 4-bit bands but bandBitsFor(0.4) = " +
        s"${EmbeddingOps.bandBitsFor(0.4)} — update the oracle's bucketsCte band width")
      EmbeddingOps.cosineNearDupPairs(Tables.embeddings(s, dir), threshold = 0.4)
    },
    // SemDedup (cluster-then-prune semantic dedup, Abbas et al. 2023).
    // Oracle-checked since r8 (deterministic Lloyd centroids, replayed by
    // centroidChain); the nLists=1 degenerate case is additionally proven
    // identical to global brute force in DedupAnnSpec.
    "ann_semdedup" -> { (s, dir) =>
      EmbeddingOps.semDedup(Tables.embeddings(s, dir), threshold = 0.4)
    },
    // PQ/ADC top-k (Jégou et al. 2011): m=16 subspace codebooks of 32
    // codes trained by the deterministic fixed-point Lloyd (L2 on
    // normalized subvector slices), corpus encoded to 16 code ids,
    // candidates by ADC table lookups folded in subspace order, exact
    // top-3 re-rank of the top-24 pool. Oracle-checked: the pqTopKOracle
    // CTE chain replays training, encoding, ADC, and re-rank bit-for-bit
    // (its SQL hardcodes m=16/codes=32/pool=24 — keep in sync).
    "ann_pq_topk" -> { (s, dir) =>
      val (corpus, queries) = split(s, dir)
      EmbeddingOps.pqTopK(corpus, queries, k = 3, m = 16, codes = 32,
        rerankFactor = 8)
    },
    // The PQ serve lifecycle: train + encode once, persist (codebooks +
    // m-byte codes), answer strictly from the reloaded artifacts — no
    // training pass, no corpus re-encode on the serve side. Shares the
    // pqTopKOracle (doubles/ints round-trip parquet exactly); served ==
    // in-memory additionally asserted in DedupAnnSpec.
    "ann_pq_served" -> { (s, dir) =>
      val (corpus, queries) = split(s, dir)
      val path = PqServeCache.indexFor(s, dir, corpus)
      new graft.GraftSession(s).similarityTopKPqServed(corpus, queries, 3, path)
    },
    // IVF-PQ: the composed production shape (probed lists bound the
    // candidates, ADC over m-byte codes ranks them, exact top-3 re-rank
    // of the top-24 pool). Oracle replays both quantizers' training and
    // the composition bit-for-bit.
    "ann_ivfpq_topk" -> { (s, dir) =>
      val (corpus, queries) = split(s, dir)
      EmbeddingOps.ivfPqTopK(corpus, queries, k = 3)
    })

  /** Exact SQL mirror of [[graft.functions.CosineSimilarity]]: the same
    * sequential left-to-right dot/norm sums (list_reduce), the same
    * `dot / (sqrt(na) * sqrt(nb))` association — bit-identical doubles,
    * not just equal ranks. */
  private def cosSql(a: String, b: String): String =
    s"(list_reduce([CAST(0.0 AS DOUBLE)] || " +
      s"[$a[t] * $b[t] for t in generate_series(1, least(len($a), len($b)))], (x, y) -> x + y) " +
      s"/ (sqrt(list_reduce([CAST(0.0 AS DOUBLE)] || " +
      s"[$a[t] * $a[t] for t in generate_series(1, len($a))], (x, y) -> x + y)) " +
      s"* sqrt(list_reduce([CAST(0.0 AS DOUBLE)] || " +
      s"[$b[t] * $b[t] for t in generate_series(1, len($b))], (x, y) -> x + y))))"

  /** Loud scale guard (r7 ADVICE): the sign-LSH and SemDedup oracles
    * replay cap-free SQL mirrors of capped candidate generators, valid
    * only while no bucket actually exceeds the engine's cap. This is a
    * scalar boolean to AND into the candidate CTE's WHERE: it checks the
    * EXACT condition — the max membership of `keyTbl` grouped by
    * `keyCol` — so a scale change that would genuinely trip the engine
    * cap raises a clear DuckDB error instead of a confusing value
    * mismatch, while larger-but-still-uncapped corpora stay green. */
  private def capGuard(keyTbl: String, keyCol: String, cap: Int, what: String): String =
    s"""(SELECT CASE WHEN COALESCE(MAX(cnt), 0) <= $cap THEN TRUE
       |    ELSE error('a $what bucket exceeds the engine cap $cap at this scale: the cap-free oracle mirror would diverge from the capped engine path')
       |    END FROM (SELECT count(*) AS cnt FROM $keyTbl GROUP BY $keyCol))""".stripMargin

  /** Shared sign-LSH oracle CTEs: per-vector 64-bit sign bucket from the
    * Rademacher planes (quadratic hash of (plane i, dim j) → ±1, the
    * EXACT construction in EmbeddingOps.planesFor; the fold adds ±emb[j]
    * in the same sequential order as the typed kernel), then 16×4-bit
    * band keys with band identity in the high bits (bandKeys with
    * bandBits=4 — both ann_lsh_topk's default and bandBitsFor(0.4)). */
  private val bucketsCte: String =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |bits AS (
      |  SELECT vec_id, ii.i,
      |    CASE WHEN list_reduce([CAST(0.0 AS DOUBLE)] ||
      |      [CASE WHEN ((((2654435761*(ii.i+1) + 40503*j + 12345) % 2147483647)
      |                 * ((2654435761*(ii.i+1) + 40503*j + 12345) % 2147483647)) % 2147483647) & 1 = 0
      |            THEN emb[j] ELSE -emb[j] END for j in generate_series(1, len(emb))],
      |      (a, b) -> a + b) >= 0
      |    THEN 1 ELSE 0 END AS bit
      |  FROM e CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) ii),
      |-- band keys assembled 4 bits at a time (bit 63 as 1<<63 would
      |-- overflow signed BIGINT; the Spark side's (bucket >> 4j) & 15 on
      |-- a signed long extracts exactly these 4 bits)
      |bands AS (SELECT vec_id,
      |  (CAST(i // 4 AS BIGINT) << 48) + CAST(SUM(bit << (i % 4)) AS BIGINT) AS bkey
      |  FROM bits GROUP BY vec_id, i // 4)""".stripMargin

  // ---- IVF-family oracle: bit-exact DuckDB replay of the Lloyd-trained
  // coarse quantizer (EmbeddingOps.ivfIndex) and its probe pipeline. ----

  /** Must match [[graft.operators.EmbeddingOps.FixedPointScale]]. */
  private val FixedS = "1073741824.0"

  /** cosTo mirror: [[cosSql]] yields NaN on a zero-norm side; cosTo
    * returns -3.0 there (below any real cosine) so assignment ordering is
    * engine-independent. */
  private def cosSafe(a: String, b: String): String =
    s"(CASE WHEN isnan(${cosSql(a, b)}) THEN -3.0 ELSE ${cosSql(a, b)} END)"

  /** Nearest-list assignment CTE: every `src` vector gets its `rnMax`
    * nearest centroids of `cents` (sim DESC, list ASC — the exact
    * tie-break of both the Lloyd `sim > bestSim` scan and the stable
    * `nearestLists` sort). */
  private def assignCte(name: String, cents: String, src: String = "e",
      rnMax: Int = 1, idCol: String = "vec_id"): String =
    s"""$name AS (SELECT $idCol, emb, list FROM (
       |  SELECT v.vec_id AS $idCol, v.emb, c.list,
       |    ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${cosSafe("c.cent", "v.emb")} DESC, c.list) AS rn
       |  FROM $src v CROSS JOIN $cents c) WHERE rn <= $rnMax)""".stripMargin

  /** One Lloyd centroid update: per-(list, coordinate) FIXED-POINT sums
    * (`floor(x·2^30 + 0.5)` BIGINTs — the exact Longs the treeReduce
    * kernel folds, in any order), mean as the identical
    * `sum.toDouble / (count.toDouble · 2^30)` divide; an empty list keeps
    * its previous centroid. */
  private def updateCte(n: Int, prev: String, asg: String): String =
    s"""s$n AS (SELECT list, t.i,
       |  CAST(SUM(CAST(FLOOR(emb[t.i] * $FixedS + 0.5) AS BIGINT)) AS BIGINT) AS sf, COUNT(*) AS cnt
       |  FROM $asg, (SELECT unnest(generate_series(1, (SELECT len(emb) FROM e LIMIT 1))) AS i) t
       |  GROUP BY list, t.i),
       |m$n AS (SELECT list, list(CAST(sf AS DOUBLE) / (CAST(cnt AS DOUBLE) * $FixedS) ORDER BY i) AS cent
       |  FROM s$n GROUP BY list),
       |c$n AS (SELECT p.list, COALESCE(m.cent, p.cent) AS cent FROM $prev p LEFT JOIN m$n m USING (list))""".stripMargin

  /** The trained-quantizer CTE chain ending in `c3`: deterministic seed
    * sample (the [[graft.operators.EmbeddingOps.seedOrderHash]] integer
    * hash, vec_id tie-break, nLists = clamp(4, 4096, floor(sqrt(N)))),
    * then `iters` unrolled (assign, fixed-point-mean) Lloyd steps.
    * `eCte` is the base `e` CTE — SemDedup passes the cap-guarded
    * variant (its within-cluster pair mirror is cap-free); the top-k
    * oracles are exact at any scale and use a plain one. */
  private def centroidChain(eCte: String, iters: Int = 3): String = {
    val seedH = "(1597334677*((vec_id+1)%2147483647))%2147483647"
    val steps = (1 to iters).map { it =>
      assignCte(s"a$it", s"c${it - 1}") + ",\n" + updateCte(it, s"c${it - 1}", s"a$it")
    }.mkString(",\n")
    s"""$eCte,
       |c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY $seedH, vec_id) - 1 AS list, emb AS cent
       |  FROM e QUALIFY ROW_NUMBER() OVER (ORDER BY $seedH, vec_id)
       |    <= (SELECT GREATEST(4, LEAST(4096, CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT))) FROM e)),
       |$steps""".stripMargin
  }

  private val plainE: String =
    "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)"

  /** Shared exact-rerank tail over a `cand (q_id, c_id)` CTE — the
    * rerankTopK mirror (codegen cosine order, NaN degenerates filtered,
    * (sim DESC, c_id) rank, k = 3). */
  private val ivfRerankTail: String =
    s"""rer AS (SELECT q_id, c_id, ${cosSql("qe.emb", "ce.emb")} AS sim
       |  FROM cand JOIN e qe ON qe.vec_id = q_id JOIN e ce ON ce.vec_id = c_id),
       |ranked AS (SELECT q_id, c_id,
       |  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rank
       |  FROM rer WHERE NOT isnan(sim))
       |SELECT q_id AS vec_id, CAST(rank AS INT) AS rank, c_id AS neighbor_id
       |FROM ranked WHERE rank <= 3""".stripMargin

  /** Full ann_ivf_topk replay (soft corpus assignment replicas=2, query
    * probes nProbe=6, exact top-3 rerank). ann_ivf_served and
    * stream_ann_ivf serve the SAME trained artifacts (double-exact
    * parquet round-trip), so all three rows share this oracle. */
  private[queries] val ivfTopKOracle: String =
    s"""WITH ${centroidChain(plainE)},
       |${assignCte("asg", "c3", rnMax = 2, idCol = "c_id")},
       |qv AS (SELECT vec_id, emb FROM e WHERE vec_id < 20),
       |${assignCte("probes", "c3", src = "qv", rnMax = 6, idCol = "q_id")},
       |cand AS (SELECT DISTINCT p.q_id, a.c_id FROM probes p JOIN asg a USING (list)
       |  WHERE p.q_id <> a.c_id),
       |$ivfRerankTail""".stripMargin

  /** ann_ivf_quantized replay: IVF candidates → int8 max-abs quantize
    * (the r7 ann_quantized_topk construction) → integer-cosine prune to
    * the global top-12 per query → exact top-3 rerank. */
  private val ivfQuantizedOracle: String =
    s"""WITH ${centroidChain(plainE)},
       |${assignCte("asg", "c3", rnMax = 2, idCol = "c_id")},
       |qv AS (SELECT vec_id, emb FROM e WHERE vec_id < 20),
       |${assignCte("probes", "c3", src = "qv", rnMax = 6, idCol = "q_id")},
       |cand0 AS (SELECT DISTINCT p.q_id, a.c_id FROM probes p JOIN asg a USING (list)
       |  WHERE p.q_id <> a.c_id),
       |mx AS (SELECT vec_id, emb,
       |  list_max([abs(emb[t]) for t in generate_series(1, len(emb))]) AS m FROM e),
       |qz AS (SELECT vec_id,
       |  [CAST(floor(emb[t] / (CASE WHEN m = 0.0 THEN 1.0 ELSE m / 127.0 END) + 0.5) AS BIGINT)
       |   for t in generate_series(1, len(emb))] AS q FROM mx),
       |sims AS (SELECT c0.q_id, c0.c_id,
       |  list_reduce([CAST(0 AS BIGINT)] || [q.q[t] * c.q[t] for t in generate_series(1, len(q.q))], (x, y) -> x + y) AS dot,
       |  list_reduce([CAST(0 AS BIGINT)] || [q.q[t] * q.q[t] for t in generate_series(1, len(q.q))], (x, y) -> x + y) AS na,
       |  list_reduce([CAST(0 AS BIGINT)] || [c.q[t] * c.q[t] for t in generate_series(1, len(c.q))], (x, y) -> x + y) AS nb
       |  FROM cand0 c0 JOIN qz q ON q.vec_id = c0.q_id JOIN qz c ON c.vec_id = c0.c_id),
       |qsim AS (SELECT q_id, c_id,
       |  CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS qs
       |  FROM sims WHERE na > 0 AND nb > 0),
       |cand AS (SELECT q_id, c_id FROM (
       |  SELECT q_id, c_id, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY qs DESC, c_id) AS qr
       |  FROM qsim) WHERE qr <= 12),
       |$ivfRerankTail""".stripMargin

  /** ann_semdedup replay: multi-probe assignment (replicas=3 — each
    * vector in its three nearest lists) on the trained quantizer,
    * shared-list pairs (id_a < id_b — the cap-free mirror of
    * cappedSelfJoinPairs, valid under the count guard; DISTINCT folds a
    * pair found in both shared lists), exact-cosine verify >= 0.4, dup =
    * appears as any pair's id_b. */
  private val semDedupOracle: String =
    s"""WITH ${centroidChain(plainE)},
       |${assignCte("asg", "c3", rnMax = 3, idCol = "id")},
       |pairs AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
       |  FROM asg x JOIN asg y ON x.list = y.list AND x.id < y.id
       |  AND ${capGuard("asg", "list", 10000, "SemDedup cluster")}),
       |verified AS (SELECT id_a, id_b, ${cosSql("ea.emb", "eb.emb")} AS sim
       |  FROM pairs JOIN e ea ON ea.vec_id = id_a JOIN e eb ON eb.vec_id = id_b),
       |dropped AS (SELECT DISTINCT id_b AS vec_id FROM verified WHERE sim >= 0.4)
       |SELECT e.vec_id, (d.vec_id IS NOT NULL) AS is_dup
       |FROM e LEFT JOIN dropped d ON e.vec_id = d.vec_id""".stripMargin

  // ---- PQ oracle: bit-exact replay of EmbeddingOps.pqCodebooks /
  // pqEncode / pqTopK with m=16, codes=32, iters=3, k=3, rerankFactor=8.
  // Same determinism levers as the IVF chain: seedOrderHash sample,
  // fixed-point Lloyd sums, sequential list_reduce folds matching every
  // engine while-loop, ROW_NUMBER tie-breaks matching the strict-<
  // scans. Subspace s covers emb[(s*dim)//16 + 1 .. ((s+1)*dim)//16]
  // (1-based inclusive DuckDB slice = the engine's [s·dim/m, (s+1)·dim/m)). ----

  /** Squared-L2 SQL mirror of pqNearest's fold: `((0+d0²)+d1²)+…`. */
  private def l2Sql(a: String, b: String): String =
    s"list_reduce([CAST(0.0 AS DOUBLE)] || " +
      s"[($a[t] - $b[t]) * ($a[t] - $b[t]) for t in generate_series(1, len($a))], " +
      "(x, y) -> x + y)"

  /** Dot-product SQL mirror of the ADC table / partial fold. */
  private def dotSql(a: String, b: String): String =
    s"list_reduce([CAST(0.0 AS DOUBLE)] || " +
      s"[$a[t] * $b[t] for t in generate_series(1, len($a))], (x, y) -> x + y)"

  /** Nearest-code assignment on subvectors: every (vec, s) row of `src`
    * gets its best code of `cents` (L2 ASC, code ASC — pqNearest's
    * strict-< scan). */
  private def pqAssignCte(name: String, cents: String, src: String = "sub",
      idCol: String = "vec_id"): String =
    s"""$name AS (SELECT $idCol, s, v, code FROM (
       |  SELECT $src.vec_id AS $idCol, $src.s, $src.v, c.code,
       |    ROW_NUMBER() OVER (PARTITION BY $src.vec_id, $src.s
       |      ORDER BY ${l2Sql(s"$src.v", "c.cent")} ASC, c.code ASC) AS rn
       |  FROM $src JOIN $cents c USING (s)) WHERE rn = 1)""".stripMargin

  /** One PQ Lloyd update: fixed-point sums per (s, code, coordinate),
    * identical mean divide, empty codes keep their previous centroid. */
  private def pqUpdateCte(n: Int, prev: String, asg: String): String =
    s"""ps$n AS (SELECT s, code, t.i,
       |  CAST(SUM(CAST(FLOOR(v[t.i] * $FixedS + 0.5) AS BIGINT)) AS BIGINT) AS sf, COUNT(*) AS cnt
       |  FROM $asg, (SELECT unnest(generate_series(1,
       |    (SELECT len(emb) FROM e LIMIT 1))) AS i) t
       |  WHERE t.i <= len(v)
       |  GROUP BY s, code, t.i),
       |pm$n AS (SELECT s, code, list(CAST(sf AS DOUBLE) / (CAST(cnt AS DOUBLE) * $FixedS) ORDER BY i) AS cent
       |  FROM ps$n GROUP BY s, code),
       |p$n AS (SELECT p.s, p.code, COALESCE(m.cent, p.cent) AS cent
       |  FROM $prev p LEFT JOIN pm$n m USING (s, code))""".stripMargin

  /** The PQ training/encode/ADC/candidate CTE chain (`en` … `cand`),
    * shared by the standalone and the IVF-PQ-composed oracles. Assumes an
    * `e` CTE is already in scope. `partExtra` restricts the ADC scan to a
    * prior candidate CTE (IVF-PQ probes); empty = whole corpus. */
  private def pqCtes(partExtra: String = ""): String = {
    val seedH = "(1597334677*((vec_id+1)%2147483647))%2147483647"
    val steps = (1 to 3).map { it =>
      pqAssignCte(s"pa$it", s"p${it - 1}") + ",\n" + pqUpdateCte(it, s"p${it - 1}", s"pa$it")
    }.mkString(",\n")
    s"""-- PQ trains/encodes the L2-NORMALIZED corpus (pqNormalize: the
       |-- same sequential square-sum fold; an all-zero vector stays zero)
       |en AS (SELECT vec_id, CASE WHEN nq = 0.0 THEN emb
       |    ELSE [emb[t] / sqrt(nq) for t in generate_series(1, len(emb))] END AS emb
       |  FROM (SELECT vec_id, emb, list_reduce([CAST(0.0 AS DOUBLE)] ||
       |    [emb[t] * emb[t] for t in generate_series(1, len(emb))], (x, y) -> x + y) AS nq
       |    FROM e)),
       |sub AS (SELECT vec_id, ss.s,
       |  emb[(ss.s * len(emb)) // 16 + 1 : ((ss.s + 1) * len(emb)) // 16] AS v
       |  FROM en CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS s) ss),
       |seed AS (SELECT vec_id,
       |  ROW_NUMBER() OVER (ORDER BY $seedH, vec_id) - 1 AS code
       |  FROM e QUALIFY ROW_NUMBER() OVER (ORDER BY $seedH, vec_id) <= 32),
       |p0 AS (SELECT sub.s, seed.code, sub.v AS cent
       |  FROM sub JOIN seed USING (vec_id)),
       |$steps,
       |${pqAssignCte("enc", "p3", idCol = "c_id")},
       |-- the QUERY stays full-precision and raw (per-query positive
       |-- scaling cannot change its candidate ranking)
       |qsub AS (SELECT vec_id AS q_id, ss.s,
       |  emb[(ss.s * len(emb)) // 16 + 1 : ((ss.s + 1) * len(emb)) // 16] AS v
       |  FROM e CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS s) ss
       |  WHERE vec_id < 20),
       |part AS (SELECT q.q_id, enc.c_id, q.s, ${dotSql("q.v", "c.cent")} AS p
       |  FROM qsub q JOIN enc ON q.s = enc.s AND q.q_id <> enc.c_id
       |  $partExtra
       |  JOIN p3 c ON c.s = enc.s AND c.code = enc.code),
       |score AS (SELECT q_id, c_id,
       |  list_reduce([CAST(0.0 AS DOUBLE)] || list(p ORDER BY s), (x, y) -> x + y) AS ascore
       |  FROM part GROUP BY q_id, c_id),
       |cand AS (SELECT q_id, c_id FROM (SELECT q_id, c_id,
       |  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY ascore DESC, c_id) AS rn
       |  FROM score) WHERE rn <= 24)""".stripMargin
  }

  private[queries] val pqTopKOracle: String =
    s"""WITH $plainE,
       |${pqCtes()},
       |$ivfRerankTail""".stripMargin

  /** ann_ivfpq_topk replay: the IVF chain bounds candidates to the
    * probed lists (soft assignment replicas=2, nProbe=6 — identical to
    * ann_ivf_topk), the PQ chain ranks ONLY those by ADC, top-24 per
    * query, exact top-3 re-rank. */
  private[queries] val ivfPqTopKOracle: String =
    s"""WITH ${centroidChain(plainE)},
       |${assignCte("asg", "c3", rnMax = 2, idCol = "c_id")},
       |qv AS (SELECT vec_id, emb FROM e WHERE vec_id < 20),
       |${assignCte("probes", "c3", src = "qv", rnMax = 6, idCol = "q_id")},
       |cand0 AS (SELECT DISTINCT p.q_id, a.c_id FROM probes p JOIN asg a USING (list)
       |  WHERE p.q_id <> a.c_id),
       |${pqCtes("JOIN cand0 ON cand0.q_id = q.q_id AND cand0.c_id = enc.c_id")},
       |$ivfRerankTail""".stripMargin

  val oracle: Map[String, String] = Map(
    "ann_pq_topk" -> pqTopKOracle,
    "ann_pq_served" -> pqTopKOracle,
    "ann_ivfpq_topk" -> ivfPqTopKOracle,
    "ann_ivf_topk" -> ivfTopKOracle,
    "ann_ivf_served" -> ivfTopKOracle,
    "ann_ivf_quantized" -> ivfQuantizedOracle,
    "ann_semdedup" -> semDedupOracle,
    // quantizedTopK is centroid-free and fully deterministic: per-vector
    // max-abs int8 quantization (floor(x+0.5), Java Math.round — NOT SQL
    // round(), which is half-away-from-zero), integer cosine prune to the
    // global top-(k*rerankFactor)=12 per query (exact BIGINT sums → one
    // double divide, bit-identical ties), exact re-rank of that pool.
    // The per-partition heaps + window in the Spark plan are just a
    // distributed computation of the same global top-12.
    "ann_quantized_topk" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         |mx AS (SELECT vec_id, emb,
         |  list_max([abs(emb[t]) for t in generate_series(1, len(emb))]) AS m FROM e),
         |qz AS (SELECT vec_id,
         |  [CAST(floor(emb[t] / (CASE WHEN m = 0.0 THEN 1.0 ELSE m / 127.0 END) + 0.5) AS BIGINT)
         |   for t in generate_series(1, len(emb))] AS q
         |  FROM mx),
         |sims AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         |    list_reduce([CAST(0 AS BIGINT)] || [q.q[t] * c.q[t] for t in generate_series(1, len(q.q))], (x, y) -> x + y) AS dot,
         |    list_reduce([CAST(0 AS BIGINT)] || [q.q[t] * q.q[t] for t in generate_series(1, len(q.q))], (x, y) -> x + y) AS na,
         |    list_reduce([CAST(0 AS BIGINT)] || [c.q[t] * c.q[t] for t in generate_series(1, len(c.q))], (x, y) -> x + y) AS nb
         |  FROM qz q JOIN qz c ON q.vec_id <> c.vec_id WHERE q.vec_id < 20),
         |qsim AS (SELECT q_id, c_id,
         |  CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS qs
         |  FROM sims WHERE na > 0 AND nb > 0),
         |pruned AS (SELECT q_id, c_id FROM (
         |  SELECT q_id, c_id, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY qs DESC, c_id) AS qr
         |  FROM qsim) WHERE qr <= 12),
         |rer AS (SELECT q_id, c_id, ${cosSql("qe.emb", "ce.emb")} AS sim
         |  FROM pruned JOIN e qe ON qe.vec_id = q_id JOIN e ce ON ce.vec_id = c_id),
         |ranked AS (SELECT q_id, c_id,
         |  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rank
         |  FROM rer WHERE NOT isnan(sim))
         |SELECT q_id AS vec_id, CAST(rank AS INT) AS rank, c_id AS neighbor_id
         |FROM ranked WHERE rank <= 3""".stripMargin,
    "ann_lsh_topk" ->
      s"""WITH $bucketsCte,
         |cand AS (SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS c_id
         |  FROM bands q JOIN bands c ON q.bkey = c.bkey AND q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 20
         |    AND ${capGuard("bands", "bkey", 2048, "sign-LSH band")}),
         |sims AS (SELECT q_id, c_id, ${cosSql("qe.emb", "ce.emb")} AS sim
         |  FROM cand JOIN e qe ON qe.vec_id = q_id JOIN e ce ON ce.vec_id = c_id),
         |ranked AS (SELECT q_id, c_id,
         |  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rank
         |  FROM sims WHERE NOT isnan(sim))
         |SELECT q_id AS vec_id, CAST(rank AS INT) AS rank, c_id AS neighbor_id
         |FROM ranked WHERE rank <= 3""".stripMargin,
    "embedding_neardup" ->
      s"""WITH $bucketsCte,
         |pairs AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM bands a JOIN bands b ON a.bkey = b.bkey AND a.vec_id < b.vec_id
         |    AND ${capGuard("bands", "bkey", 10000, "near-dup band")}),
         |verified AS (SELECT id_a, id_b, ${cosSql("ea.emb", "eb.emb")} AS sim
         |  FROM pairs JOIN e ea ON ea.vec_id = id_a JOIN e eb ON eb.vec_id = id_b)
         |SELECT id_a, id_b, sim FROM verified WHERE sim >= 0.4""".stripMargin,
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
