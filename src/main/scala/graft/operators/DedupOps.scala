package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._


/** Document deduplication for large-scale training-data pipelines: exact
  * (normalize → hash-group), MinHash+LSH near-dup (shingle → signature →
  * band-bucket join → within-bucket exact-Jaccard verify), and SimHash.
  *
  * Scale design (the 100 TB story): there is **no all-pairs stage
  * anywhere**. Candidate generation is a self-equi-join on (band, band
  * hash) — a plain shuffle join whose key cardinality grows with the
  * corpus, so it spreads over any number of executors; the exact-Jaccard
  * verify runs only on LSH candidates. Signatures are one pass over
  * exploded shingles with 128 codegen'd `min` aggregates (map-side partial
  * aggregation shrinks the shuffle to one row per (doc, 128 longs)).
  * Driver state: none.
  */
object DedupOps {

  val NumHashes = 128
  val BandRows = 2 // bands = 128/2 = 64 → P(candidate) = 1-(1-J^2)^64
  val NumBands: Int = NumHashes / BandRows

  // The hash family is index-salted xxhash64 — h_i(s) = xxhash64(i, s) —
  // rather than an affine a_i*x+b_i over Z/2^64: wraparound multiplication
  // is an ANSI-mode overflow error in Spark 4, and a salted hash is just
  // as uniform with no overflow semantics to care about.

  /** Whitespace-normalized lowercase text. */
  def normText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** (doc_id, st: array<string>) — distinct word n-shingles per document.
    * Documents with fewer than n words get an empty set. */
  def shingleSets(docs: DataFrame, n: Int = 3): DataFrame = {
    val w = split(lower(trim(col("text"))), "\\s+")
    docs.select(col("doc_id"), w.as("w"))
      .select(col("doc_id"),
        when(size(col("w")) < n, array().cast("array<string>"))
          .otherwise(array_distinct(expr(
            s"transform(sequence(0, size(w) - $n), i -> " +
            (0 until n).map(j => s"w[i + $j]").mkString("concat_ws(' ', ", ", ", ")") + ")")))
          .as("st"))
  }

  /** Murmur-style 64-bit finalizer (public-domain mixing constants). */
  @inline private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  private def baseHash(s: String): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < s.length) { h = 31 * h + s.charAt(i); i += 1 }
    fmix64(h)
  }

  /** (doc_id, sig: array<long>) — MinHash signature.
    *
    * Computed in a typed `mapPartitions` kernel: each shingle is hashed
    * once, then k derived hashes are a mix of (base ^ i*golden) in a tight
    * JIT-compiled loop. Earlier formulations — k min-aggregates over
    * exploded shingles, then nested `transform`/`array_min` higher-order
    * expressions — were 5-30x slower: HOFs don't participate in
    * whole-stage codegen, so the k*|shingles| inner evaluations were
    * interpreted with per-call boxing. This is the one hot kernel in the
    * engine where dropping below the DataFrame API is justified
    * (SURVEY §-style last resort); the signature hash family does not
    * need cross-engine reproducibility because candidates are re-verified
    * with exact Jaccard. The repartition spreads hashing across the
    * cluster when the corpus arrives in few input splits. */
  def minhashSignatures(shingles: DataFrame, k: Int = NumHashes): DataFrame = {
    val spark = shingles.sparkSession
    import spark.implicits._
    shingles.repartition(col("doc_id"))
      .select(col("doc_id"), col("st"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        it.map { case (id, st) =>
          val sig = Array.fill(k)(Long.MaxValue)
          st.foreach { s =>
            val base = baseHash(s)
            var i = 0
            while (i < k) {
              val h = fmix64(base ^ (0x9e3779b97f4a7c15L * (i + 1)))
              if (h < sig(i)) sig(i) = h
              i += 1
            }
          }
          (id, sig.toSeq)
        }
      }
      .toDF("doc_id", "sig")
  }

  /** Candidate pairs (id_a < id_b) sharing at least one LSH band bucket.
    *
    * The banded frame is persisted before the self-join: without the
    * materialization barrier, Catalyst's project-collapsing inlines the
    * signature expression into all 64 band keys on both join sides and
    * recomputes the full MinHash per comparison (measured 11.8s vs 0.2s
    * on the 672-doc corpus). The persisted state is (doc_id, band, hash)
    * — 64 small rows per doc, the standard LSH index. */
  def lshCandidatePairs(sigs: DataFrame): DataFrame = {
    val bandCols = (0 until NumBands).map { j =>
      struct(lit(j).as("band"),
        xxhash64((0 until BandRows).map(r => col("sig")(j * BandRows + r)): _*).as("bh"))
    }
    val banded = sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
  }

  /** Near-duplicate pairs with exact Jaccard >= threshold, LSH-pruned.
    * Output (id_a, id_b, jaccard); both engines compute jaccard as an
    * exact int/int division, so the doubles compare bit-identically. */
  def nearDupPairs(docs: DataFrame, threshold: Double, shingleN: Int = 3): DataFrame = {
    // Reused by the signature pass and both sides of the verify join.
    val sh = shingleSets(docs, shingleN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val candidates = lshCandidatePairs(minhashSignatures(sh))
    candidates
      .join(sh.withColumnRenamed("doc_id", "id_a").withColumnRenamed("st", "st_a"), "id_a")
      .join(sh.withColumnRenamed("doc_id", "id_b").withColumnRenamed("st", "st_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("st_a"), col("st_b"))).cast("double")
          / size(array_union(col("st_a"), col("st_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact-duplicate groups over normalized text: (keep_id, n_copies) for
    * groups with more than one member. Plain hash aggregation — Tungsten
    * hashes the grouping key, no extra hashing step needed. */
  def exactDupGroups(docs: DataFrame): DataFrame =
    docs.groupBy(normText(col("text")).as("norm"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .select(col("keep_id"), col("n_copies"))

  /** (doc_id, simhash: long) — 64-bit SimHash over word tokens: bit b of
    * the fingerprint is the sign of sum over tokens of ±1 depending on bit
    * b of the token hash. One explode + 64 conditional sums. */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b")
    }
    val fp = (0 until 64).map(b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(0L))
      .reduce((a, c) => a.bitwiseOR(c))
    tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), fp.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxDist, LSH-bucketed
    * on 8-bit bands (8 bands → any pair with <= 7 differing bands shares
    * one; maxDist <= 7 guarantees recall 1 by pigeonhole). */
  def simhashPairs(docs: DataFrame, maxDist: Int = 6): DataFrame = {
    val sigs = simhashSignatures(docs)
    val bandCols = (0 until 8).map { j =>
      struct(lit(j).as("band"),
        shiftright(col("simhash"), j * 8).bitwiseAND(0xFF).as("bh"))
    }
    val banded = sigs.select(col("doc_id"), col("simhash"),
        explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.band").as("band"), col("b.bh").as("bh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
