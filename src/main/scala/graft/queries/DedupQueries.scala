package graft.queries

import graft.{OracleCtes, Tables}
import graft.operators.DedupOps
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-data dedup queries over the documents corpus (with
  * deterministically injected duplicates — see [[graft.Tables.corpus]]).
  * Every query here is oracle-checked — including `dedup_simhash`, whose
  * token hash ([[graft.operators.DedupOps.simTokenHash]]) is a two-prime
  * polynomial chosen to be bit-for-bit expressible as a DuckDB
  * `list_reduce`, the `text_winnow_fp` fingerprint-oracle pattern; the
  * oracle then brute-forces all Hamming<=6 pairs, which the block-pair
  * banding's recall-1.0 guarantee makes set-equal to the banded result.
  */
object DedupQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "dedup_exact" -> { (s, dir) =>
      DedupOps.exactDupGroups(Tables.corpus(s, dir))
    },
    "dedup_minhash" -> { (s, dir) =>
      DedupOps.nearDupPairs(Tables.corpus(s, dir), threshold = 0.6)
    },
    "dedup_simhash" -> { (s, dir) =>
      DedupOps.simhashPairs(Tables.corpus(s, dir), maxDist = 6)
    },
    // Exact n-gram Jaccard (prefix-filtered inverted index, no
    // approximation) at a lower threshold than the MinHash query.
    "dedup_jaccard" -> { (s, dir) =>
      DedupOps.jaccardPairs(Tables.corpus(s, dir), threshold = 0.5)
    },
    // Connected components over the verified near-dup pairs — the
    // representative-picking step of a dedup pipeline. Oracle computes the
    // same components with a recursive transitive closure.
    "dedup_clusters" -> { (s, dir) =>
      DedupOps.clusters(DedupOps.nearDupPairs(Tables.corpus(s, dir), threshold = 0.6))
    },
    // Substring-level near-dup via shared winnowing fingerprints (df-
    // filtered; exact shared counts). Over raw documents, not the
    // dup-injected corpus: fingerprints are about shared passages.
    "dedup_winnow" -> { (s, dir) =>
      DedupOps.winnowPairs(Tables.documents(s, dir))
    },
    // Exact shared-substring spans (Lee et al. 2022 style) over the
    // dup-injected corpus: maximal token runs whose every 10-gram occurs
    // at least twice anywhere in the corpus.
    "dedup_substring" -> { (s, dir) =>
      DedupOps.sharedSubstringSpans(Tables.corpus(s, dir), n = 10)
    },
    // The span report as a curation ACTION: gate documents on the
    // fraction of their tokens covered by corpus-shared substrings
    // (docs over 50% duplicated text drop). Exact integer inputs ->
    // exact double division, no rounding needed.
    "dedup_substring_gate" -> { (s, dir) =>
      import org.apache.spark.sql.functions._
      val docs = Tables.corpus(s, dir)
        .select(col("doc_id"),
          size(filter(graft.operators.TextOps.tokens(col("text")), t => t =!= ""))
            .cast("bigint").as("n_tokens"))
      val spans = DedupOps.sharedSubstringSpans(Tables.corpus(s, dir), n = 10)
      docs.join(spans, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
          (coalesce(col("dup_tokens"), lit(0L)).cast("double") /
            col("n_tokens").cast("double")).as("dup_frac"))
        .withColumn("kept", col("dup_frac") <= 0.5)
    },
    // Incremental dedup: the corpus's injected duplicates play the "new
    // crawl" (left), the raw documents the existing base (right) — each
    // left doc is checked against the base, never base-vs-base.
    "dedup_cross" -> { (s, dir) =>
      import org.apache.spark.sql.functions.col
      DedupOps.crossDupPairs(
        Tables.corpus(s, dir).filter(col("doc_id") >= 10000),
        Tables.documents(s, dir), threshold = 0.6)
    })

  val oracle: Map[String, String] = Map(
    "dedup_exact" ->
      s"""WITH ${OracleCtes.corpus}
         |SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
         |FROM corpus
         |GROUP BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')
         |HAVING COUNT(*) > 1""".stripMargin,
    "dedup_minhash" ->
      s"""WITH ${OracleCtes.corpus},
         |words AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w FROM corpus),
         |shs AS (SELECT doc_id,
         |  list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
         |                 for i in generate_series(1, len(w)-2)]) AS st
         |  FROM words),
         |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(len(list_intersect(a.st, b.st)) AS DOUBLE)
         |    / len(list_distinct(a.st || b.st)) AS jaccard
         |  FROM shs a JOIN shs b ON a.doc_id < b.doc_id)
         |SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.6""".stripMargin,
    // Bit-for-bit mirror of DedupOps.simhashSignatures: same token split,
    // same two-prime polynomial token hash (257 mod 2147483647 packed over
    // 263 mod 2147483629), same sign-of-counter-sum fingerprint. Pairs are
    // brute-forced (the corpus is small at oracle SF) — exact vs the
    // banded Spark plan because block-pair banding has recall 1.0 for
    // Hamming <= 6 by pigeonhole.
    "dedup_simhash" ->
      s"""WITH ${OracleCtes.corpus},
         |toks AS (SELECT doc_id,
         |  list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS w
         |  FROM corpus),
         |th AS (SELECT doc_id,
         |  list_reduce([CAST(0 AS BIGINT)] || [ord(tok[i]) for i in generate_series(1, len(tok))],
         |              (h, c) -> (h * 257 + c) % 2147483647) * 4294967296
         |  + list_reduce([CAST(0 AS BIGINT)] || [ord(tok[i]) for i in generate_series(1, len(tok))],
         |              (h, c) -> (h * 263 + c) % 2147483629) AS h
         |  FROM (SELECT doc_id, unnest(w) AS tok FROM toks)),
         |bits AS (
         |  SELECT doc_id, bb.b,
         |    SUM(CASE WHEN ((h >> bb.b) & 1) = 1 THEN 1 ELSE -1 END) AS cnt
         |  FROM th CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) bb
         |  GROUP BY doc_id, bb.b),
         |fps AS (
         |  SELECT doc_id,
         |    CAST(SUM(CASE WHEN cnt > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS fp
         |  FROM bits GROUP BY doc_id)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
         |FROM fps a JOIN fps b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.fp, b.fp)) <= 6""".stripMargin,
    "dedup_jaccard" ->
      s"""WITH ${OracleCtes.corpus},
         |words AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w FROM corpus),
         |shs AS (SELECT doc_id,
         |  list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
         |                 for i in generate_series(1, len(w)-2)]) AS st
         |  FROM words),
         |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(len(list_intersect(a.st, b.st)) AS DOUBLE)
         |    / len(list_distinct(a.st || b.st)) AS jaccard
         |  FROM shs a JOIN shs b ON a.doc_id < b.doc_id)
         |SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.5""".stripMargin,
    "dedup_clusters" ->
      s"""WITH RECURSIVE ${OracleCtes.corpus},
         |words AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w FROM corpus),
         |shs AS (SELECT doc_id,
         |  list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
         |                 for i in generate_series(1, len(w)-2)]) AS st
         |  FROM words),
         |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM shs a JOIN shs b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.st, b.st)) AS DOUBLE)
         |    / len(list_distinct(a.st || b.st)) >= 0.6),
         |e AS (SELECT id_a AS s, id_b AS d FROM pairs
         |      UNION SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT s, d FROM e
         |  UNION
         |  SELECT r.s, e2.d FROM reach r JOIN e e2 ON r.d = e2.s)
         |SELECT s AS doc_id, CAST(LEAST(s, MIN(d)) AS BIGINT) AS cluster_id
         |FROM reach GROUP BY s""".stripMargin,
    "dedup_substring" ->
      s"""WITH ${OracleCtes.corpus},
         |t AS (SELECT doc_id,
         |  list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS w
         |  FROM corpus),
         |p AS (SELECT doc_id, e['pos'] AS pos, e['gram'] AS gram FROM (
         |  SELECT doc_id, unnest([{'pos': s - 1, 'gram': array_to_string(w[s : s+9], ' ')}
         |                         for s in generate_series(1, len(w) - 9)]) AS e
         |  FROM t)),
         |dup AS (SELECT gram FROM p GROUP BY gram HAVING count(*) >= 2),
         |r AS (SELECT doc_id, pos,
         |  pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |  FROM p JOIN dup USING (gram)),
         |runs AS (SELECT doc_id, min(pos) AS p1, max(pos) AS p2 FROM r GROUP BY doc_id, grp)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(SUM(p2 - p1 + 10) AS BIGINT) AS dup_tokens
         |FROM runs GROUP BY doc_id""".stripMargin,
    "dedup_substring_gate" ->
      s"""WITH ${OracleCtes.corpus},
         |t AS (SELECT doc_id,
         |  list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS w
         |  FROM corpus),
         |p AS (SELECT doc_id, e['pos'] AS pos, e['gram'] AS gram FROM (
         |  SELECT doc_id, unnest([{'pos': s - 1, 'gram': array_to_string(w[s : s+9], ' ')}
         |                         for s in generate_series(1, len(w) - 9)]) AS e
         |  FROM t)),
         |dup AS (SELECT gram FROM p GROUP BY gram HAVING count(*) >= 2),
         |r AS (SELECT doc_id, pos,
         |  pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |  FROM p JOIN dup USING (gram)),
         |runs AS (SELECT doc_id, min(pos) AS p1, max(pos) AS p2 FROM r GROUP BY doc_id, grp),
         |spans AS (SELECT doc_id, CAST(SUM(p2 - p1 + 10) AS BIGINT) AS dup_tokens
         |          FROM runs GROUP BY doc_id)
         |SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_tokens,
         |  COALESCE(s.dup_tokens, 0) AS dup_tokens,
         |  CAST(COALESCE(s.dup_tokens, 0) AS DOUBLE) / len(t.w) AS dup_frac,
         |  (CAST(COALESCE(s.dup_tokens, 0) AS DOUBLE) / len(t.w)) <= 0.5 AS kept
         |FROM t LEFT JOIN spans s USING (doc_id)""".stripMargin,
    "dedup_cross" ->
      s"""WITH ${OracleCtes.corpus},
         |newdocs AS (SELECT doc_id, text FROM corpus WHERE doc_id >= 10000),
         |wl AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w FROM newdocs),
         |wr AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents),
         |shl AS (SELECT doc_id,
         |  list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
         |                 for i in generate_series(1, len(w)-2)]) AS st
         |  FROM wl),
         |shr AS (SELECT doc_id,
         |  list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
         |                 for i in generate_series(1, len(w)-2)]) AS st
         |  FROM wr),
         |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(len(list_intersect(a.st, b.st)) AS DOUBLE)
         |    / len(list_distinct(a.st || b.st)) AS jaccard
         |  FROM shl a CROSS JOIN shr b)
         |SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.6""".stripMargin,
    // Bit-for-bit mirror of DedupOps.winnowPairs (k=5, w=4, minShared=3,
    // maxDf = floor(0.05 * nDocs)): same rolling hash as text_winnow_fp,
    // df filter on the fingerprint index, exact shared counts.
    "dedup_winnow" ->
      """WITH norm AS (
        |  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id,
        |    [ (ord(t[i])*4362470401 + ord(t[i+1])*16974593 + ord(t[i+2])*66049
        |       + ord(t[i+3])*257 + ord(t[i+4])) % 2147483647
        |      for i in generate_series(1, len(t) - 4) ] AS hs
        |  FROM norm),
        |wins AS (
        |  SELECT doc_id,
        |    [ list_min(hs[s : s + 3]) for s in generate_series(1, greatest(1, len(hs) - 3)) ] AS fps
        |  FROM grams WHERE len(hs) >= 1),
        |x AS (SELECT doc_id, unnest(list_distinct(fps)) AS fp FROM wins),
        |dfs AS (SELECT fp, count(*) AS df FROM x GROUP BY fp),
        |keep AS (SELECT x.doc_id, x.fp FROM x JOIN dfs USING (fp)
        |  WHERE dfs.df <= greatest(2, CAST(floor((SELECT count(DISTINCT doc_id) FROM x) * 0.05) AS BIGINT))),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        |  FROM keep a JOIN keep b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, n_shared FROM pairs WHERE n_shared >= 3""".stripMargin)
}
