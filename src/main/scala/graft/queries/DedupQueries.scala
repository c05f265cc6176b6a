package graft.queries

import graft.{OracleCtes, Tables}
import graft.operators.DedupOps
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-data dedup queries over the documents corpus (with
  * deterministically injected duplicates — see [[graft.Tables.corpus]]).
  * `dedup_simhash` has no SQL oracle (DuckDB's hash function differs), so
  * the driver records a rows-only check; its semantics are covered by
  * ScalaTest instead.
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
         |FROM reach GROUP BY s""".stripMargin)
}
