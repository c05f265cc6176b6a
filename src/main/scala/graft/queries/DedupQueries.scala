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
         |SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.6""".stripMargin)
}
