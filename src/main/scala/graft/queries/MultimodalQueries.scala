package graft.queries

import graft.Tables
import graft.operators.MultimodalOps
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal plumbing query: binary assets → per-partition batch feature
  * extraction (stubbed decode, real plumbing). The oracle reproduces the
  * stub's arithmetic over the text's codepoints (the payload is the UTF-8
  * encoding of ASCII text, so byte values == codepoints).
  */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "multimodal_features" -> { (s, dir) =>
      MultimodalOps.extractFeatures(
        MultimodalOps.assets(Tables.documents(s, dir))).toDF()
    })

  val oracle: Map[String, String] = Map(
    "multimodal_features" ->
      """WITH a AS (
        |  SELECT doc_id AS asset_id,
        |         ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
        |         CAST(length(text) AS INT) AS n,
        |         CAST(list_sum([unicode(c) for c in string_split(text, '')]) AS DOUBLE)
        |           / length(text) AS mean_byte
        |  FROM documents)
        |SELECT asset_id, media_type, n AS n_bytes,
        |  CASE WHEN media_type IN ('image','video') THEN 64 + n % 512 ELSE 0 END AS width,
        |  CASE WHEN media_type IN ('image','video') THEN 64 + (n * 7) % 512 ELSE 0 END AS height,
        |  CASE WHEN media_type IN ('audio','video') THEN 1000 + (n * 13) % 60000 ELSE 0 END AS duration_ms,
        |  mean_byte
        |FROM a""".stripMargin)
}
