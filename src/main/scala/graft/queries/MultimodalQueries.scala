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
    },
    // Frame sampling fan-out: video assets explode into per-frame rows.
    // The frame payload is value-checked via its length and first byte
    // (the full blob compare would just restate the slice arithmetic).
    "multimodal_frames" -> { (s, dir) =>
      import s.implicits._
      MultimodalOps.sampleFrames(MultimodalOps.assets(Tables.documents(s, dir)))
        .map(f => (f.asset_id, f.frame_idx, f.ts_ms, f.frame.length, f.frame(0) & 0xff))
        .toDF("asset_id", "frame_idx", "ts_ms", "frame_bytes", "first_byte")
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
        |FROM a""".stripMargin,
    "multimodal_frames" ->
      """WITH v AS (
        |  SELECT doc_id AS asset_id, CAST(length(text) AS INT) AS n, text
        |  FROM documents WHERE doc_id % 3 = 2),
        |d AS (SELECT asset_id, n, text, 1000 + (n * 13) % 60000 AS dur FROM v),
        |e AS (SELECT asset_id, n, text, dur, LEAST(8, dur // 1000) AS nf FROM d),
        |g AS (SELECT asset_id, n, text, dur, nf,
        |             unnest(generate_series(0, nf - 1)) AS i FROM e)
        |SELECT asset_id, CAST(i AS INT) AS frame_idx,
        |       CAST(i * dur // nf AS INT) AS ts_ms,
        |       CAST(LEAST(32, n - (i * 17) % n) AS INT) AS frame_bytes,
        |       unicode(substr(text, (i * 17) % n + 1, 1)) AS first_byte
        |FROM g""".stripMargin)
}
