package graft.queries

import graft.Tables
import graft.operators.MultimodalOps
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal queries: binary assets → per-partition batch decode with
  * REAL pure-JVM BMP/WAV parsers ([[graft.operators.MultimodalOps]]).
  * The fixtures are real format bytes synthesized deterministically from
  * doc_id, so the oracle verifies the encode→decode round trip by
  * computing the same statistics analytically — if the parser misreads a
  * header field, skips padding wrong, or drops an error row, the hashes
  * diverge. Every 97th asset is a truncated payload whose `decode_error`
  * row is part of the checked contract.
  */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "multimodal_features" -> { (s, dir) =>
      import s.implicits._
      MultimodalOps.extractFeatures(
        MultimodalOps.assets(Tables.documents(s, dir)))
        .map(f => (f.asset_id, f.media_type, f.format, f.n_bytes, f.width,
          f.height, f.duration_ms, f.mean_value, f.rms, f.peak,
          f.decode_error.orNull))
        .toDF("asset_id", "media_type", "format", "n_bytes", "width",
          "height", "duration_ms", "mean_value", "rms", "peak", "decode_error")
    },
    // Frame sampling fan-out: video assets (BMP sequences) explode into
    // per-frame rows carrying each frame's own decoded statistics.
    "multimodal_frames" -> { (s, dir) =>
      MultimodalOps.sampleFrames(MultimodalOps.assets(Tables.documents(s, dir)))
        .toDF()
    })

  // The oracle mirrors the SYNTHESIS arithmetic, not the parser: pixels
  // of image d are (d*31 + j*7) % 256 over j < w*3*h, WAV samples are
  // (d*131 + i*37) % 4001 - 2000 over i < ns — so agreement proves the
  // encoder and decoder round-trip through real format bytes.
  val oracle: Map[String, String] = Map(
    "multimodal_features" ->
      """WITH p AS (
        |  SELECT doc_id AS d,
        |    ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
        |    (doc_id % 97 = 0) AS corrupt,
        |    CAST(4 * (1 + doc_id % 8) AS BIGINT) AS iw,
        |    CAST(1 + doc_id % 5 AS BIGINT) AS ih,
        |    CAST(200 + doc_id % 800 AS BIGINT) AS ns,
        |    CAST(2 + doc_id % 7 AS BIGINT) AS nf,
        |    CAST(4 * (1 + doc_id % 4) AS BIGINT) AS vw,
        |    CAST(1 + doc_id % 3 AS BIGINT) AS vh
        |  FROM documents)
        |SELECT d AS asset_id, media_type,
        |  CASE WHEN corrupt THEN 'error'
        |       WHEN media_type = 'image' THEN 'bmp'
        |       WHEN media_type = 'audio' THEN 'wav'
        |       ELSE 'bmpseq' END AS format,
        |  CAST(CASE WHEN corrupt THEN 10
        |       WHEN media_type = 'image' THEN 54 + iw*3*ih
        |       WHEN media_type = 'audio' THEN 44 + 2*ns
        |       ELSE nf*(54 + vw*3*vh) END AS INT) AS n_bytes,
        |  CAST(CASE WHEN corrupt THEN 0
        |       WHEN media_type = 'image' THEN iw
        |       WHEN media_type = 'video' THEN vw ELSE 0 END AS INT) AS width,
        |  CAST(CASE WHEN corrupt THEN 0
        |       WHEN media_type = 'image' THEN ih
        |       WHEN media_type = 'video' THEN vh ELSE 0 END AS INT) AS height,
        |  CAST(CASE WHEN corrupt THEN 0
        |       WHEN media_type = 'audio' THEN ns*1000 // 8000
        |       WHEN media_type = 'video' THEN nf*250 ELSE 0 END AS INT) AS duration_ms,
        |  CASE WHEN corrupt THEN 0.0
        |       WHEN media_type = 'image'
        |         THEN list_sum([(d*31 + j*7) % 256 for j in range(0, iw*3*ih)])
        |              / (iw*3*ih)
        |       WHEN media_type = 'video'
        |         THEN list_sum(flatten([[(d*31 + f*101 + j*7) % 256
        |                                 for j in range(0, vw*3*vh)]
        |                                for f in range(0, nf)]))
        |              / (nf*vw*3*vh)
        |       ELSE 0.0 END AS mean_value,
        |  CASE WHEN NOT corrupt AND media_type = 'audio'
        |       THEN sqrt(list_sum([((d*131 + i*37) % 4001 - 2000)
        |                           * ((d*131 + i*37) % 4001 - 2000)
        |                           for i in range(0, ns)]) / ns)
        |       ELSE 0.0 END AS rms,
        |  CAST(CASE WHEN NOT corrupt AND media_type = 'audio'
        |       THEN list_max([abs((d*131 + i*37) % 4001 - 2000)
        |                      for i in range(0, ns)])
        |       ELSE 0 END AS INT) AS peak,
        |  CASE WHEN corrupt THEN 'truncated' ELSE NULL END AS decode_error
        |FROM p""".stripMargin,
    "multimodal_frames" ->
      """WITH v AS (
        |  SELECT doc_id AS d,
        |    CAST(2 + doc_id % 7 AS BIGINT) AS nf,
        |    CAST(4 * (1 + doc_id % 4) AS BIGINT) AS w,
        |    CAST(1 + doc_id % 3 AS BIGINT) AS h
        |  FROM documents WHERE doc_id % 3 = 2 AND doc_id % 97 <> 0),
        |g AS (SELECT d, nf, w, h, unnest(generate_series(0, nf - 1)) AS f FROM v)
        |SELECT d AS asset_id, CAST(f AS INT) AS frame_idx,
        |  CAST(f * 250 AS INT) AS ts_ms,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  list_sum([(d*31 + f*101 + j*7) % 256 for j in range(0, w*3*h)])
        |    / (w*3*h) AS mean_pixel,
        |  CAST(54 + w*3*h AS INT) AS frame_bytes
        |FROM g""".stripMargin)
}
