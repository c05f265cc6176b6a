package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, processed per-partition in batches — the shape a real
  * image/audio pipeline has on Spark. The *decode step is a stub*
  * (`decodeStub`): this container has no imaging/audio libraries, so it
  * derives deterministic fake dimensions from the payload instead of
  * parsing it. Everything around the stub — binary column, case-class
  * schema, `mapPartitions` batch iteration, partition-preserving plumbing —
  * is real and oracle-checked.
  */
object MultimodalOps {

  case class Asset(asset_id: Long, media_type: String, content: Array[Byte])

  case class AssetFeatures(
      asset_id: Long,
      media_type: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      duration_ms: Int,
      mean_byte: Double)

  /** Binary asset table derived from documents: payload = UTF-8 bytes of
    * the text, media type round-robins image/audio/video. */
  def assets(docs: DataFrame): Dataset[Asset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("asset_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("content"))
      .as[Asset]
  }

  /** STUB decoder — stands in for e.g. an image/audio codec. Real
    * implementation would parse `content`; this derives deterministic
    * metadata so the pipeline is testable offline. */
  private def decodeStub(a: Asset): AssetFeatures = {
    val n = a.content.length
    var sum = 0L
    var i = 0
    while (i < n) { sum += a.content(i) & 0xff; i += 1 }
    val isVisual = a.media_type == "image" || a.media_type == "video"
    val isTemporal = a.media_type == "audio" || a.media_type == "video"
    AssetFeatures(
      asset_id = a.asset_id,
      media_type = a.media_type,
      n_bytes = n,
      width = if (isVisual) 64 + n % 512 else 0,
      height = if (isVisual) 64 + (n * 7) % 512 else 0,
      duration_ms = if (isTemporal) 1000 + (n * 13) % 60000 else 0,
      mean_byte = sum.toDouble / n)
  }

  /** Batch feature extraction: one decoder invocation per asset, iterated
    * per partition (so a real codec could amortize model/codec setup per
    * partition, exactly like `mapInPandas` batches). */
  def extractFeatures(in: Dataset[Asset]): Dataset[AssetFeatures] = {
    val spark = in.sparkSession
    import spark.implicits._
    in.mapPartitions { batch =>
      // Per-partition setup for a real codec would go here.
      batch.map(decodeStub)
    }
  }

  case class Frame(asset_id: Long, frame_idx: Int, ts_ms: Int, frame: Array[Byte])

  /** STUB frame sampler — the fan-out shape of real video sampling: each
    * video asset explodes into one "frame" row per second of (stub)
    * duration, capped at `maxFrames`, each frame a deterministic payload
    * slice. The row-multiplying `flatMap` inside `mapPartitions` is the
    * real part: a codec swaps in for the slice, the partitioning,
    * schema, and batch iteration stay as-is. Frames inherit the parent
    * partitioning — no shuffle until a downstream op asks for one. */
  def sampleFrames(in: Dataset[Asset], maxFrames: Int = 8): Dataset[Frame] = {
    val spark = in.sparkSession
    import spark.implicits._
    in.mapPartitions { batch =>
      batch.filter(_.media_type == "video").flatMap { a =>
        val d = decodeStub(a).duration_ms
        val nf = math.min(maxFrames, d / 1000)
        val len = a.content.length
        (0 until nf).iterator.map { i =>
          val start = (i * 17) % len
          Frame(a.asset_id, i, i * d / nf,
            a.content.slice(start, start + math.min(32, len - start)))
        }
      }
    }
  }

  case class Resized(asset_id: Long, media_type: String,
      width: Int, height: Int, content: Array[Byte])

  /** STUB resize — the transform shape of an image-preprocessing stage:
    * decode, scale to `w`x`h`, re-encode. The stub re-encodes as a
    * deterministic cyclic resample of the source payload sized
    * proportionally to the target area; a real implementation replaces
    * only the per-asset body. */
  def resize(in: Dataset[Asset], w: Int, h: Int): Dataset[Resized] = {
    val spark = in.sparkSession
    import spark.implicits._
    in.mapPartitions { batch =>
      batch.filter(a => a.media_type == "image" || a.media_type == "video")
        .map { a =>
          val outLen = math.max(1, (w * h) / 64)
          val src = a.content
          val out = new Array[Byte](outLen)
          var i = 0
          while (i < outLen) { out(i) = src((i * src.length / outLen) % src.length); i += 1 }
          Resized(a.asset_id, a.media_type, w, h, out)
        }
    }
  }
}
