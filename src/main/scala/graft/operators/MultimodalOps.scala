package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column processing: media as opaque `binary` payloads with
  * typed metadata, decoded per-partition in batches — the shape a real
  * image/audio pipeline has on Spark (schema, partitioning, batched
  * per-partition iteration so a real codec can amortize setup).
  *
  * The decode step is REAL zero-dependency JVM parsing of two standard
  * uncompressed container formats (this environment ships no codec
  * libraries, so *compressed* formats stay out of scope by environment,
  * not by design — swapping a JPEG/FLAC codec into `decodeFeatures`
  * changes nothing around it):
  *
  *   - BMP (Windows bitmap, 24-bpp uncompressed): magic + header
  *     validation, little-endian dimension fields, 4-byte row padding,
  *     bottom-up rows, pixel statistics over the raster;
  *   - WAV (RIFF, 16-bit mono PCM): a real chunk walk (fmt /data plus
  *     skipping unknown chunks, word alignment), duration from the data
  *     length and sample rate, RMS and peak over the samples;
  *   - "video" assets are a concatenation of per-frame BMP files — each
  *     frame a fully valid BMP whose declared file size makes the
  *     concatenation walkable — standing in for a frame container at a
  *     fixed 4 fps ([[FrameMs]] per frame).
  *
  * Malformed payloads are SURFACED as rows with `decode_error` set and
  * `format = "error"`, never dropped: at 100 TB a silently dropped row is
  * an unauditable data loss; a tagged row is a filterable quality signal.
  * [[assets]] deterministically corrupts every 97th payload so the error
  * path is part of the oracle-checked contract, not dead code.
  */
object MultimodalOps {

  /** Fixed frame period of the BMP-sequence "video" container (4 fps). */
  val FrameMs = 250

  /** Sample rate of synthesized WAV fixtures. */
  val WavRate = 8000

  case class Asset(asset_id: Long, media_type: String, content: Array[Byte])

  case class AssetFeatures(
      asset_id: Long,
      media_type: String,
      format: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      duration_ms: Int,
      mean_value: Double,
      rms: Double,
      peak: Int,
      decode_error: Option[String])

  // ---------------------------------------------------------------------
  // Encoders (fixture synthesis — real format bytes, deterministic pixels)
  // ---------------------------------------------------------------------

  /** A complete 24-bpp BMP file. `pixel(j)` supplies the j-th pixel byte
    * in raster order (padding bytes excluded from the index space, so the
    * statistics a decoder computes are a pure function of `pixel`). */
  private[graft] def bmpBytes(w: Int, h: Int, pixel: Int => Int): Array[Byte] = {
    require(w > 0 && h > 0, s"bad BMP dims ${w}x$h")
    val rowSize = ((w * 3 + 3) / 4) * 4
    val imgSize = rowSize * h
    val size = 54 + imgSize
    val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size)
      .putShort(0).putShort(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(imgSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = 0
    var j = 0
    while (y < h) {
      var x = 0
      while (x < w * 3) { b.put(pixel(j).toByte); j += 1; x += 1 }
      var p = w * 3
      while (p < rowSize) { b.put(0.toByte); p += 1 }
      y += 1
    }
    b.array()
  }

  /** A complete 16-bit mono PCM WAV file. */
  private[graft] def wavBytes(samples: Array[Short], rate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val b = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) { b.putShort(samples(i)); i += 1 }
    b.array()
  }

  // ---------------------------------------------------------------------
  // Decoders (the real thing: parse bytes, validate, fail loudly)
  // ---------------------------------------------------------------------

  private def leInt(a: Array[Byte], off: Int): Int =
    (a(off) & 0xff) | ((a(off + 1) & 0xff) << 8) |
      ((a(off + 2) & 0xff) << 16) | ((a(off + 3) & 0xff) << 24)

  private def leShort(a: Array[Byte], off: Int): Int =
    (a(off) & 0xff) | ((a(off + 1) & 0xff) << 8)

  private[graft] case class BmpInfo(
      fileSize: Int, width: Int, height: Int, sumPixels: Long, nPixelBytes: Int)

  /** Parse one 24-bpp BMP starting at `off`. Handles 4-byte row padding
    * and bottom-up (positive height) or top-down (negative height) rasters;
    * statistics are orientation-invariant. */
  private[graft] def decodeBmp(a: Array[Byte], off: Int): Either[String, BmpInfo] = {
    if (a.length - off < 54) Left("truncated")
    else if (a(off) != 'B'.toByte || a(off + 1) != 'M'.toByte) Left("bad_magic")
    else {
      val fileSize = leInt(a, off + 2)
      val dataOff = leInt(a, off + 10)
      val w = leInt(a, off + 18)
      val h = math.abs(leInt(a, off + 22))
      val bpp = leShort(a, off + 28)
      val compression = leInt(a, off + 30)
      if (bpp != 24) Left(s"unsupported_bpp_$bpp")
      else if (compression != 0) Left(s"unsupported_compression_$compression")
      else if (w <= 0 || h == 0 || dataOff < 54) Left("bad_header")
      else {
        val rowSize = ((w * 3 + 3) / 4) * 4
        val need = dataOff.toLong + rowSize.toLong * h
        if (off + need > a.length || fileSize < need) Left("truncated")
        else {
          var sum = 0L
          var y = 0
          while (y < h) {
            val base = off + dataOff + y * rowSize
            var x = 0
            while (x < w * 3) { sum += a(base + x) & 0xff; x += 1 }
            y += 1
          }
          Right(BmpInfo(fileSize, w, h, sum, w * 3 * h))
        }
      }
    }
  }

  private[graft] case class WavInfo(
      rate: Int, nSamples: Int, durationMs: Int, sumSq: Long, peak: Int)

  /** Parse a 16-bit mono PCM WAV: chunk walk from offset 12, unknown
    * chunks skipped with RIFF word alignment. */
  private[graft] def decodeWav(a: Array[Byte]): Either[String, WavInfo] = {
    if (a.length < 44) Left("truncated")
    else if (!(a(0) == 'R' && a(1) == 'I' && a(2) == 'F' && a(3) == 'F' &&
               a(8) == 'W' && a(9) == 'A' && a(10) == 'V' && a(11) == 'E')) Left("bad_magic")
    else {
      var off = 12
      var fmt = -1; var channels = 0; var rate = 0; var bits = 0
      var dataOff = -1; var dataLen = 0
      var err: String = null
      while (err == null && off + 8 <= a.length) {
        val len = leInt(a, off + 4)
        if (len < 0) err = "bad_chunk"
        else {
          if (a(off) == 'f' && a(off + 1) == 'm' && a(off + 2) == 't' && a(off + 3) == ' ') {
            if (off + 8 + 16 > a.length) err = "truncated"
            else {
              fmt = leShort(a, off + 8)
              channels = leShort(a, off + 10)
              rate = leInt(a, off + 12)
              bits = leShort(a, off + 22)
            }
          } else if (a(off) == 'd' && a(off + 1) == 'a' && a(off + 2) == 't' && a(off + 3) == 'a') {
            dataOff = off + 8
            dataLen = len
          }
          off += 8 + len + (len & 1) // RIFF chunks are word-aligned
        }
      }
      if (err != null) Left(err)
      else if (fmt == -1 || dataOff < 0) Left("missing_chunk")
      else if (fmt != 1) Left(s"unsupported_codec_$fmt")
      else if (bits != 16 || channels != 1) Left(s"unsupported_layout_${bits}bit_${channels}ch")
      else if (rate <= 0) Left("bad_header")
      else if (dataOff.toLong + dataLen > a.length) Left("truncated")
      else {
        val n = dataLen / 2
        var sumSq = 0L
        var peak = 0
        var i = 0
        while (i < n) {
          val s = leShort(a, dataOff + 2 * i).toShort.toInt
          sumSq += s.toLong * s
          val ab = math.abs(s)
          if (ab > peak) peak = ab
          i += 1
        }
        Right(WavInfo(rate, n, (n.toLong * 1000 / rate).toInt, sumSq, peak))
      }
    }
  }

  /** Walk a concatenation of BMP files (each header's declared file size
    * is the stride). Right: the frames in order; Left: first parse error. */
  private[graft] def walkBmpSeq(a: Array[Byte], maxFrames: Int = Int.MaxValue)
      : Either[String, IndexedSeq[BmpInfo]] = {
    val frames = scala.collection.mutable.ArrayBuffer.empty[BmpInfo]
    var off = 0
    var err: String = null
    while (err == null && off < a.length && frames.length < maxFrames) {
      decodeBmp(a, off) match {
        case Right(info) => frames += info; off += info.fileSize
        case Left(e) => err = e
      }
    }
    if (err != null) Left(err) else Right(frames.toIndexedSeq)
  }

  /** Sniff-and-decode: dispatch on the payload's magic bytes (NOT the
    * claimed media_type — at scale the two disagree and the bytes win). */
  def decodeFeatures(a: Asset): AssetFeatures = {
    val n = a.content.length
    def err(msg: String): AssetFeatures =
      AssetFeatures(a.asset_id, a.media_type, "error", n, 0, 0, 0, 0.0, 0.0, 0, Some(msg))
    if (n < 12) err("truncated")
    else if (a.content(0) == 'B' && a.content(1) == 'M') {
      walkBmpSeq(a.content) match {
        case Left(e) => err(e)
        case Right(frames) if frames.length == 1 =>
          val f = frames.head
          AssetFeatures(a.asset_id, a.media_type, "bmp", n, f.width, f.height, 0,
            f.sumPixels.toDouble / f.nPixelBytes, 0.0, 0, None)
        case Right(frames) =>
          val first = frames.head
          val sum = frames.iterator.map(_.sumPixels).sum
          val npx = frames.iterator.map(_.nPixelBytes.toLong).sum
          AssetFeatures(a.asset_id, a.media_type, "bmpseq", n,
            first.width, first.height, frames.length * FrameMs,
            sum.toDouble / npx, 0.0, 0, None)
      }
    } else if (a.content(0) == 'R' && a.content(1) == 'I' &&
               a.content(2) == 'F' && a.content(3) == 'F') {
      decodeWav(a.content) match {
        case Left(e) => err(e)
        case Right(w) =>
          AssetFeatures(a.asset_id, a.media_type, "wav", n, 0, 0, w.durationMs,
            0.0, math.sqrt(w.sumSq.toDouble / math.max(1, w.nSamples)), w.peak, None)
      }
    } else err("bad_magic")
  }

  // ---------------------------------------------------------------------
  // Fixture synthesis: real format bytes, analytically-mirrorable content
  // ---------------------------------------------------------------------

  /** Binary asset table derived from documents: each doc becomes a REAL
    * media file synthesized deterministically from its id — image → BMP,
    * audio → WAV, video → BMP sequence — so the decoded statistics are a
    * pure function of the id and the DuckDB oracle can verify the
    * encode→decode round trip analytically. Every 97th payload is
    * truncated to 10 bytes to exercise the error surface end-to-end. */
  def assets(docs: DataFrame): Dataset[Asset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { d =>
        val mt = (d % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        val full = mt match {
          case "image" =>
            val w = (4 * (1 + d % 8)).toInt
            val h = (1 + d % 5).toInt
            bmpBytes(w, h, j => ((d * 31 + j * 7L) % 256).toInt)
          case "audio" =>
            val ns = (200 + d % 800).toInt
            wavBytes(Array.tabulate(ns)(i => ((d * 131 + i * 37L) % 4001 - 2000).toShort), WavRate)
          case _ =>
            val nf = (2 + d % 7).toInt
            val w = (4 * (1 + d % 4)).toInt
            val h = (1 + d % 3).toInt
            val frames = Array.tabulate(nf)(f =>
              bmpBytes(w, h, j => ((d * 31 + f * 101L + j * 7L) % 256).toInt))
            val out = new Array[Byte](frames.iterator.map(_.length).sum)
            var off = 0
            frames.foreach { fb => System.arraycopy(fb, 0, out, off, fb.length); off += fb.length }
            out
        }
        Asset(d, mt, if (d % 97 == 0) full.take(10) else full)
      }
    }
  }

  /** Batch feature extraction: one decode per asset, iterated per
    * partition (a real codec would amortize its setup here, exactly like
    * `mapInPandas` batches). Error rows are tagged, not dropped — the
    * output cardinality always equals the input's. */
  def extractFeatures(in: Dataset[Asset]): Dataset[AssetFeatures] = {
    val spark = in.sparkSession
    import spark.implicits._
    in.mapPartitions { batch =>
      // Per-partition setup for a real codec would go here.
      batch.map(decodeFeatures)
    }
  }

  case class Frame(asset_id: Long, frame_idx: Int, ts_ms: Int,
      width: Int, height: Int, mean_pixel: Double, frame_bytes: Int)

  /** Frame sampling: each video (BMP-sequence) asset explodes into one row
    * per decoded frame, capped at `maxFrames`, with the frame's own
    * decoded statistics. The row-multiplying flatMap inside mapPartitions
    * is the scale-relevant part; frames inherit the parent partitioning —
    * no shuffle until a downstream op asks for one. Malformed videos emit
    * no frames here — [[extractFeatures]] is the error-surfacing pass. */
  def sampleFrames(in: Dataset[Asset], maxFrames: Int = 8): Dataset[Frame] = {
    val spark = in.sparkSession
    import spark.implicits._
    in.mapPartitions { batch =>
      batch.filter(_.media_type == "video").flatMap { a =>
        walkBmpSeq(a.content, maxFrames) match {
          case Left(_) => Iterator.empty
          case Right(frames) =>
            frames.iterator.zipWithIndex.map { case (f, i) =>
              Frame(a.asset_id, i, i * FrameMs, f.width, f.height,
                f.sumPixels.toDouble / f.nPixelBytes, f.fileSize)
            }
        }
      }
    }
  }

  case class Resized(asset_id: Long, media_type: String,
      width: Int, height: Int, content: Array[Byte])

  /** Real image resize: decode the BMP, nearest-neighbor resample to
    * `w`x`h`, re-encode as a valid BMP (the output decodes). Non-BMP and
    * malformed payloads are skipped — use [[extractFeatures]] to audit
    * them. Operates on the raster in file order, so source orientation is
    * preserved. */
  def resize(in: Dataset[Asset], w: Int, h: Int): Dataset[Resized] = {
    require(w > 0 && h > 0, s"bad resize target ${w}x$h")
    val spark = in.sparkSession
    import spark.implicits._
    in.mapPartitions { batch =>
      batch.flatMap { a =>
        val c = a.content
        if (c.length < 2 || c(0) != 'B'.toByte || c(1) != 'M'.toByte) Iterator.empty
        else decodeBmp(c, 0) match {
          case Left(_) => Iterator.empty
          case Right(src) =>
            val dataOff = leInt(c, 10)
            val srcRow = ((src.width * 3 + 3) / 4) * 4
            val out = bmpBytes(w, h, { j =>
              val y = j / (w * 3)
              val rem = j % (w * 3)
              val x = rem / 3
              val ch = rem % 3
              val sy = (y.toLong * src.height / h).toInt
              val sx = (x.toLong * src.width / w).toInt
              c(dataOff + sy * srcRow + sx * 3 + ch) & 0xff
            })
            Iterator.single(Resized(a.asset_id, a.media_type, w, h, out))
        }
      }
    }
  }
}
