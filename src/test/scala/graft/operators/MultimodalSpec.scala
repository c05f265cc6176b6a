package graft.operators

import graft.{SparkSpec, Tables}
import graft.operators.MultimodalOps._

/** Spark-side multimodal behavior: fixture synthesis produces real
  * decodable media, errors surface as tagged rows, resize re-encodes
  * valid BMPs, frame sampling decodes every embedded frame. (Pure
  * encode→decode round-trip laws live in [[MultimodalLaws]].) */
class MultimodalSpec extends SparkSpec {

  test("WAV chunk walk skips unknown chunks (odd-length LIST before fmt/data)") {
    val samples = Array.tabulate(10)(i => (i * 100).toShort)
    val plain = wavBytes(samples, 8000)
    // Splice a LIST chunk (odd length: exercises word alignment) after WAVE.
    val extra = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val riffLen = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(plain.length - 8 + extra.length).array()
    val spliced = plain.take(4) ++ riffLen ++ plain.slice(8, 12) ++ extra ++ plain.drop(12)
    val info = decodeWav(spliced).fold(e => fail(s"decode failed: $e"), identity)
    assert(info.nSamples === 10)
    assert(info.peak === 900)
  }

  test("BMP sequence walk: frame count, stride, per-frame stats, truncation") {
    val frames = (0 until 5).map(f => bmpBytes(7, 3, j => (f * 50 + j) % 256))
    val seq = frames.flatten.toArray
    val walked = walkBmpSeq(seq).fold(e => fail(s"walk failed: $e"), identity)
    assert(walked.length === 5)
    walked.zipWithIndex.foreach { case (info, f) =>
      assert(info.width === 7 && info.height === 3)
      assert(info.sumPixels === (0 until 7 * 3 * 3).map(j => ((f * 50 + j) % 256).toLong).sum)
    }
    assert(walkBmpSeq(seq, maxFrames = 2).toOption.get.length === 2)
    // Truncation mid-frame surfaces the error instead of a short result.
    assert(walkBmpSeq(seq.dropRight(10)).isLeft)
  }

  test("malformed payloads: tagged error rows, never dropped") {
    assert(decodeFeatures(Asset(1, "image", Array[Byte](1, 2, 3))).decode_error === Some("truncated"))
    assert(decodeFeatures(Asset(2, "image", Array.fill[Byte](64)('x'))).decode_error === Some("bad_magic"))
    val good = bmpBytes(8, 2, _ => 7)
    assert(decodeFeatures(Asset(3, "image", good.take(20))).decode_error === Some("truncated"))
    val f = decodeFeatures(Asset(4, "image", good))
    assert(f.decode_error === None && f.format === "bmp" && f.mean_value === 7.0)
    // End-to-end cardinality: every asset yields exactly one feature row.
    val docs = Tables.documents(spark, sf0001)
    val assetsDs = MultimodalOps.assets(docs)
    assert(MultimodalOps.extractFeatures(assetsDs).count() === docs.count())
    val errRows = MultimodalOps.extractFeatures(assetsDs)
      .filter(_.format == "error").collect()
    assert(errRows.nonEmpty, "the 97-periodic corrupt fixtures must exist")
    assert(errRows.forall(_.decode_error === Some("truncated")))
  }

  test("fixtures are real media: every clean asset decodes as its claimed type") {
    val feats = MultimodalOps.extractFeatures(
      MultimodalOps.assets(Tables.documents(spark, sf0001))).collect()
    val clean = feats.filter(_.format != "error")
    assert(clean.forall { f =>
      (f.media_type, f.format) match {
        case ("image", "bmp") => f.width > 0 && f.height > 0 && f.duration_ms == 0
        case ("audio", "wav") => f.duration_ms > 0 && f.peak > 0 && f.rms > 0
        case ("video", "bmpseq") => f.width > 0 && f.duration_ms % FrameMs == 0
        case _ => false
      }
    }, "sniffed format must match the synthesized media type")
  }

  test("resize emits valid BMPs at target dimensions; identity resize preserves stats") {
    val spark0 = spark
    import spark0.implicits._
    val src = bmpBytes(10, 6, j => (j * 3) % 256) // width 10: padded rows
    val in = spark0.createDataset(Seq(Asset(1, "image", src)))
    val out = MultimodalOps.resize(in, 5, 3).collect()
    assert(out.length === 1)
    val r = decodeBmp(out.head.content, 0).fold(e => fail(s"resize output invalid: $e"), identity)
    assert(r.width === 5 && r.height === 3)
    val same = MultimodalOps.resize(in, 10, 6).collect().head
    val rt = decodeBmp(same.content, 0).toOption.get
    assert(rt.sumPixels === decodeBmp(src, 0).toOption.get.sumPixels,
      "identity resize must preserve the raster")
    // Corrupt input: skipped here (the features pass surfaces it).
    val bad = spark0.createDataset(Seq(Asset(2, "image", src.take(9))))
    assert(MultimodalOps.resize(bad, 4, 4).count() === 0)
  }

  test("frame sampling decodes each embedded frame with its own stats") {
    val docs = Tables.documents(spark, sf0001)
    val frames = MultimodalOps.sampleFrames(MultimodalOps.assets(docs)).collect()
    assert(frames.nonEmpty)
    frames.groupBy(_.asset_id).foreach { case (d, fs) =>
      val nf = (2 + d % 7).toInt
      assert(fs.length === math.min(8, nf))
      fs.foreach { fr =>
        assert(fr.width === (4 * (1 + d % 4)).toInt)
        assert(fr.ts_ms === fr.frame_idx * MultimodalOps.FrameMs)
        val w = fr.width; val h = fr.height
        val expected = (0 until w * 3 * h)
          .map(j => (d * 31 + fr.frame_idx * 101L + j * 7L) % 256).sum.toDouble / (w * 3 * h)
        assert(math.abs(fr.mean_pixel - expected) < 1e-12)
      }
    }
  }
}
