package graft.operators

import graft.operators.MultimodalOps._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The multimodal decode is real byte parsing, so the laws are
  * encode→decode round trips over random content — including the row
  * padding and odd-chunk paths the deterministic fixtures never hit. */
object MultimodalLaws extends Properties("Multimodal") {

  private val dims = for {
    w <- Gen.choose(1, 40) // NOT a multiple of 4 in general: padding path
    h <- Gen.choose(1, 12)
  } yield (w, h)

  property("BMP round trip: dims, size, pixel stats; padding excluded") =
    forAll(dims, Gen.choose(0L, Long.MaxValue / 2)) { case ((w, h), seed) =>
      val pix = (j: Int) => ((seed + j * 13L) % 256).toInt
      val bytes = bmpBytes(w, h, pix)
      val info = decodeBmp(bytes, 0).toOption.get
      val n = w * 3 * h
      info.width == w && info.height == h && info.fileSize == bytes.length &&
        info.nPixelBytes == n &&
        info.sumPixels == (0 until n).map(j => pix(j).toLong).sum
    }

  property("WAV round trip: duration, sum-of-squares, peak") =
    forAll(Gen.choose(1, 500), Gen.choose(0L, Long.MaxValue / 2)) { (n, seed) =>
      val samples = Array.tabulate(n)(i => ((seed + i * 7919L) % 65536 - 32768).toShort)
      val info = decodeWav(wavBytes(samples, 8000)).toOption.get
      info.rate == 8000 && info.nSamples == n &&
        info.durationMs == (n.toLong * 1000 / 8000).toInt &&
        info.peak == samples.iterator.map(s => math.abs(s.toInt)).max &&
        info.sumSq == samples.iterator.map(s => s.toLong * s).sum
    }

  property("truncating a valid file at any point yields an error, not junk stats") =
    forAll(dims, Gen.choose(0, 53)) { case ((w, h), cut) =>
      val full = bmpBytes(w, h, _ => 42)
      decodeBmp(full.dropRight(full.length - cut), 0).isLeft
    }
}
