package graft.sources

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck laws tying the three binning schemes together:
  *
  *  - the generic CSI `reg2bins(min_shift=14, depth=5)` must enumerate
  *    EXACTLY the bins of the fixed BAI/TBI query walk (the CSI spec
  *    defines `.bai` as the `(14, 5)` special case — any divergence is
  *    a bug in one of the two implementations);
  *  - `reg2bin` (the writer's single-bin assignment) must always be
  *    among `reg2bins` of any query range overlapping the record (else
  *    an indexed record would be unreachable);
  *  - deeper/shifted schemes must still cover: the record's bin appears
  *    in its own span's query bins for arbitrary valid (shift, depth).
  */
object IndexBinLaws extends Properties("IndexBins") {

  // Positions across the BAI-addressable range, biased to small values
  // (where real data lives) but reaching the 2^29 boundary.
  private val pos0 = Gen.frequency(
    6 -> Gen.chooseNum(0, 1 << 20),
    3 -> Gen.chooseNum(0, (1 << 29) - 2),
    1 -> Gen.oneOf(0, 1, (1 << 14) - 1, 1 << 14, (1 << 29) - 2))
  private val span = Gen.frequency(
    6 -> Gen.chooseNum(1, 10000),
    3 -> Gen.chooseNum(1, 1 << 20),
    1 -> Gen.oneOf(1, 1 << 14, 1 << 17, 1 << 26))

  property("generic (14,5) reg2bins equals the BAI query walk") =
    forAll(pos0, span) { (b, s) =>
      val end = math.min((1L << 29), b.toLong + s).toInt
      val bai = BamFormat.BaiIndex.reg2bins(b, end).sorted
      val csi = BamFormat.CsiIndex.reg2bins(b.toLong, end.toLong, 14, 5).sorted
      bai == csi
    }

  property("a record's reg2bin is enumerated by every overlapping query") =
    forAll(pos0, span, pos0, span) { (rb, rs, qb, qs) =>
      val rEnd = math.min((1L << 29), rb.toLong + rs).toInt
      val qEnd = math.min((1L << 29), qb.toLong + qs).toInt
      val overlap = rb < qEnd && qb < rEnd
      !overlap || BamFormat.BaiIndex.reg2bins(qb, qEnd)
        .contains(BamFormat.reg2bin(rb, rEnd))
    }

  property("generic schemes are self-covering for arbitrary (shift, depth)") =
    forAll(pos0, span, Gen.chooseNum(12, 16), Gen.chooseNum(3, 6)) {
      (b, s, shift, depth) =>
        val cap = 1L << (shift + depth * 3)
        val beg = math.min(b.toLong, cap - 2)
        val end = math.min(cap, beg + s)
        // The deepest bin containing [beg, end) per the generic scheme.
        def binOf(beg0: Long, end0: Long): Int = {
          var l = depth; var sft = shift
          while (l > 0 && (beg0 >> sft) != ((end0 - 1) >> sft)) { sft += 3; l -= 1 }
          val t = ((1L << (3 * l)) - 1) / 7
          (t + (beg0 >> sft)).toInt
        }
        BamFormat.CsiIndex.reg2bins(beg, end, shift, depth)
          .contains(binOf(beg, end))
    }
}
