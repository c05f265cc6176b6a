package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck laws for the pure interval-function semantics (SURVEY §5
  * recommendation: property tests replace the unavailable genomic golden
  * files). [[GraftFunctionsSqlSpec]] separately pins the SQL surface to
  * this executable specification.
  */
object RangeFunctionLaws extends Properties("RangeFunctions") {

  private val pos = Gen.chooseNum(1, 1000000)
  private val smallShift = Gen.chooseNum(-1000, 1000)
  private val iv = for {
    s <- pos; len <- Gen.chooseNum(0, 500)
  } yield (s, s + len)

  property("shift translates both ends and preserves width") =
    forAll(iv, smallShift) { case ((s, e), k) =>
      val r = RangeFunctions.shift(s, e, k)
      r.start == s + k && r.end == e + k && (r.end - r.start) == (e - s)
    }

  property("shift by k then -k is identity") =
    forAll(iv, smallShift) { case ((s, e), k) =>
      val r = RangeFunctions.shift(s, e, k)
      RangeFunctions.shift(r.start, r.end, -k) == GInterval(s, e)
    }

  property("resize(start) anchors start; resize(end) anchors end") =
    forAll(iv, smallShift) { case ((s, e), k) =>
      RangeFunctions.resize(s, e, k, "start") == GInterval(s, e + k) &&
      RangeFunctions.resize(s, e, k, "END") == GInterval(s - k, e)
    }

  property("resize(center) yields width 2*(w/2)+k (reference truncation)") =
    forAll(iv, Gen.chooseNum(0, 500)) { case ((s, e), k) =>
      val r = RangeFunctions.resize(s, e, k, "center")
      // The reference splits the old width with integer division, so an
      // odd width loses one unit before k is added.
      (r.end - r.start) == 2 * ((e - s) / 2) + k
    }

  property("overlapLength is symmetric and equals width on self") =
    forAll(iv, iv) { case ((s1, e1), (s2, e2)) =>
      RangeFunctions.overlapLength(s1, e1, s2, e2) ==
        RangeFunctions.overlapLength(s2, e2, s1, e1) &&
      RangeFunctions.overlapLength(s1, e1, s1, e1) == (e1 - s1 + 1)
    }

  property("overlapLength positive iff intervals overlap (end-inclusive)") =
    forAll(iv, iv) { case ((s1, e1), (s2, e2)) =>
      (RangeFunctions.overlapLength(s1, e1, s2, e2) > 0) == (e1 >= s2 && s1 <= e2)
    }

  property("flank has width |w| (both=false) or 2|w| (both=true)") =
    forAll(iv, smallShift.suchThat(_ != 0), Gen.oneOf(true, false), Gen.oneOf(true, false)) {
      case ((s, e), w, sf, both) =>
        val r = RangeFunctions.flank(s, e, w, sf, both)
        val width = r.end - r.start + 1
        if (both) width == 2 * math.abs(w) else width == math.abs(w)
    }

  property("promoters spans upstream+downstream around start") =
    forAll(iv, Gen.chooseNum(0, 300), Gen.chooseNum(0, 300)) {
      case ((s, e), up, down) =>
        val r = RangeFunctions.promoters(s, e, up, down)
        r == GInterval(s - up, s + down - 1)
    }

  property("reflect is an involution within the bounds") =
    forAll(iv, pos, Gen.chooseNum(0, 2000)) { case ((s, e), bs, extra) =>
      val be = math.max(e, bs) + extra
      val r = RangeFunctions.reflect(s, e, bs, be)
      RangeFunctions.reflect(r.start, r.end, bs, be) == GInterval(s, e) &&
        (r.end - r.start) == (e - s)
    }

  property("cleanContig strips chr and maps mitochondrial names") = Prop.all(
    RangeFunctions.cleanContig("chr1") == "1",
    RangeFunctions.cleanContig("chrX") == "X",
    RangeFunctions.cleanContig("chrM") == "MT",
    RangeFunctions.cleanContig("chrMT") == "MT",
    RangeFunctions.cleanContig("M") == "MT",
    RangeFunctions.cleanContig("17") == "17",
    RangeFunctions.cleanContig(null) == null)
}
