package graft.functions

/** Interval returned by the range-transformation functions (reference
  * `org.biodatageeks.formats.Interval`, printed as
  * `struct<start:int,end:int>` — SURVEY §1.3). */
case class GInterval(start: Int, end: Int)

/** Pure-Scala reference semantics of the interval UDF pack
  * (`rangejoins/methods/transformations/RangeMethods.scala:15-102`).
  * The SQL surface is served by the codegen-friendly expression
  * compositions in [[GraftFunctions]]; this object is the executable
  * specification the ScalaCheck laws test the SQL functions against,
  * and the API for Scala callers.
  *
  * Coordinates are 1-based, end-inclusive throughout.
  */
object RangeFunctions {

  def shift(start: Int, end: Int, k: Int): GInterval = GInterval(start + k, end + k)

  /** Grow/shrink by `k` anchored at `fix` ∈ {start, end, center}; the
    * center anchor gives the extra unit of an odd `k` to the left side. */
  def resize(start: Int, end: Int, k: Int, fix: String): GInterval = fix.toLowerCase match {
    case "start" => GInterval(start, end + k)
    case "end" => GInterval(start - k, end)
    case _ =>
      val width = end - start
      val center = start + width / 2
      val leftPad = width / 2 + (if (k % 2 == 0) k / 2 else k / 2 + 1)
      GInterval(center - leftPad, center + width / 2 + k / 2)
  }

  /** Overlap length of two inclusive intervals; positive iff they overlap. */
  def overlapLength(s1: Int, e1: Int, s2: Int, e2: Int): Int =
    math.min(e1, e2) - math.max(s1, s2) + 1

  /** Flanking interval of width |w| before (`startFlank`) or after the
    * interval; `both` makes it span w inside + w outside the boundary. */
  def flank(start: Int, end: Int, w: Int, startFlank: Boolean, both: Boolean): GInterval =
    if (both) {
      val width = math.abs(w)
      val ns = if (startFlank) start - width else end - width + 1
      GInterval(ns, ns + 2 * width - 1)
    } else {
      val ns = (startFlank, w >= 0) match {
        case (true, true) => start - w
        case (true, false) => start
        case (false, true) => end + 1
        case (false, false) => end + w + 1
      }
      GInterval(ns, ns + math.abs(w) - 1)
    }

  /** Promoter region: `[start-upstream, start+downstream-1]`. */
  def promoters(start: Int, end: Int, upstream: Int, downstream: Int): GInterval =
    GInterval(start - upstream, start + downstream - 1)

  /** Mirror the interval within `[boundStart, boundEnd]`. */
  def reflect(start: Int, end: Int, boundStart: Int, boundEnd: Int): GInterval = {
    val ns = boundStart + boundEnd - end
    GInterval(ns, ns + end - start)
  }

  /** Contig normalization (`chr1`→`1`, `chrM`/`chrMT`/`M`→`MT`) —
    * reference `utils/DataQualityFuncs.cleanContig:9-41`. */
  def cleanContig(contig: String): String =
    if (contig == null) null
    else {
      val stripped = if (contig.startsWith("chr")) contig.substring(3) else contig
      if (stripped == "M") "MT" else stripped
    }

  /** Inverse direction (`1`→`chr1`, `MT`→`chrM`) — reference
    * `utils/DataQualityFuncs.unCleanContig:42-72` (which, like here,
    * prepends unconditionally: it is the inverse of cleanContig on
    * normalized names, not an involution partner on arbitrary input). */
  def unCleanContig(contig: String): String =
    if (contig == null) null
    else if (contig == "MT") "chrM"
    else "chr" + contig
}
