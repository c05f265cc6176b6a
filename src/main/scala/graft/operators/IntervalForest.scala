package graft.operators

import scala.collection.mutable
import scala.reflect.ClassTag

/** Immutable, array-backed augmented interval tree over `Int` coordinates,
  * 1-based and **end-inclusive**: `[s1,e1]` overlaps `[s2,e2]` iff
  * `e1 >= s2 && s1 <= e2` (reference semantics:
  * `rangejoins/IntervalTree/Interval.scala:5-10`,
  * `IntervalTreeRedBlack.java:44-46`).
  *
  * Layout: intervals sorted by start in flat primitive arrays; the implicit
  * balanced BST is the binary-search midpoint recursion, augmented with the
  * subtree max-end (`maxEnds(mid)` = max end over `[lo,hi)`). Compared with
  * the reference's node-based red-black tree
  * (`rangejoins/methods/IntervalTree/IntervalTreeRedBlack.java`) this is
  * built once, cache-friendly, and — crucial at cluster scale — cheap to
  * serialize into a broadcast (4 primitive arrays + one value array, no
  * object graph). Query cost is O(log n + k).
  */
final class IntervalForest[T] private (
    private val starts: Array[Int],
    private val ends: Array[Int],
    private val maxEnds: Array[Int],
    private val values: Array[T]) extends IntervalHolder[T] {

  def size: Int = starts.length

  /** Invoke `f(storedStart, storedEnd, value)` for every stored interval
    * overlapping `[qs, qe]` (inclusive). Allocation-free. */
  override def foreachOverlap(qs: Int, qe: Int)(f: (Int, Int, T) => Unit): Unit =
    search(0, starts.length, qs, qe, f)

  private def search(lo: Int, hi: Int, qs: Int, qe: Int, f: (Int, Int, T) => Unit): Unit = {
    if (lo >= hi) return
    val mid = (lo + hi) >>> 1
    // Subtree prune: nothing under [lo,hi) ends at/after the query start.
    if (maxEnds(mid) < qs) return
    search(lo, mid, qs, qe, f)
    // Right subtree (and this node) all have start >= starts(mid).
    if (starts(mid) <= qe) {
      if (ends(mid) >= qs) f(starts(mid), ends(mid), values(mid))
      search(mid + 1, hi, qs, qe, f)
    }
  }

  /** Overlapping values as a Seq (test/driver convenience). */
  def overlappers(qs: Int, qe: Int): Seq[T] = {
    val buf = mutable.ArrayBuffer.empty[T]
    foreachOverlap(qs, qe)((_, _, v) => buf += v)
    buf.toSeq
  }
}

object IntervalForest {

  /** Build from (start, end, value) triples. `maxGap` widens every interval
    * by ±gap before insertion (reference maxGap semantics,
    * `IntervalTreeJoinOptimChromosomeImpl.scala:82-87`). */
  def apply[T: ClassTag](items: IndexedSeq[(Int, Int, T)], maxGap: Int = 0): IntervalForest[T] = {
    val sorted = items.sortBy(_._1)
    val n = sorted.length
    val starts = new Array[Int](n)
    val ends = new Array[Int](n)
    val values = new Array[T](n)
    var i = 0
    while (i < n) {
      val (s, e, v) = sorted(i)
      starts(i) = s - maxGap
      ends(i) = e + maxGap
      values(i) = v
      i += 1
    }
    val maxEnds = new Array[Int](n)
    def fill(lo: Int, hi: Int): Int = {
      if (lo >= hi) Int.MinValue
      else {
        val mid = (lo + hi) >>> 1
        val m = math.max(ends(mid), math.max(fill(lo, mid), fill(mid + 1, hi)))
        maxEnds(mid) = m
        m
      }
    }
    fill(0, n)
    new IntervalForest(starts, ends, maxEnds, values)
  }

  /** Forest keyed by an equality key (e.g. contig): the broadcast value of
    * the chromosome-aware interval join (reference
    * `rangejoins/methods/IntervalTree/IntervalHolderChromosome.scala:6-26`). */
  def forest[K, T: ClassTag](
      items: IterableOnce[(K, Int, Int, T)], maxGap: Int = 0): Map[K, IntervalForest[T]] = {
    val grouped = mutable.HashMap.empty[K, mutable.ArrayBuffer[(Int, Int, T)]]
    items.iterator.foreach { case (k, s, e, v) =>
      grouped.getOrElseUpdate(k, mutable.ArrayBuffer.empty) += ((s, e, v))
    }
    grouped.iterator.map { case (k, buf) => k -> apply(buf.toIndexedSeq, maxGap) }.toMap
  }
}
