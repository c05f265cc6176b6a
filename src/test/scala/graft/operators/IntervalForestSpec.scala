package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Unit tests of the broadcast forest structure against a brute-force
  * scan (SURVEY §5 pattern 4). */
class IntervalForestSpec extends AnyFunSuite {

  private def brute(items: Seq[(Int, Int, Int)], qs: Int, qe: Int): Set[Int] =
    items.collect { case (s, e, v) if e >= qs && s <= qe => v }.toSet

  test("random forests agree with brute force on end-inclusive overlap") {
    val rnd = new Random(42)
    for (trial <- 1 to 20) {
      val n = 1 + rnd.nextInt(200)
      val items = IndexedSeq.fill(n) {
        val s = rnd.nextInt(1000) + 1
        (s, s + rnd.nextInt(50), rnd.nextInt(1000000))
      }
      val forest = IntervalForest(items)
      for (_ <- 1 to 50) {
        val qs = rnd.nextInt(1100)
        val qe = qs + rnd.nextInt(80)
        assert(forest.overlappers(qs, qe).toSet === brute(items, qs, qe),
          s"trial $trial query [$qs,$qe]")
      }
    }
  }

  test("end-inclusive touching intervals overlap; disjoint do not") {
    val f = IntervalForest(IndexedSeq((10, 20, 1)))
    assert(f.overlappers(20, 25) === Seq(1))
    assert(f.overlappers(21, 25).isEmpty)
    assert(f.overlappers(5, 10) === Seq(1))
    assert(f.overlappers(5, 9).isEmpty)
    // point query inside
    assert(f.overlappers(15, 15) === Seq(1))
  }

  test("maxGap widens stored intervals symmetrically") {
    // [100,110] widened by 5 is stored as [95,115].
    val f = IntervalForest(IndexedSeq((100, 110, 7)), maxGap = 5)
    assert(f.overlappers(93, 95) === Seq(7)) // touches widened start
    assert(f.overlappers(90, 94).isEmpty)
    assert(f.overlappers(115, 120) === Seq(7)) // touches widened end
    assert(f.overlappers(116, 130).isEmpty)
  }

  test("empty forest answers nothing") {
    val f = IntervalForest(IndexedSeq.empty[(Int, Int, Int)])
    assert(f.overlappers(1, 100).isEmpty)
    assert(f.nearestDistance(1, 100) === -1)
    assert(f.foreachNearest(1, 100)((_, _, _) => fail("no calls expected")) === -1)
  }

  private def bruteNearest(items: Seq[(Int, Int, Int)], qs: Int, qe: Int): (Int, Set[Int]) = {
    val ds = items.map { case (s, e, v) =>
      (math.max(0, math.max(s - qe, qs - e)), v)
    }
    val d = ds.map(_._1).min
    (d, ds.collect { case (`d`, v) => v }.toSet)
  }

  test("nearestDistance/foreachNearest agree with brute force") {
    val rnd = new Random(7)
    for (trial <- 1 to 20) {
      val n = 1 + rnd.nextInt(200)
      val items = IndexedSeq.fill(n) {
        val s = rnd.nextInt(1000) + 1
        (s, s + rnd.nextInt(50), rnd.nextInt(1000000))
      }
      val forest = IntervalForest(items)
      for (_ <- 1 to 100) {
        val qs = rnd.nextInt(1400) - 150 // ranges beyond both flanks
        val qe = qs + rnd.nextInt(80)
        val (bd, bset) = bruteNearest(items, qs, qe)
        assert(forest.nearestDistance(qs, qe) === bd, s"trial $trial dist [$qs,$qe]")
        val got = scala.collection.mutable.Set.empty[Int]
        val d = forest.foreachNearest(qs, qe)((_, _, v) => got += v)
        assert(d === bd, s"trial $trial foreach-dist [$qs,$qe]")
        assert(got.toSet === bset, s"trial $trial tie set [$qs,$qe]")
      }
    }
  }

  test("nearest ties on both flanks of a gap all emit") {
    // [10,20] and [30,40] are both 4 away from [24,26].
    val f = IntervalForest(IndexedSeq((10, 20, 1), (30, 40, 2)))
    val got = scala.collection.mutable.Set.empty[Int]
    assert(f.foreachNearest(24, 26)((_, _, v) => got += v) === 4)
    assert(got.toSet === Set(1, 2))
    // Overlap beats any gap.
    got.clear()
    assert(f.foreachNearest(20, 29)((_, _, v) => got += v) === 0)
    assert(got.toSet === Set(1))
  }
}
