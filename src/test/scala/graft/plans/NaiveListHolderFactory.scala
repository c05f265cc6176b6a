package graft.plans

import graft.operators.{IntervalHolder, IntervalHolderFactory}

import java.util.concurrent.atomic.AtomicInteger
import scala.reflect.ClassTag

/** Test fixture: a deliberately naive linear-scan holder, proving the
  * `spark.graft.rangejoin.intervalHolderClass` SPI (the reference's
  * CustomIntervalHolderTestSuite analogue). Top-level class — the factory
  * is instantiated by name with a no-arg constructor. */
class NaiveListHolderFactory extends IntervalHolderFactory {
  override def build[K, T: ClassTag](
      items: IterableOnce[(K, Int, Int, T)], maxGap: Int): Map[K, IntervalHolder[T]] = {
    NaiveListHolderFactory.built.incrementAndGet()
    items.iterator.toSeq.groupBy(_._1).map { case (k, group) =>
      k -> (new IntervalHolder[T] {
        private val stored = group.map { case (_, s, e, v) => (s - maxGap, e + maxGap, v) }
        override def foreachOverlap(qs: Int, qe: Int)(f: (Int, Int, T) => Unit): Unit =
          stored.foreach { case (s, e, v) => if (e >= qs && s <= qe) f(s, e, v) }
      }: IntervalHolder[T])
    }
  }
}

object NaiveListHolderFactory {
  val built = new AtomicInteger(0)
}
