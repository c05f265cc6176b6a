package graft.plans

import graft.operators.{IntervalForest, IntervalHolderFactory}

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics

import scala.collection.mutable

sealed trait IntervalJoinMode
case object BroadcastForestMode extends IntervalJoinMode
case object BinRangeMode extends IntervalJoinMode

/** Physical interval join with two scale regimes.
  *
  * '''BroadcastForestMode''' — the build side is projected to
  * `(eqKey, start, end, row)`, assembled into a per-key
  * [[graft.operators.IntervalForest]] and broadcast; the stream side probes
  * it per partition — **no shuffle** of either side. That is the property
  * that makes this beat a shuffle or nested-loop join by ~an order of
  * magnitude at scale (SURVEY §6): the 100 TB side streams through untouched
  * while only the small annotation side moves.
  *
  * '''BinRangeMode''' — when the build side is too large to broadcast, both
  * sides are replicated to the fixed-width genome bins their interval
  * overlaps and cogrouped on `(eqKey, bin)`; each bin builds a local forest
  * from its build intervals and probes its stream intervals. A pair whose
  * intersection spans several bins is emitted only from the first bin of the
  * intersection, so output is exactly-once without any dedup shuffle. Unlike
  * a rowId re-join (the reference's two-phase,
  * `IntervalTreeJoinOptimChromosomeImpl.scala:128-168`, which still collects
  * every build interval to the driver), this never materializes anything on
  * the driver, needs no RDD persist, and is deterministic under task retry —
  * the properties that matter at 1000 executors.
  *
  * Re-expression of the reference's
  * `IntervalTreeJoinOptimChromosome{,Impl}.scala` (see SURVEY §2.3 J1-J7):
  *  - minOverlap: emitted pair needs `min(e1,e2)-max(s1,s2)+1 >= minOverlap`
  *    (`IntervalTreeJoinOptimChromosomeImpl.scala:110-117`). Applied only
  *    when `minOverlap > 1`: for the default the forest emission condition
  *    `be >= qs && bs <= qe` is *exactly* the matched join predicate, and the
  *    overlap-length form would silently drop degenerate (start > end) rows
  *    that stock Spark keeps.
  *  - maxGap: build intervals widened ±gap before insertion (`:82-87`);
  *
  * Unlike the reference (which runs `count()` jobs to pick the build side,
  * `IntervalTreeJoinOptimChromosome.scala:72-88`), the side and mode are
  * chosen at *planning* time from Catalyst statistics — no extra Spark jobs.
  */
case class IntervalForestJoinExec(
    keys: IntervalJoinKeys,
    buildLeft: Boolean,
    mode: IntervalJoinMode,
    minOverlap: Int,
    maxGap: Int,
    binWidth: Int,
    holderClass: String,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  // Broadcast mode probes per-partition over the unshuffled stream side, so
  // the stream partitioning survives. Bin mode's output comes out of a
  // cogroup shuffle on (key, bin) — claiming anything stronger would let
  // EnsureRequirements elide a needed exchange above.
  override def outputPartitioning: Partitioning = mode match {
    case BroadcastForestMode =>
      if (buildLeft) right.outputPartitioning else left.outputPartitioning
    case BinRangeMode => UnknownPartitioning(0)
  }

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "buildRows" -> SQLMetrics.createMetric(sparkContext, "build side rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  private def bound(e: Expression, plan: SparkPlan): Expression =
    BindReferences.bindReference(e, plan.output)

  override protected def doExecute(): RDD[InternalRow] = {
    val (buildPlan, streamPlan) = if (buildLeft) (left, right) else (right, left)
    val (bStart, bEnd, bEqs) =
      if (buildLeft) (keys.leftStart, keys.leftEnd, keys.leftEqs)
      else (keys.rightStart, keys.rightEnd, keys.rightEqs)
    val (sStart, sEnd, sEqs) =
      if (buildLeft) (keys.rightStart, keys.rightEnd, keys.rightEqs)
      else (keys.leftStart, keys.leftEnd, keys.leftEqs)

    // Start/end are projected through UnsafeProjection (codegen'd) rather
    // than interpreted Expression.eval — the probe runs once per stream row.
    val bIvB = Seq(bound(bStart, buildPlan), bound(bEnd, buildPlan))
    val sIvB = Seq(bound(sStart, streamPlan), bound(sEnd, streamPlan))
    val bEqsB = bEqs.map(bound(_, buildPlan))
    val sEqsB = sEqs.map(bound(_, streamPlan))
    val nEqs = bEqs.length
    val buildIsLeft = buildLeft
    val minOv = minOverlap
    val gap = maxGap
    val outAttrs = output
    val numOutputRows = longMetric("numOutputRows")
    val buildRowsMetric = longMetric("buildRows")

    mode match {
      case BroadcastForestMode =>
        // (1) Collect build side as (key, start, end, row).
        val collected = buildPlan.execute().mapPartitions { it =>
          val keyProj = UnsafeProjection.create(bEqsB)
          val ivProj = UnsafeProjection.create(bIvB)
          it.flatMap { row =>
            val iv = ivProj(row)
            if (iv.isNullAt(0) || iv.isNullAt(1)) Iterator.empty
            else {
              val s = iv.getInt(0)
              val e = iv.getInt(1)
              val copy = row.copy()
              val key = keyProj(copy)
              // A null equality key can never satisfy EqualTo.
              if (nEqs > 0 && key.anyNull) Iterator.empty
              else Iterator.single((key.copy(), s, e, copy))
            }
          }
        }.collect()
        buildRowsMetric += collected.length
        // Pluggable holder (reference intervalHolderClassName conf): the
        // broadcast structure is whatever the configured factory builds;
        // the bin-range fallback always uses the array forest (per-bin
        // locals are an execution detail, not a user structure).
        val forests = IntervalHolderFactory.forName(holderClass)
          .build[UnsafeRow, InternalRow](collected, gap)
        val bcast = sparkContext.broadcast(forests)

        // (2) Stream side probes per partition; no shuffle.
        streamPlan.execute().mapPartitions { it =>
          val keyProj = UnsafeProjection.create(sEqsB)
          val ivProj = UnsafeProjection.create(sIvB)
          val joinedRow = new JoinedRow
          val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
          val forestMap = bcast.value
          it.flatMap { srow =>
            val iv = ivProj(srow)
            if (iv.isNullAt(0) || iv.isNullAt(1)) Iterator.empty
            else {
              val key = keyProj(srow)
              if (nEqs > 0 && key.anyNull) Iterator.empty
              else forestMap.get(key) match {
                case None => Iterator.empty
                case Some(forest) =>
                  val qs = iv.getInt(0)
                  val qe = iv.getInt(1)
                  val buf = mutable.ArrayBuffer.empty[InternalRow]
                  forest.foreachOverlap(qs, qe) { (bs, be, brow) =>
                    if (minOv <= 1 || math.min(be, qe) - math.max(bs, qs) + 1 >= minOv)
                      buf += brow
                  }
                  buf.iterator.map { brow =>
                    numOutputRows += 1
                    resultProj(if (buildIsLeft) joinedRow(brow, srow) else joinedRow(srow, brow))
                  }
              }
            }
          }
        }

      case BinRangeMode =>
        val binW = binWidth
        val numParts = conf.numShufflePartitions

        // Replicate each row to every bin its (normalized, gap-widened on the
        // build side) interval overlaps. Key = (eqKey bytes, bin).
        def binned(
            plan: SparkPlan,
            eqExprs: Seq[Expression],
            ivExprs: Seq[Expression],
            widen: Int): RDD[((UnsafeRow, Int), (Int, Int, InternalRow))] =
          plan.execute().mapPartitions { it =>
            val keyProj = UnsafeProjection.create(eqExprs)
            val ivProj = UnsafeProjection.create(ivExprs)
            it.flatMap { row =>
              val iv = ivProj(row)
              if (iv.isNullAt(0) || iv.isNullAt(1)) Iterator.empty
              else {
                val s = iv.getInt(0) - widen
                val e = iv.getInt(1) + widen
                val key = keyProj(row)
                if (nEqs > 0 && key.anyNull) Iterator.empty
                else {
                  val copy = row.copy()
                  val k = key.copy()
                  val lo = Math.floorDiv(math.min(s, e), binW)
                  val hi = Math.floorDiv(math.max(s, e), binW)
                  (lo to hi).iterator.map(b => ((k, b), (s, e, copy)))
                }
              }
            }
          }

        val buildBinned = binned(buildPlan, bEqsB, bIvB, gap)
        val streamBinned = binned(streamPlan, sEqsB, sIvB, 0)

        buildBinned.cogroup(streamBinned, numParts).mapPartitions { groups =>
          val joinedRow = new JoinedRow
          val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
          groups.flatMap { case ((_, bin), (buildRows, streamRows)) =>
            if (buildRows.isEmpty || streamRows.isEmpty) Iterator.empty
            else {
              val items = buildRows.map { case (s, e, r) => (s, e, r) }.toIndexedSeq
              buildRowsMetric += items.length
              // Gap widening already applied at replication time.
              val forest = IntervalForest(items)
              streamRows.iterator.flatMap { case (qs, qe, srow) =>
                val buf = mutable.ArrayBuffer.empty[InternalRow]
                forest.foreachOverlap(qs, qe) { (bs, be, brow) =>
                  // Exactly-once: only the first bin of the pair's
                  // intersection emits it. Both replicas provably cover that
                  // bin whenever the join predicate holds.
                  val firstBin =
                    Math.floorDiv(math.max(math.min(bs, be), math.min(qs, qe)), binW)
                  if (firstBin == bin &&
                      (minOv <= 1 || math.min(be, qe) - math.max(bs, qs) + 1 >= minOv))
                    buf += brow
                }
                buf.iterator.map { brow =>
                  numOutputRows += 1
                  resultProj(if (buildIsLeft) joinedRow(brow, srow) else joinedRow(srow, brow))
                }
              }
            }
          }
        }
    }
  }
}
