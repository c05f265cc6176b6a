package graft.plans

import graft.operators.IntervalForest

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.storage.StorageLevel

import scala.collection.mutable

sealed trait IntervalJoinMode
case object BroadcastForestMode extends IntervalJoinMode
case object TwoPhaseMode extends IntervalJoinMode

/** Physical interval join. The build side is projected to
  * `(eqKey, start, end, row)`, assembled into a per-key
  * [[graft.operators.IntervalForest]] and broadcast; the stream side probes
  * it per partition — **no shuffle** of either side in broadcast mode.
  * That is the property that makes this beat a shuffle or nested-loop join
  * by ~an order of magnitude at scale (SURVEY §6): the 100 TB side streams
  * through untouched while only the small annotation side moves.
  *
  * Re-expression of the reference's
  * `IntervalTreeJoinOptimChromosome{,Impl}.scala` (see SURVEY §2.3 J1-J7):
  *  - minOverlap: emitted pair needs `min(e1,e2)-max(s1,s2)+1 >= minOverlap`
  *    (`IntervalTreeJoinOptimChromosomeImpl.scala:110-117`);
  *  - maxGap: build intervals widened ±gap before insertion (`:82-87`);
  *  - two-phase fallback when the build side is too large to broadcast rows:
  *    broadcast only `(interval → rowId)`, probe, then shuffle-join rowIds
  *    back to rows (`:128-168`).
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
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  // Probing is per-partition over the unshuffled stream side.
  override def outputPartitioning: Partitioning =
    if (buildLeft) right.outputPartitioning else left.outputPartitioning

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

    val bStartB = bound(bStart, buildPlan)
    val bEndB = bound(bEnd, buildPlan)
    val bEqsB = bEqs.map(bound(_, buildPlan))
    val sStartB = bound(sStart, streamPlan)
    val sEndB = bound(sEnd, streamPlan)
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
          it.flatMap { row =>
            val s = bStartB.eval(row)
            val e = bEndB.eval(row)
            if (s == null || e == null) Iterator.empty
            else {
              val copy = row.copy()
              val key = keyProj(copy)
              // A null equality key can never satisfy EqualTo.
              if (nEqs > 0 && key.anyNull) Iterator.empty
              else Iterator.single((key.copy(), s.asInstanceOf[Int], e.asInstanceOf[Int], copy))
            }
          }
        }.collect()
        buildRowsMetric += collected.length
        val forests = IntervalForest.forest[UnsafeRow, InternalRow](collected, gap)
        val bcast = sparkContext.broadcast(forests)

        // (2) Stream side probes per partition; no shuffle.
        streamPlan.execute().mapPartitions { it =>
          val keyProj = UnsafeProjection.create(sEqsB)
          val joinedRow = new JoinedRow
          val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
          val forestMap = bcast.value
          it.flatMap { srow =>
            val sv = sStartB.eval(srow)
            val ev = sEndB.eval(srow)
            if (sv == null || ev == null) Iterator.empty
            else {
              val key = keyProj(srow)
              if (nEqs > 0 && key.anyNull) Iterator.empty
              else forestMap.get(key) match {
                case None => Iterator.empty
                case Some(forest) =>
                  val qs = sv.asInstanceOf[Int]
                  val qe = ev.asInstanceOf[Int]
                  val buf = mutable.ArrayBuffer.empty[InternalRow]
                  forest.foreachOverlap(qs, qe) { (bs, be, brow) =>
                    if (math.min(be, qe) - math.max(bs, qs) + 1 >= minOv) buf += brow
                  }
                  buf.iterator.map { brow =>
                    numOutputRows += 1
                    resultProj(if (buildIsLeft) joinedRow(brow, srow) else joinedRow(srow, brow))
                  }
              }
            }
          }
        }

      case TwoPhaseMode =>
        // Phase 1: index build rows; broadcast only (key, interval → rowId).
        // Persisted so the id assignment seen by the keys-collect and by the
        // final join is the same (zipWithIndex over a recomputed shuffle
        // could renumber).
        val indexed = buildPlan.execute().map(_.copy()).zipWithIndex().map(_.swap)
          .persist(StorageLevel.MEMORY_AND_DISK)
        val keysOnly = indexed.mapPartitions { it =>
          val keyProj = UnsafeProjection.create(bEqsB)
          it.flatMap { case (id, row) =>
            val s = bStartB.eval(row)
            val e = bEndB.eval(row)
            if (s == null || e == null) Iterator.empty
            else {
              val key = keyProj(row)
              if (nEqs > 0 && key.anyNull) Iterator.empty
              else Iterator.single((key.copy(), s.asInstanceOf[Int], e.asInstanceOf[Int], id))
            }
          }
        }.collect()
        buildRowsMetric += keysOnly.length
        val forests = IntervalForest.forest[UnsafeRow, Long](keysOnly, gap)
        val bcast = sparkContext.broadcast(forests)

        // Phase 2: probe → (rowId, streamRow) pairs.
        val probed: RDD[(Long, InternalRow)] = streamPlan.execute().mapPartitions { it =>
          val keyProj = UnsafeProjection.create(sEqsB)
          val forestMap = bcast.value
          it.flatMap { srow =>
            val sv = sStartB.eval(srow)
            val ev = sEndB.eval(srow)
            if (sv == null || ev == null) Iterator.empty
            else {
              val key = keyProj(srow)
              if (nEqs > 0 && key.anyNull) Iterator.empty
              else forestMap.get(key) match {
                case None => Iterator.empty
                case Some(forest) =>
                  val qs = sv.asInstanceOf[Int]
                  val qe = ev.asInstanceOf[Int]
                  val ids = mutable.ArrayBuffer.empty[Long]
                  forest.foreachOverlap(qs, qe) { (bs, be, id) =>
                    if (math.min(be, qe) - math.max(bs, qs) + 1 >= minOv) ids += id
                  }
                  if (ids.isEmpty) Iterator.empty
                  else {
                    val copy = srow.copy()
                    ids.iterator.map(id => (id, copy))
                  }
              }
            }
          }
        }

        // Phase 3: shuffle equi-join on rowId to rebuild full rows.
        indexed.join(probed).mapPartitions { it =>
          val joinedRow = new JoinedRow
          val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
          it.map { case (_, (brow, srow)) =>
            numOutputRows += 1
            resultProj(if (buildIsLeft) joinedRow(brow, srow) else joinedRow(srow, brow))
          }
        }
    }
  }
}
