package graft.plans

import graft.operators.{IntervalForest, IntervalForestFactory, IntervalHolder, IntervalHolderFactory}

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, GenerateUnsafeProjection}
import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, JoinType, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan}
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
    joinType: JoinType,
    residual: Option[Expression],
    left: SparkPlan,
    right: SparkPlan,
    // True only when the broadcast decision came from Catalyst STATS
    // (auto method, no user hint): the runtime build-budget guard then
    // protects against a stats lie. A broadcast hint or an explicit
    // method=broadcast conf is the user taking responsibility — standard
    // Spark hint semantics — so the guard stands down.
    enforceBuildBudget: Boolean = true) extends BinaryExecNode with CodegenSupport {

  // Non-inner joins (beyond the reference): for one-sided types the
  // preserved side is always the stream side (strategy guarantees
  // buildLeft=false for Left*, buildLeft=true for RightOuter), so unmatched
  // stream rows can be emitted locally — no global matched-set tracking,
  // the same restriction Spark's own BroadcastHashJoinExec imposes.
  // FullOuter additionally tracks matched build rows globally: a bitset
  // side-job in broadcast mode, build-row-id verdicts in bin-range mode —
  // single-pass over each child, unlike the LeftOuter ∪ RightAnti
  // decomposition it replaced (which scanned both sides twice).
  override def output: Seq[Attribute] = joinType match {
    case Inner => left.output ++ right.output
    case LeftOuter => left.output ++ right.output.map(_.withNullability(true))
    case RightOuter => left.output.map(_.withNullability(true)) ++ right.output
    case FullOuter =>
      left.output.map(_.withNullability(true)) ++ right.output.map(_.withNullability(true))
    case LeftSemi | LeftAnti => left.output
    case x => throw new IllegalArgumentException(s"IntervalForestJoinExec: unsupported join type $x")
  }

  @transient private lazy val buildPlan = if (buildLeft) left else right
  @transient private lazy val streamedPlan = if (buildLeft) right else left

  // Key expressions of each role, bound to their side's output.
  @transient private lazy val (bStartB, bEndB, bEqsB) = {
    val (s, e, eqs) =
      if (buildLeft) (keys.leftStart, keys.leftEnd, keys.leftEqs)
      else (keys.rightStart, keys.rightEnd, keys.rightEqs)
    (bound(s, buildPlan), bound(e, buildPlan), eqs.map(bound(_, buildPlan)))
  }
  @transient private lazy val (sStartB, sEndB, sEqsB) = {
    val (s, e, eqs) =
      if (buildLeft) (keys.rightStart, keys.rightEnd, keys.rightEqs)
      else (keys.leftStart, keys.leftEnd, keys.leftEqs)
    (bound(s, streamedPlan), bound(e, streamedPlan), eqs.map(bound(_, streamedPlan)))
  }

  /** Runtime stats-lie guard (only for stats-made decisions, see
    * enforceBuildBudget): the strategy picked broadcast from Catalyst
    * ESTIMATES, which can under-shoot by orders of magnitude after
    * selective filters. Broadcasting a multi-GB forest to a 1000-executor
    * cluster is a cluster-killer, so fail fast — with actionable advice —
    * when the ACTUAL collected bytes blow past `buildBytesSlack`x the
    * budget (default 4x, so estimate noise never flips a working query;
    * Spark's own driver.maxResultSize still backstops the collect).
    * Shared by EVERY broadcast-mode collect — the common forest build and
    * full outer's own collect (which keeps null-key rows, hence the
    * nullable key). */
  private def checkBuildBudget(collected: Iterator[(UnsafeRow, InternalRow)]): Unit = {
    if (!enforceBuildBudget) return
    val actualBytes = collected.foldLeft(0L) { case (acc, (k, r)) =>
      acc + (if (k == null) 0L else k.getSizeInBytes.toLong) + 16L + (r match {
        case u: UnsafeRow => u.getSizeInBytes.toLong
        case _ => 64L
      })
    }
    val budget = conf.getConfString(
      "spark.graft.rangejoin.maxBroadcastBytes", (256L << 20).toString).toLong
    val slack = conf.getConfString("spark.graft.rangejoin.buildBytesSlack", "4.0").toDouble
    if (actualBytes > budget * slack) {
      throw new IllegalStateException(
        s"interval-join build side is $actualBytes bytes at runtime, over ${slack}x the " +
          s"spark.graft.rangejoin.maxBroadcastBytes budget ($budget) the broadcast " +
          "decision was made against (plan statistics under-estimated it). Either " +
          "raise the budget if the cluster can hold the broadcast, force the side " +
          "with a broadcast() hint to take responsibility, or set " +
          "spark.graft.rangejoin.method=binrange to take the shuffle path.")
    }
  }

  /** Build-side collect → per-key holder → broadcast, shared by the
    * interpreted and codegen probe paths (built at most once per execute). */
  @transient private lazy val broadcastForests
      : Broadcast[Map[UnsafeRow, IntervalHolder[InternalRow]]] = {
    val nEqs = bEqsB.length
    val bEqsLocal = bEqsB
    val bIvLocal = Seq(bStartB, bEndB)
    val collected = buildPlan.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(bEqsLocal)
      val ivProj = UnsafeProjection.create(bIvLocal)
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
    longMetric("buildRows") += collected.length
    checkBuildBudget(collected.iterator.map { case (k, _, _, r) => (k, r) })
    // Pluggable holder (reference intervalHolderClassName conf): the
    // broadcast structure is whatever the configured factory builds;
    // the bin-range fallback always uses the array forest (per-bin
    // locals are an execution detail, not a user structure).
    val forests = IntervalHolderFactory.forName(holderClass)
      .build[UnsafeRow, InternalRow](collected, maxGap)
    sparkContext.broadcast(forests)
  }

  // Broadcast mode probes per-partition over the unshuffled stream side, so
  // the stream partitioning survives — except full outer, whose output is
  // a union with the driver-parallelized unmatched-build rows. Bin mode's
  // output comes out of a cogroup shuffle on (key, bin) — claiming anything
  // stronger would let EnsureRequirements elide a needed exchange above.
  override def outputPartitioning: Partitioning = mode match {
    case BroadcastForestMode if joinType != FullOuter =>
      if (buildLeft) right.outputPartitioning else left.outputPartitioning
    case _ => UnknownPartitioning(0)
  }

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "buildRows" -> SQLMetrics.createMetric(sparkContext, "build side rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  private def bound(e: Expression, plan: SparkPlan): Expression =
    BindReferences.bindReference(e, plan.output)

  /** Replicate each row to every bin its (normalized, gap-widened on the
    * build side) interval overlaps. Key = (eqKey bytes, bin). Null
    * interval/key rows are dropped — callers that must preserve them
    * (outer/anti stream sides) route them separately. */
  private def binnedRdd(
      plan: SparkPlan,
      eqExprs: Seq[Expression],
      ivExprs: Seq[Expression],
      widen: Int,
      nEqs: Int,
      binW: Int): RDD[((UnsafeRow, Int), (Int, Int, InternalRow))] =
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

  override protected def doExecute(): RDD[InternalRow] = {
    val (buildPlan, streamPlan) = (this.buildPlan, this.streamedPlan)
    val (bStart, bEnd, bEqs) =
      if (buildLeft) (keys.leftStart, keys.leftEnd, keys.leftEqs)
      else (keys.rightStart, keys.rightEnd, keys.rightEqs)
    val (sStart, sEnd, sEqs) =
      if (buildLeft) (keys.rightStart, keys.rightEnd, keys.rightEqs)
      else (keys.leftStart, keys.leftEnd, keys.leftEqs)

    // Start/end are projected through UnsafeProjection (codegen'd) rather
    // than interpreted Expression.eval — the probe runs once per stream row.
    val bIvB = Seq(bound(bStart, buildPlan), bound(bEnd, buildPlan))
    val sIvB = Seq(sStartB, sEndB)
    val bEqsBL = bEqsB
    val sEqsBL = sEqsB
    val nEqs = bEqs.length
    val buildIsLeft = buildLeft
    val minOv = minOverlap
    val gap = maxGap
    val outAttrs = output
    val numOutputRows = longMetric("numOutputRows")
    val buildRowsMetric = longMetric("buildRows")

    val jt = joinType
    val residLocal = residual
    // Candidate pair rows are always assembled in (left, right) order.
    val pairAttrs = left.output ++ right.output
    val nBuildCols = buildPlan.output.length

    mode match {
      case BroadcastForestMode if jt == Inner =>
        // (1) Build side collected, assembled into per-key holders and
        //     broadcast (shared lazy val — also used by the codegen path).
        val bcast = broadcastForests

        // (2) Stream side probes per partition; no shuffle.
        streamPlan.execute().mapPartitions { it =>
          val keyProj = UnsafeProjection.create(sEqsBL)
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

      case BroadcastForestMode if jt == FullOuter =>
        // Full outer, single-plan (replaces the r4 LeftOuter ∪ null-padded
        // RightAnti decomposition that scanned both children twice and
        // built the forest twice). Shape mirrors Spark's own
        // BroadcastNestedLoopJoinExec full-outer:
        //   (1) build side collected ONCE — rows with a null interval/key
        //       are kept (they can never match but must be preserved) and
        //       excluded from the forest; forest payloads carry the
        //       build-row index,
        //   (2) a probe-only side-job over the stream side computes the
        //       global matched-build bitset (no output materialization —
        //       far cheaper than the RightAnti join it replaces),
        //   (3) the main pass emits matched pairs + null-padded unmatched
        //       stream rows (LeftOuter shape),
        //   (4) unmatched build rows null-pad from the driver — the build
        //       side is broadcast-small by mode selection.
        val collected: Array[(UnsafeRow, Int, Int, InternalRow)] =
          buildPlan.execute().mapPartitions { it =>
            val keyProj = UnsafeProjection.create(bEqsBL)
            val ivProj = UnsafeProjection.create(bIvB)
            it.map { row =>
              val iv = ivProj(row)
              val copy = row.copy()
              if (iv.isNullAt(0) || iv.isNullAt(1)) (null, 0, 0, copy)
              else {
                val key = keyProj(copy)
                if (nEqs > 0 && key.anyNull) (null, 0, 0, copy)
                else (key.copy(), iv.getInt(0), iv.getInt(1), copy)
              }
            }
          }.collect()
        buildRowsMetric += collected.length
        checkBuildBudget(collected.iterator.map { case (k, _, _, r) => (k, r) })
        val forests: Map[UnsafeRow, graft.operators.IntervalForest[(InternalRow, Int)]] =
          graft.operators.IntervalForest.forest(
            collected.iterator.zipWithIndex.collect {
              case ((k, s, e, r), i) if k != null => (k, s, e, (r, i))
            }, gap)
        val bcast = sparkContext.broadcast(forests)
        val nBuild = collected.length
        val nStreamCols = streamedPlan.output.length
        val pairSchema = pairAttrs

        val matchedBits = streamPlan.execute().mapPartitionsWithIndex { (pidx, it) =>
          val keyProj = UnsafeProjection.create(sEqsBL)
          val ivProj = UnsafeProjection.create(sIvB)
          val joinedRow = new JoinedRow
          val pred = residLocal.map(Predicate.create(_, pairSchema))
          pred.foreach(_.initialize(pidx))
          def pair(brow: InternalRow, srow: InternalRow): InternalRow =
            if (buildIsLeft) joinedRow(brow, srow) else joinedRow(srow, brow)
          val bits = new java.util.BitSet(nBuild)
          val forestMap = bcast.value
          it.foreach { srow =>
            val iv = ivProj(srow)
            if (!iv.isNullAt(0) && !iv.isNullAt(1)) {
              val key = keyProj(srow)
              if (!(nEqs > 0 && key.anyNull)) forestMap.get(key).foreach { forest =>
                val qs = iv.getInt(0)
                val qe = iv.getInt(1)
                forest.foreachOverlap(qs, qe) { (bs, be, v) =>
                  if ((minOv <= 1 || math.min(be, qe) - math.max(bs, qs) + 1 >= minOv) &&
                      pred.forall(_.eval(pair(v._1, srow))))
                    bits.set(v._2)
                }
              }
            }
          }
          Iterator.single(bits)
        }.fold(new java.util.BitSet(nBuild)) { (a, b) => a.or(b); a }

        val mainOut: RDD[InternalRow] = streamPlan.execute().mapPartitionsWithIndex[InternalRow] { (pidx, it) =>
          val keyProj = UnsafeProjection.create(sEqsBL)
          val ivProj = UnsafeProjection.create(sIvB)
          val joinedRow = new JoinedRow
          val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
          val pred = residLocal.map(Predicate.create(_, pairSchema))
          pred.foreach(_.initialize(pidx))
          val forestMap = bcast.value
          val nullBuild = new GenericInternalRow(nBuildCols)
          def pair(brow: InternalRow, srow: InternalRow): InternalRow =
            if (buildIsLeft) joinedRow(brow, srow) else joinedRow(srow, brow)
          it.flatMap { srow =>
            val iv = ivProj(srow)
            val matches = mutable.ArrayBuffer.empty[InternalRow]
            if (!iv.isNullAt(0) && !iv.isNullAt(1)) {
              val key = keyProj(srow)
              if (!(nEqs > 0 && key.anyNull)) forestMap.get(key).foreach { forest =>
                val qs = iv.getInt(0)
                val qe = iv.getInt(1)
                forest.foreachOverlap(qs, qe) { (bs, be, v) =>
                  if ((minOv <= 1 || math.min(be, qe) - math.max(bs, qs) + 1 >= minOv) &&
                      pred.forall(_.eval(pair(v._1, srow))))
                    matches += v._1
                }
              }
            }
            if (matches.isEmpty) {
              numOutputRows += 1
              Iterator.single(resultProj(pair(nullBuild, srow)))
            } else matches.iterator.map { brow =>
              numOutputRows += 1
              resultProj(pair(brow, srow))
            }
          }
        }

        val unmatchedBuild: IndexedSeq[InternalRow] =
          collected.indices.collect { case i if !matchedBits.get(i) => collected(i)._4 }
        val padded = sparkContext
          .parallelize(unmatchedBuild, math.max(1, math.min(
            conf.numShufflePartitions, 1 + unmatchedBuild.length / 65536)))
          .mapPartitions[InternalRow] { it =>
            val joinedRow = new JoinedRow
            val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
            val nullStream = new GenericInternalRow(nStreamCols)
            def pair(brow: InternalRow, srow: InternalRow): InternalRow =
              if (buildIsLeft) joinedRow(brow, srow) else joinedRow(srow, brow)
            it.map { brow =>
              numOutputRows += 1
              resultProj(pair(brow, nullStream))
            }
          }
        mainOut.union(padded)

      case BroadcastForestMode =>
        // Outer/semi/anti probe: same broadcast forest, but a stream row
        // with no (residual-surviving) match is preserved (outer: build
        // side null-padded; anti: emitted bare) or used as the existence
        // test (semi). Residuals must be decided per candidate pair HERE —
        // a post-join filter would wrongly drop preserved rows.
        val bcast = broadcastForests
        val pairSchema = pairAttrs
        streamPlan.execute().mapPartitionsWithIndex { (pidx, it) =>
          val keyProj = UnsafeProjection.create(sEqsBL)
          val ivProj = UnsafeProjection.create(sIvB)
          val joinedRow = new JoinedRow
          val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
          val pred = residLocal.map(Predicate.create(_, pairSchema))
          pred.foreach(_.initialize(pidx))
          val forestMap = bcast.value
          val nullBuild = new GenericInternalRow(nBuildCols)
          def pair(brow: InternalRow, srow: InternalRow): InternalRow =
            if (buildIsLeft) joinedRow(brow, srow) else joinedRow(srow, brow)
          it.flatMap { srow =>
            val iv = ivProj(srow)
            val nullSide = iv.isNullAt(0) || iv.isNullAt(1)
            val matches = mutable.ArrayBuffer.empty[InternalRow]
            if (!nullSide) {
              val key = keyProj(srow)
              if (!(nEqs > 0 && key.anyNull)) forestMap.get(key).foreach { forest =>
                val qs = iv.getInt(0)
                val qe = iv.getInt(1)
                forest.foreachOverlap(qs, qe) { (bs, be, brow) =>
                  if ((minOv <= 1 || math.min(be, qe) - math.max(bs, qs) + 1 >= minOv) &&
                      pred.forall(_.eval(pair(brow, srow))))
                    matches += brow
                }
              }
            }
            jt match {
              case LeftSemi =>
                if (matches.nonEmpty) { numOutputRows += 1; Iterator.single(resultProj(srow)) }
                else Iterator.empty
              case LeftAnti =>
                if (matches.isEmpty) { numOutputRows += 1; Iterator.single(resultProj(srow)) }
                else Iterator.empty
              case _ => // LeftOuter / RightOuter (stream = preserved side)
                if (matches.isEmpty) {
                  numOutputRows += 1
                  Iterator.single(resultProj(pair(nullBuild, srow)))
                } else matches.iterator.map { brow =>
                  numOutputRows += 1
                  resultProj(pair(brow, srow))
                }
            }
          }
        }

      case BinRangeMode if jt == Inner =>
        val binW = binWidth
        val numParts = conf.numShufflePartitions

        val buildBinned = binnedRdd(buildPlan, bEqsB, bIvB, gap, nEqs, binW)
        val streamBinned = binnedRdd(streamPlan, sEqsB, sIvB, 0, nEqs, binW)

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

      case BinRangeMode =>
        // Outer/semi/anti/full at shuffle scale. Matched-ness of a row is
        // a GLOBAL property (its replicas see different bins), so both
        // sides get unique ids (zipWithUniqueId — no extra job, unlike
        // zipWithIndex) and per-bin verdicts aggregate by id. Matched
        // PAIRS never ride the verdict shuffle: they are emitted directly
        // from the cogroup (exactly-once by first-intersection-bin, as in
        // inner mode), so no reduce record ever concatenates a stream
        // row's full match list — a whole-chromosome stream interval
        // overlapping millions of build rows streams its pairs instead of
        // materializing them in one Seq (r4 ADVICE). The verdict shuffle
        // carries only (id, row, matched) — bounded per record.
        //   semi — only matched replicas enter the id shuffle (volume =
        //          matched rows, deduped by reduceByKey),
        //   anti — every replica reports (id, matched); OR-reduce, keep
        //          the never-matched,
        //   outer — unmatched stream ids null-pad; pairs come from the
        //          direct pass (the cogroup's shuffle files are reused —
        //          only the reduce side runs twice),
        //   full — build replicas also report (bid, matched); unmatched
        //          build ids null-pad on the stream side.
        // Rows with a null interval/key never enter a real bin but are
        // still preserved for outer/anti/full: they ship to a sentinel bin
        // (no forest is built there) and aggregate as unmatched.
        val binW = binWidth
        val numParts = conf.numShufflePartitions
        val pairSchema = pairAttrs
        val sentinelBin = Int.MinValue
        val fullOuter = jt == FullOuter
        val nStreamCols = streamedPlan.output.length

        // Build side with unique ids (consumed only by full-outer verdicts
        // but carried uniformly — one Long per replica, no extra job).
        // Null-interval/key build rows are preserved only for full outer.
        val buildBinned: RDD[((UnsafeRow, Int), (Long, Int, Int, InternalRow))] =
          buildPlan.execute().zipWithUniqueId().mapPartitions { it =>
            val keyProj = UnsafeProjection.create(bEqsBL)
            val ivProj = UnsafeProjection.create(bIvB)
            it.flatMap { case (row, id) =>
              val iv = ivProj(row)
              if (iv.isNullAt(0) || iv.isNullAt(1)) {
                if (fullOuter) {
                  val copy = row.copy()
                  Iterator.single(((keyProj(copy).copy(), sentinelBin), (id, 0, 0, copy)))
                } else Iterator.empty
              } else {
                val s = iv.getInt(0) - gap
                val e = iv.getInt(1) + gap
                val key = keyProj(row)
                if (nEqs > 0 && key.anyNull) {
                  if (fullOuter) {
                    val copy = row.copy()
                    Iterator.single(((key.copy(), sentinelBin), (id, 0, 0, copy)))
                  } else Iterator.empty
                } else {
                  val copy = row.copy()
                  val k = key.copy()
                  val lo = Math.floorDiv(math.min(s, e), binW)
                  val hi = Math.floorDiv(math.max(s, e), binW)
                  (lo to hi).iterator.map(b => ((k, b), (id, s, e, copy)))
                }
              }
            }
          }

        val streamBinned: RDD[((UnsafeRow, Int), (Long, Int, Int, InternalRow))] =
          streamPlan.execute().zipWithUniqueId().mapPartitions { it =>
            val keyProj = UnsafeProjection.create(sEqsBL)
            val ivProj = UnsafeProjection.create(sIvB)
            it.flatMap { case (row, id) =>
              val iv = ivProj(row)
              val copy = row.copy()
              if (iv.isNullAt(0) || iv.isNullAt(1))
                Iterator.single(((keyProj(copy).copy(), sentinelBin), (id, 0, 0, copy)))
              else {
                val s = iv.getInt(0)
                val e = iv.getInt(1)
                val key = keyProj(copy)
                if (nEqs > 0 && key.anyNull)
                  Iterator.single(((key.copy(), sentinelBin), (id, 0, 0, copy)))
                else {
                  val k = key.copy()
                  val lo = Math.floorDiv(math.min(s, e), binW)
                  val hi = Math.floorDiv(math.max(s, e), binW)
                  (lo to hi).iterator.map(b => ((k, b), (id, s, e, copy)))
                }
              }
            }
          }

        // ONE shuffle: both per-bin passes below are children of the same
        // cogrouped RDD, so the map stages run once and only the (cheap)
        // reduce side re-runs for the second pass.
        val cg = buildBinned.cogroup(streamBinned, numParts)

        // Pass 1 (outer/full only): matched pairs, streamed out directly.
        lazy val pairRows: RDD[InternalRow] = cg.mapPartitionsWithIndex { (pidx, groups) =>
          val joinedRow = new JoinedRow
          val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
          val pred = residLocal.map(Predicate.create(_, pairSchema))
          pred.foreach(_.initialize(pidx))
          def pair(brow: InternalRow, srow: InternalRow): InternalRow =
            if (buildIsLeft) joinedRow(brow, srow) else joinedRow(srow, brow)
          groups.flatMap { case ((_, bin), (buildRows, streamRows)) =>
            if (bin == sentinelBin || buildRows.isEmpty || streamRows.isEmpty) Iterator.empty
            else {
              val items = buildRows.map { case (_, s, e, r) => (s, e, r) }.toIndexedSeq
              val forest = IntervalForest(items)
              streamRows.iterator.flatMap { case (_, qs, qe, srow) =>
                val buf = mutable.ArrayBuffer.empty[InternalRow]
                forest.foreachOverlap(qs, qe) { (bs, be, brow) =>
                  if ((minOv <= 1 || math.min(be, qe) - math.max(bs, qs) + 1 >= minOv) &&
                      Math.floorDiv(math.max(math.min(bs, be), math.min(qs, qe)), binW) == bin &&
                      pred.forall(_.eval(pair(brow, srow))))
                    buf += brow
                }
                buf.iterator.map { brow =>
                  numOutputRows += 1
                  resultProj(pair(brow, srow))
                }
              }
            }
          }
        }

        // Pass 2: per-replica verdicts — (id·2 | side, (row, matchedHere)).
        // Stream ids are even, build ids odd; the reduce OR-merges flags.
        val verdicts: RDD[(Long, (InternalRow, Boolean))] =
          cg.mapPartitionsWithIndex { (pidx, groups) =>
            val joinedRow = new JoinedRow
            val pred = residLocal.map(Predicate.create(_, pairSchema))
            pred.foreach(_.initialize(pidx))
            def pair(brow: InternalRow, srow: InternalRow): InternalRow =
              if (buildIsLeft) joinedRow(brow, srow) else joinedRow(srow, brow)
            groups.flatMap { case ((_, bin), (buildRows, streamRows)) =>
              val out = mutable.ArrayBuffer.empty[(Long, (InternalRow, Boolean))]
              buildRowsMetric += buildRows.size
              val forest =
                if (bin == sentinelBin || buildRows.isEmpty) null
                else IntervalForest(buildRows.map { case (bid, s, e, r) => (s, e, (bid, r)) }.toIndexedSeq)
              val matchedBids = if (fullOuter) mutable.HashSet.empty[Long] else null
              streamRows.foreach { case (id, qs, qe, srow) =>
                var matchedHere = false
                if (forest != null) {
                  forest.foreachOverlap(qs, qe) { (bs, be, v) =>
                    if ((minOv <= 1 || math.min(be, qe) - math.max(bs, qs) + 1 >= minOv) &&
                        pred.forall(_.eval(pair(v._2, srow)))) {
                      matchedHere = true
                      if (fullOuter) matchedBids += v._1
                    }
                  }
                }
                if (!(jt == LeftSemi && !matchedHere))
                  out += ((id << 1, (srow, matchedHere)))
              }
              if (fullOuter) buildRows.iterator.foreach { case (bid, _, _, brow) =>
                out += (((bid << 1) | 1L, (brow, matchedBids.contains(bid))))
              }
              out.iterator
            }
          }

        val preserved: RDD[InternalRow] = verdicts
          .reduceByKey((a, b) => (a._1, a._2 || b._2), numParts)
          .mapPartitions[InternalRow] { it =>
            val joinedRow = new JoinedRow
            val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
            val nullBuild = new GenericInternalRow(nBuildCols)
            val nullStream = new GenericInternalRow(nStreamCols)
            def pair(brow: InternalRow, srow: InternalRow): InternalRow =
              if (buildIsLeft) joinedRow(brow, srow) else joinedRow(srow, brow)
            it.flatMap { case (key, (row, matched)) =>
              jt match {
                case LeftSemi =>
                  numOutputRows += 1; Iterator.single(resultProj(row))
                case LeftAnti =>
                  if (matched) Iterator.empty
                  else { numOutputRows += 1; Iterator.single(resultProj(row)) }
                case FullOuter =>
                  if (matched) Iterator.empty
                  else {
                    numOutputRows += 1
                    val padded =
                      if ((key & 1L) == 1L) pair(row, nullStream) else pair(nullBuild, row)
                    Iterator.single(resultProj(padded))
                  }
                case _ => // LeftOuter / RightOuter
                  if (matched) Iterator.empty
                  else { numOutputRows += 1; Iterator.single(resultProj(pair(nullBuild, row))) }
              }
            }
          }

        jt match {
          case LeftSemi | LeftAnti => preserved
          case _ => pairRows.union(preserved)
        }
    }
  }

  // ---------------------------------------------------------------- codegen
  //
  // Whole-stage codegen for the broadcast probe (the hot path: runs once per
  // row of the 100 TB stream side). The stream child produces; this node
  // consumes each row inline — key + interval exprs evaluated as generated
  // expressions, an [[graft.operators.IntervalForestCursor]] drives the
  // forest traversal as a flat `while` loop, and matched build rows flow
  // straight into the parent's generated consume. Compared with the
  // interpreted path this removes the iterator boundary between the scan
  // and the join, the per-row UnsafeProjections, and the per-probe match
  // buffer, and lets a downstream aggregate fuse into the same stage.
  // Bin-range mode and custom interval holders keep the interpreted path
  // (a holder only promises a callback API; the cursor needs the array
  // forest).
  //
  // LeftSemi/LeftAnti/LeftOuter/RightOuter codegen too (r10 VERDICT #2):
  // the stream-side probe is the 100 TB hot loop for existence filters and
  // preserved-side joins just as for Inner. Semi emits on the FIRST
  // cursor hit (no full match enumeration); anti emits when the cursor is
  // empty, including the null-interval/null-key/absent-contig rows the
  // interpreted path preserves; one-sided outer streams the preserved
  // side and pads a null build row for match-less stream rows (Spark's
  // own BroadcastHashJoin outer-codegen loop shape — build columns read
  // through a `matched == null` guard). Residual-carrying non-inner joins
  // stay interpreted: the residual decides matched-ness per candidate
  // pair inside the loop. FullOuter keeps the interpreted path (its
  // unmatched-build pad is a separate driver phase, not a probe shape).

  override def supportCodegen: Boolean =
    (joinType == Inner ||
      ((joinType == LeftSemi || joinType == LeftAnti ||
        joinType == LeftOuter || joinType == RightOuter) && residual.isEmpty)) &&
      mode == BroadcastForestMode &&
      holderClass == classOf[IntervalForestFactory].getName

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    streamedPlan.asInstanceOf[CodegenSupport].inputRDDs()

  override protected def doProduce(ctx: CodegenContext): String =
    streamedPlan.asInstanceOf[CodegenSupport].produce(ctx, this)

  // Every probe can emit many rows referencing the same buffers.
  override def needCopyResult: Boolean = true

  override def doConsume(ctx: CodegenContext, input: Seq[ExprCode], row: ExprCode): String = {
    // Evaluate all stream-side columns up front: they are referenced both
    // by the key expressions and (possibly) inside the match loop, and a
    // deferred evaluation inside a conditional scope would be unreachable
    // from the loop body.
    val evalInput = evaluateVariables(input)
    ctx.currentVars = input
    val sStartEv = sStartB.genCode(ctx)
    val sEndEv = sEndB.genCode(ctx)
    val keyEv = GenerateUnsafeProjection.createCode(ctx, sEqsB)
    val keyNull = if (sEqsB.nonEmpty) s"${keyEv.value}.anyNull()" else "false"

    val bcastTerm = ctx.addReferenceObj("forestBcast", broadcastForests)
    val mapTerm = ctx.addMutableState("scala.collection.immutable.Map", "forestMap",
      v => s"$v = (scala.collection.immutable.Map) $bcastTerm.value();")
    val cursorTerm = ctx.addMutableState(
      "graft.operators.IntervalForestCursor", "forestCursor",
      v => s"$v = new graft.operators.IntervalForestCursor();")
    val forest = ctx.freshName("forest")
    val matched = ctx.freshName("buildRow")
    val numOutput = metricTerm(ctx, "numOutputRows")

    val lookup =
      s"""
         |$evalInput
         |${sStartEv.code}
         |${sEndEv.code}
         |${keyEv.code}
         |graft.operators.IntervalForest $forest = null;
         |if (!(${sStartEv.isNull}) && !(${sEndEv.isNull}) && !($keyNull)) {
         |  $forest = graft.plans.IntervalForestJoinExec.lookup($mapTerm, ${keyEv.value});
         |}
       """.stripMargin

    joinType match {
      case LeftSemi =>
        // Existence test: the first cursor hit emits the stream row and
        // stops — no match enumeration at all.
        s"""
           |$lookup
           |if ($forest != null) {
           |  $cursorTerm.reset($forest, ${sStartEv.value}, ${sEndEv.value}, $minOverlap);
           |  if ($cursorTerm.advance()) {
           |    $numOutput.add(1);
           |    ${consume(ctx, input)}
           |  }
           |}
         """.stripMargin
      case LeftAnti =>
        // Absence test: null interval/key and absent contig rows have no
        // matches by construction ($forest stays null) and are emitted —
        // same preservation as the interpreted path.
        val found = ctx.freshName("found")
        s"""
           |$lookup
           |boolean $found = false;
           |if ($forest != null) {
           |  $cursorTerm.reset($forest, ${sStartEv.value}, ${sEndEv.value}, $minOverlap);
           |  $found = $cursorTerm.advance();
           |}
           |if (!$found) {
           |  $numOutput.add(1);
           |  ${consume(ctx, input)}
           |}
         """.stripMargin
      case LeftOuter | RightOuter =>
        // Preserved side streams (the stream child IS the preserved side —
        // RangeJoinChoice pins the build side opposite it). Loop shape is
        // BroadcastHashJoinExec's codegenOuter: iterate matches; a
        // match-less row takes exactly one pass with `matched == null`,
        // reading every build column through a null guard.
        import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, JavaCode}
        import org.apache.spark.sql.catalyst.expressions.codegen.Block._
        val matchedTerm = ctx.addMutableState("InternalRow", "outerMatched")
        val buildVars = buildPlan.output.zipWithIndex.map { case (a, i) =>
          val isNull = ctx.freshName("bIsNull")
          val value = ctx.freshName("bValue")
          val jt = CodeGenerator.javaType(a.dataType)
          val rowVal = CodeGenerator.getValue(matchedTerm, a.dataType, i.toString)
          val c =
            code"""
               |boolean $isNull = $matchedTerm == null || $matchedTerm.isNullAt($i);
               |$jt $value = $isNull ? ${CodeGenerator.defaultValue(a.dataType)} : ($rowVal);
             """.stripMargin
          ExprCode(c, JavaCode.isNullVariable(isNull), JavaCode.variable(value, a.dataType))
        }
        val resultVars = if (buildLeft) buildVars ++ input else input ++ buildVars
        val found = ctx.freshName("found")
        s"""
           |$lookup
           |if ($forest != null) {
           |  $cursorTerm.reset($forest, ${sStartEv.value}, ${sEndEv.value}, $minOverlap);
           |}
           |boolean $found = false;
           |while (true) {
           |  $matchedTerm = ($forest != null && $cursorTerm.advance())
           |    ? (InternalRow) $cursorTerm.value() : null;
           |  if ($matchedTerm == null && $found) break;
           |  $found = true;
           |  $numOutput.add(1);
           |  ${consume(ctx, resultVars)}
           |  if ($matchedTerm == null) break;
           |}
         """.stripMargin
      case _ => // Inner
        // Build-side output columns read from the matched row inside the
        // loop.
        ctx.INPUT_ROW = matched
        ctx.currentVars = null
        val buildVars = buildPlan.output.zipWithIndex.map { case (a, i) =>
          BoundReference(i, a.dataType, a.nullable).genCode(ctx)
        }
        val resultVars = if (buildLeft) buildVars ++ input else input ++ buildVars
        s"""
           |$lookup
           |if ($forest != null) {
           |  $cursorTerm.reset($forest, ${sStartEv.value}, ${sEndEv.value}, $minOverlap);
           |  while ($cursorTerm.advance()) {
           |    InternalRow $matched = (InternalRow) $cursorTerm.value();
           |    $numOutput.add(1);
           |    ${consume(ctx, resultVars)}
           |  }
           |}
         """.stripMargin
    }
  }
}

object IntervalForestJoinExec {
  /** Codegen helper: holder lookup returning the array forest or null
    * (called through the companion's static forwarder from generated Java;
    * Scala `Map.getOrElse` isn't callable from Java directly). */
  def lookup(
      map: Map[UnsafeRow, IntervalHolder[InternalRow]],
      key: UnsafeRow): IntervalForest[InternalRow] =
    map.getOrElse(key, null) match {
      case f: IntervalForest[InternalRow @unchecked] => f
      case _ => null
    }
}
