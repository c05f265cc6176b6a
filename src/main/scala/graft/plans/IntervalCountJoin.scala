package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, AttributeSet, BindReferences, Expression, GenericInternalRow, JoinedRow, Literal, NamedExpression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.LongType

import scala.collection.mutable

/** Count-only aggregate pushdown into the interval join.
  *
  * `SELECT key, COUNT(*) FROM a JOIN b ON overlap GROUP BY key` is the
  * canonical annotation-count query (reads per feature). Planned naively,
  * the join MATERIALIZES every overlap pair — 3.55M assembled UnsafeRows
  * at sf0.1, billions at 100 TB — only for the aggregate above to collapse
  * them to one long per key. When the aggregate consumes nothing but
  * grouping columns from ONE side plus `COUNT(*)`/`COUNT(1)`, the pair
  * rows are pure waste: the broadcast-forest probe can count matches as it
  * walks the tree and emit one `(side columns..., pair_count)` row per
  * counted row instead.
  *
  * [[IntervalCountPushdownRule]] (pre-CBO, so it sees the Join before
  * [[BinRangeLogicalRule]] can rewrite it, and AQE re-optimization replays
  * it) rewrites the `Aggregate(Join)` to `Aggregate(IntervalCountJoinNode)`
  * with `COUNT(1)` re-expressed as `SUM(pair_count)` — the aggregate stays
  * (counts still merge across partitions and stream rows), only the pair
  * stream between join and aggregate disappears. Matching is deliberately
  * narrow: Inner, no residual conjuncts, default overlap semantics
  * (`minOverlap <= 1`, `maxGap = 0` — conf-modified joins take the general
  * path), every aggregate expression either a grouping attribute or an
  * unfiltered non-distinct `COUNT(constant)`, all grouping attributes from
  * one join side, and the forest side within the broadcast budget (the
  * bin-range shuffle path keeps the stock plan).
  *
  * Two counting shapes in [[IntervalCountJoinExec]]:
  *  - grouping side == stream side: count per probed row, zero state;
  *  - grouping side == build side (the `reads per feature` direction): a
  *    per-partition `Array[Long]` indexed by build ordinal — O(|build|)
  *    per task, the same order as the broadcast forest already resident —
  *    flushed as `(build row, partial count)` at partition end; the
  *    surviving aggregate sums partials across partitions.
  *
  * At 100 TB: the unbounded side still never shuffles; what this removes
  * is the per-pair row assembly and the pair stream through the partial
  * aggregate — output volume drops from O(pairs) to O(matched rows) (per
  * partition for the build direction).
  */
case class IntervalCountJoinNode(left: LogicalPlan, right: LogicalPlan,
    keys: IntervalJoinKeys, countLeft: Boolean, buildLeft: Boolean,
    /** Runtime stats-lie guard applies only to stats-made decisions: a
      * broadcast hint on the build side (or method=broadcast) is the user
      * taking responsibility, standard Spark hint semantics — same
      * contract as IntervalForestJoinExec. Resolved at rewrite time, where
      * the JoinHint is still attached. */
    enforceBudget: Boolean,
    cntAttr: AttributeReference)
    extends org.apache.spark.sql.catalyst.plans.logical.BinaryNode {
  override def output: Seq[Attribute] =
    (if (countLeft) left.output else right.output) :+ cntAttr
  override def producedAttributes: AttributeSet = AttributeSet(cntAttr)
  // The probe consumes the key expressions of both sides; the counted
  // side passes through. Pin everything (same conservative contract as
  // NearestJoinNode — the rule only fires on aggregates that consume a
  // subset anyway).
  override def references: AttributeSet =
    AttributeSet(left.output ++ right.output)
  override def maxRows: Option[Long] =
    (if (countLeft) left else right).maxRows
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalCountJoinNode =
    copy(left = newLeft, right = newRight)
}

case class IntervalCountPushdownRule(session: SparkSession)
    extends Rule[LogicalPlan] {

  private def conf(key: String, default: String): String =
    session.conf.get(s"spark.graft.rangejoin.$key", default)

  /** An unfiltered, non-distinct COUNT over a non-null constant — the
    * shapes that count PAIRS (`COUNT(*)` parses to `COUNT(1)`). */
  private def isPairCount(ae: AggregateExpression): Boolean = ae match {
    case AggregateExpression(Count(Seq(Literal(v, _))), Complete, false, None, _) =>
      v != null
    case _ => false
  }

  /** The Join, or — the usual optimized shape — an attribute-only Project
    * over it (ColumnPruning narrows the join output to the grouping
    * columns; the rewrite drops the Project since the aggregate above
    * references its child by exprId, not position). */
  private object JoinMaybeProjected {
    def unapply(p: LogicalPlan): Option[Join] = p match {
      case j: Join => Some(j)
      case org.apache.spark.sql.catalyst.plans.logical.Project(projList, j: Join)
          if projList.forall(_.isInstanceOf[AttributeReference]) => Some(j)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf("enabled", "true").toBoolean ||
        !conf("countPushdown", "true").toBoolean) return plan
    plan.transform {
      case agg @ Aggregate(groupExprs, aggExprs,
          JoinMaybeProjected(join @ Join(jl, jr, Inner, Some(cond), hint)), aggHint)
          if !jl.isStreaming && !jr.isStreaming =>
        val rewritten = for {
          keys <- ExtractIntervalJoin.extract(jl, jr, cond)
          if keys.residual.isEmpty
          if !BinRangeRewrite.isRewriteJoin(keys)
          // Conf-modified overlap semantics take the general path (the
          // strategy applies minOverlap/maxGap there; keys.exact pins the
          // defaults regardless of conf).
          if keys.exact ||
            (conf("minOverlap", "1").toInt <= 1 && conf("maxGap", "0").toInt == 0)
          groupAttrs <- Some(groupExprs).filter(_.forall(_.isInstanceOf[AttributeReference]))
            .map(_.map(_.asInstanceOf[AttributeReference]))
          countLeft <-
            if (groupAttrs.forall(jl.outputSet.contains)) Some(true)
            else if (groupAttrs.forall(jr.outputSet.contains)) Some(false)
            else None
          // Every output is a grouping attribute or a pair count.
          if aggExprs.forall {
            case a: AttributeReference => groupAttrs.exists(_.exprId == a.exprId)
            case Alias(ae: AggregateExpression, _) => isPairCount(ae)
            case _ => false
          }
          // One counting column required (a grouping-only aggregate is
          // DISTINCT, not a count).
          if aggExprs.exists { case Alias(ae: AggregateExpression, _) => isPairCount(ae); case _ => false }
          // The forest side must fit the broadcast budget — reuse the ONE
          // shared mode decision; the bin-range path keeps the stock plan.
          (buildLeft, binRange) = RangeJoinChoice.choose(conf, Inner, jl, jr, hint)
          if !binRange
        } yield {
          val cnt = AttributeReference("pair_count", LongType, nullable = false)()
          val buildHinted = RangeJoinChoice.hinted(
            if (buildLeft) hint.leftHint else hint.rightHint)
          val enforceBudget = conf("method", "auto") != "broadcast" && !buildHinted
          val node = IntervalCountJoinNode(jl, jr, keys, countLeft, buildLeft,
            enforceBudget, cnt)
          val newAggExprs: Seq[NamedExpression] = aggExprs.map {
            case al @ Alias(ae: AggregateExpression, name) if isPairCount(ae) =>
              Alias(ae.copy(aggregateFunction = Sum(cnt)), name)(exprId = al.exprId,
                qualifier = al.qualifier, explicitMetadata = Some(al.metadata))
            case other => other
          }
          Aggregate(groupExprs, newAggExprs, node, aggHint)
        }
        rewritten.getOrElse(agg)
    }
  }
}

/** Physical count-probe: broadcast forest of `Int` build ordinals, stream
  * side probed in place (never shuffled). See [[IntervalCountJoinNode]]. */
case class IntervalCountJoinExec(keys: IntervalJoinKeys, countLeft: Boolean,
    buildLeft: Boolean, override val output: Seq[Attribute],
    left: SparkPlan, right: SparkPlan, enforceBuildBudget: Boolean)
    extends BinaryExecNode {

  override def producedAttributes: AttributeSet = AttributeSet(output)
  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "buildRows" -> SQLMetrics.createMetric(sparkContext, "build side rows"),
    "pairCount" -> SQLMetrics.createMetric(sparkContext, "overlap pairs counted"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  private def bound(e: Expression, p: SparkPlan): Expression =
    BindReferences.bindReference(e, p.output)

  override protected def doExecute(): RDD[InternalRow] = {
    val (buildPlan, streamPlan) = if (buildLeft) (left, right) else (right, left)
    val (bStart, bEnd, bEqs) =
      if (buildLeft) (keys.leftStart, keys.leftEnd, keys.leftEqs)
      else (keys.rightStart, keys.rightEnd, keys.rightEqs)
    val (sStart, sEnd, sEqs) =
      if (buildLeft) (keys.rightStart, keys.rightEnd, keys.rightEqs)
      else (keys.leftStart, keys.leftEnd, keys.leftEqs)
    val bIvB = Seq(bound(bStart, buildPlan), bound(bEnd, buildPlan))
    val bEqsB = bEqs.map(bound(_, buildPlan))
    val sIvB = Seq(bound(sStart, streamPlan), bound(sEnd, streamPlan))
    val sEqsB = sEqs.map(bound(_, streamPlan))
    val nEqs = bEqs.length
    val countBuild = countLeft == buildLeft
    val outAttrs = output
    val numOutputRows = longMetric("numOutputRows")
    val pairCountMetric = longMetric("pairCount")

    // Build-side collect: same row shape as IntervalForestJoinExec's
    // forest build, with an Int ordinal as the forest value so the count
    // array indexes it directly.
    val collected = buildPlan.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(bEqsB)
      val ivProj = UnsafeProjection.create(bIvB)
      it.flatMap { row =>
        val iv = ivProj(row)
        if (iv.isNullAt(0) || iv.isNullAt(1)) Iterator.empty
        else {
          val copy = row.copy()
          val key = keyProj(copy)
          if (nEqs > 0 && key.anyNull) Iterator.empty
          else Iterator.single((key.copy(), iv.getInt(0), iv.getInt(1), copy))
        }
      }
    }.collect()
    longMetric("buildRows") += collected.length
    if (enforceBuildBudget) {
      // Runtime stats-lie guard, same contract as IntervalForestJoinExec.
      val actualBytes = collected.foldLeft(0L) { case (acc, (k, _, _, r)) =>
        acc + k.getSizeInBytes.toLong + 16L + (r match {
          case u: UnsafeRow => u.getSizeInBytes.toLong
          case _ => 64L
        })
      }
      val budget = conf.getConfString(
        "spark.graft.rangejoin.maxBroadcastBytes", (256L << 20).toString).toLong
      val slack = conf.getConfString("spark.graft.rangejoin.buildBytesSlack", "4.0").toDouble
      if (actualBytes > budget * slack) throw new IllegalStateException(
        s"interval-count-join build side is $actualBytes bytes at runtime, over " +
        s"${slack}x the spark.graft.rangejoin.maxBroadcastBytes budget ($budget). " +
        "Raise the budget, broadcast()-hint the side to take responsibility, or " +
        "set spark.graft.rangejoin.countPushdown=false to take the general path.")
    }
    val rowsArr: Array[InternalRow] = collected.map(_._4)
    // Per-key rank index: overlap COUNTS need no tree walk at all.
    // A stream query [qs, qe] overlaps build interval i iff
    // bs_i <= qe AND be_i >= qs; since be_i < qs implies bs_i <= qe
    // (bs <= be < qs <= qe + 1), the count is a pure rank difference:
    //   #overlaps = #(starts <= qe) - #(ends < qs)
    // — two binary searches per stream row, O(log n) regardless of how
    // many pairs the general join would have enumerated. This is what
    // makes the pushdown asymptotically different from "join then
    // count": at 65M pairs (sf0.1, widened features) the pair walk and
    // the rank version part ways by the full pair count.
    val index: Map[UnsafeRow, CountRankIndex] = collected.iterator.zipWithIndex
      .map { case ((k, s, e, _), i) => (k, s, e, i) }.toSeq
      .groupBy(_._1)
      .map { case (k, items) =>
        val byStart = items.sortBy(_._2)
        val byEnd = items.sortBy(_._3)
        k -> CountRankIndex(
          byStart.map(_._2).toArray, byStart.map(_._4).toArray,
          byEnd.map(_._3).toArray, byEnd.map(_._4).toArray)
      }
    val bc = sparkContext.broadcast((index, rowsArr))

    streamPlan.execute().mapPartitions { it =>
      val (idxMap, rows) = bc.value
      val keyProj = UnsafeProjection.create(sEqsB)
      val ivProj = UnsafeProjection.create(sIvB)
      val joined = new JoinedRow
      val cntRow = new GenericInternalRow(1)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      if (countBuild) {
        // Reads-per-feature direction: per-key histograms over the two
        // rank axes — hA(j) streams whose qe admits j start-ranks,
        // hB(p) streams whose qs excludes p end-ranks — folded into
        // per-ordinal counts by one suffix-sum pass per axis at the end.
        // O(|build|) longs per task; zero per-pair work.
        val cnts = new Array[Long](rows.length)
        val hists = mutable.AnyRefMap.empty[UnsafeRow, (Array[Long], Array[Long])]
        it.foreach { srow =>
          val iv = ivProj(srow)
          if (!iv.isNullAt(0) && !iv.isNullAt(1)) {
            val key = keyProj(srow)
            if (nEqs == 0 || !key.anyNull) idxMap.get(key).foreach { idx =>
              val (hA, hB) = hists.getOrElseUpdate(key.copy(),
                (new Array[Long](idx.starts.length + 1),
                 new Array[Long](idx.starts.length + 1)))
              hA(upperBound(idx.starts, iv.getInt(1))) += 1L
              hB(lowerBound(idx.endsSorted, iv.getInt(0))) += 1L
            }
          }
        }
        hists.foreach { case (key, (hA, hB)) =>
          val idx = idxMap(key)
          val n = idx.starts.length
          var run = 0L
          var r = n - 1
          while (r >= 0) { run += hA(r + 1); cnts(idx.ordByStart(r)) += run; r -= 1 }
          run = 0L
          r = n - 1
          while (r >= 0) { run += hB(r + 1); cnts(idx.ordByEnd(r)) -= run; r -= 1 }
        }
        Iterator.range(0, cnts.length).filter(cnts(_) > 0L).map { i =>
          numOutputRows += 1
          pairCountMetric += cnts(i)
          cntRow.setLong(0, cnts(i))
          resultProj(joined(rows(i), cntRow)): InternalRow
        }
      } else {
        // Features-per-read direction: the rank difference IS the count.
        it.flatMap { srow =>
          val iv = ivProj(srow)
          if (iv.isNullAt(0) || iv.isNullAt(1)) Iterator.empty
          else {
            val key = keyProj(srow)
            if (nEqs > 0 && key.anyNull) Iterator.empty
            else idxMap.get(key) match {
              case None => Iterator.empty
              case Some(idx) =>
                val c = (upperBound(idx.starts, iv.getInt(1)) -
                  lowerBound(idx.endsSorted, iv.getInt(0))).toLong
                if (c == 0L) Iterator.empty
                else {
                  numOutputRows += 1
                  pairCountMetric += c
                  cntRow.setLong(0, c)
                  Iterator.single(resultProj(joined(srow, cntRow)): InternalRow)
                }
            }
          }
        }
      }
    }
  }

  /** #elements <= q in an ascending array. */
  private def upperBound(a: Array[Int], q: Int): Int = {
    var lo = 0; var hi = a.length
    while (lo < hi) { val m = (lo + hi) >>> 1; if (a(m) <= q) lo = m + 1 else hi = m }
    lo
  }

  /** #elements < q in an ascending array. */
  private def lowerBound(a: Array[Int], q: Int): Int = {
    var lo = 0; var hi = a.length
    while (lo < hi) { val m = (lo + hi) >>> 1; if (a(m) < q) lo = m + 1 else hi = m }
    lo
  }
}

/** Per-equality-key rank index of the build side: interval starts and
  * ends, each ascending, with the global build ordinal at every rank. */
case class CountRankIndex(starts: Array[Int], ordByStart: Array[Int],
    endsSorted: Array[Int], ordByEnd: Array[Int])
