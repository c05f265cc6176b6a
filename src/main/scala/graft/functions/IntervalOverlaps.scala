package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ImplicitCastInputTypes, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Interval-overlap join predicate with PLAN-EMBEDDED semantics:
  * `leftStart <= rightEnd AND rightStart <= leftEnd` (1-based inclusive,
  * >= 1 shared base), optionally modified by `minOverlap`/`maxGap` — and
  * optionally carrying a physical-method pin (`method`) — all as
  * constructor parameters baked into the expression tree, a pin the plain
  * comparison pair cannot carry.
  *
  * Why plan-embedded instead of session conf:
  * [[graft.plans.IntervalJoinStrategy]] reads
  * `spark.graft.rangejoin.{minOverlap,maxGap,method}` from the SESSION at
  * planning time and applies them to EVERY matched interval join whose
  * predicate doesn't pin its own. That is a usable surface for ad-hoc
  * user-authored joins, but wrong whenever the SEMANTICS belong to the
  * query: `RangeSetOps.subtract` with an inherited `maxGap=50` would
  * subtract bases it never overlapped, two queries running CONCURRENTLY
  * in one session would race on the conf, and because planning happens at
  * the caller's action (not at operator/query build time), neither can
  * re-pin the conf itself. Conjuncts also cannot act as markers unless
  * they reference BOTH sides — a one-sided or reference-free predicate
  * gets pushed out of the join condition by the optimizer. This
  * expression references all four bounds, so it stays in the condition;
  * [[graft.plans.ExtractIntervalJoin]] recognizes it and carries the
  * pinned values on [[graft.plans.IntervalJoinKeys]], which the strategy,
  * the bin-range rewrite, and the aggregate pushdown honor over the
  * session confs (the confs remain defaults-only).
  *
  * minOverlap > 1 with maxGap > 0 is rejected: the engine applies the gap
  * by widening ONE side (whichever builds), so the overlap-length test
  * under a gap would depend on a physical decision — no defensible
  * semantics to pin.
  *
  * WELL-FORMEDNESS CONTRACT: intervals must satisfy `start <= end`
  * (1-based inclusive). The raw comparison pair can coincidentally
  * "match" an inverted row (e.g. a=[12,3] against b=[2,20] satisfies
  * both inequalities), so results over malformed input differ between
  * the general per-pair path and the aggregate-pushdown rank paths,
  * which DROP inverted rows — and count them in the execs'
  * `invertedDropped` SQL metric, so a contract breach is visible in the
  * UI / SQLMetrics rather than silent. Filter or repair inverted rows
  * upstream (`pos_start <= pos_end`, cf. the reads quality filter)
  * before joining.
  *
  * Evaluation (interpreted fallback) matters only when the engine is
  * disabled (`rangejoin.enabled=false`) and stock Spark runs the
  * condition inside a nested-loop join — already the slow path, so
  * CodegenFallback is fine.
  */
case class IntervalOverlaps(leftStart: Expression, leftEnd: Expression,
    rightStart: Expression, rightEnd: Expression,
    minOverlap: Int = 1, maxGap: Int = 0, method: String = "")
    extends Expression with Predicate with ImplicitCastInputTypes
    with ExpectsInputTypes with CodegenFallback {

  require(minOverlap <= 1 || maxGap == 0,
    "interval_overlaps: minOverlap > 1 cannot be combined with maxGap > 0")

  override def children: Seq[Expression] = Seq(leftStart, leftEnd, rightStart, rightEnd)
  override def inputTypes: Seq[DataType] =
    Seq(IntegerType, IntegerType, IntegerType, IntegerType)
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "interval_overlaps"

  override def eval(input: InternalRow): Any = {
    val ls = leftStart.eval(input); if (ls == null) return null
    val le = leftEnd.eval(input); if (le == null) return null
    val rs = rightStart.eval(input); if (rs == null) return null
    val re = rightEnd.eval(input); if (re == null) return null
    val lsI = ls.asInstanceOf[Int]; val leI = le.asInstanceOf[Int]
    val rsI = rs.asInstanceOf[Int]; val reI = re.asInstanceOf[Int]
    if (minOverlap > 1) {
      // maxGap == 0 here (require above): plain overlap length.
      math.min(leI, reI) - math.max(lsI, rsI) + 1 >= minOverlap
    } else {
      // Gap-widened overlap core; widening either side is equivalent
      // (ls <= re + g  <=>  ls - g <= re). Long arithmetic: re + g could
      // wrap Int for coordinates near 2^31.
      lsI.toLong <= reI.toLong + maxGap && rsI.toLong <= leI.toLong + maxGap
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(newChildren(0), newChildren(1), newChildren(2), newChildren(3))
}

object IntervalOverlaps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column-API surface: overlap of `[ls, le]` with `[rs, re]` under the
    * given semantics, immune to the session's minOverlap/maxGap/method
    * confs (plan-embedded — safe under concurrent queries in one
    * session). `method` ("" = session default / stats) pins the physical
    * regime: "broadcast" or "binrange". Conjoin with the contig equality
    * as usual:
    * `a.join(b, a("contig") === b("contig") && IntervalOverlaps.of(...))`. */
  def of(ls: Column, le: Column, rs: Column, re: Column,
      minOverlap: Int = 1, maxGap: Int = 0, method: String = ""): Column =
    ColumnBridge.column(IntervalOverlaps(
      ColumnBridge.expression(ls), ColumnBridge.expression(le),
      ColumnBridge.expression(rs), ColumnBridge.expression(re),
      minOverlap, maxGap, method))
}
