package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ImplicitCastInputTypes, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Exact interval-overlap join predicate:
  * `leftStart <= rightEnd AND rightStart <= leftEnd` (1-based inclusive,
  * >= 1 shared base) — with a semantic pin the plain comparison pair
  * cannot carry.
  *
  * [[graft.plans.IntervalJoinStrategy]] reads
  * `spark.graft.rangejoin.{minOverlap,maxGap}` from the SESSION at
  * planning time and applies them to EVERY matched interval join. That is
  * the right contract for user-authored joins (the conf is the J6
  * surface), but wrong for library operators whose SEMANTICS are
  * exact-overlap by definition — `RangeSetOps.subtract` with an inherited
  * `maxGap=50` would subtract bases it never overlapped, and because
  * planning happens at the caller's action (not at operator-build time),
  * the operator cannot re-pin the conf itself. Conjuncts also cannot act
  * as markers unless they reference BOTH sides — a one-sided or
  * reference-free predicate gets pushed out of the join condition by the
  * optimizer. This expression references all four bounds, so it stays in
  * the condition; [[graft.plans.ExtractIntervalJoin]] recognizes it and
  * flags the join `exact`, which the strategy and the bin-range rewrite
  * honor by pinning `minOverlap=1, maxGap=0` regardless of session conf.
  *
  * Evaluation (interpreted fallback) matters only when the engine is
  * disabled (`rangejoin.enabled=false`) and stock Spark runs the
  * condition inside a nested-loop join — already the slow path, so
  * CodegenFallback is fine.
  */
case class IntervalOverlaps(leftStart: Expression, leftEnd: Expression,
    rightStart: Expression, rightEnd: Expression)
    extends Expression with Predicate with ImplicitCastInputTypes
    with ExpectsInputTypes with CodegenFallback {

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
    ls.asInstanceOf[Int] <= re.asInstanceOf[Int] &&
      rs.asInstanceOf[Int] <= le.asInstanceOf[Int]
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(newChildren(0), newChildren(1), newChildren(2), newChildren(3))
}

object IntervalOverlaps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column-API surface for library operators: exact overlap of
    * `[ls, le]` with `[rs, re]`, immune to the session's
    * minOverlap/maxGap confs. Conjoin with the contig equality as usual:
    * `a.join(b, a("contig") === b("contig") && IntervalOverlaps.of(...))`. */
  def of(ls: Column, le: Column, rs: Column, re: Column): Column =
    ColumnBridge.column(IntervalOverlaps(
      ColumnBridge.expression(ls), ColumnBridge.expression(le),
      ColumnBridge.expression(rs), ColumnBridge.expression(re)))
}
