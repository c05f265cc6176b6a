package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, JoinType, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Extracted keys of an interval (range) join:
  * `leftStart <= rightEnd && rightStart <= leftEnd` with optional equality
  * keys (contig) and a residual predicate replayed after the join.
  */
case class IntervalJoinKeys(
    leftStart: Expression,
    leftEnd: Expression,
    rightStart: Expression,
    rightEnd: Expression,
    leftEqs: Seq[Expression],
    rightEqs: Seq[Expression],
    residual: Option[Expression],
    /** Set when the overlap came from [[graft.functions.IntervalOverlaps]]
      * — a join whose semantics (and optionally physical method) are
      * PLAN-EMBEDDED at construction. The strategy, the bin-range rewrite,
      * and the aggregate pushdown then use these values instead of reading
      * the session confs, so a user-set (or concurrently-mutated) J6 conf
      * cannot silently change query semantics — planning happens at the
      * CALLER's action, after any conf the operator might have set.
      * `None` = user-authored comparison-pair join; the session confs (the
      * defaults-only surface) apply. */
    minOverlap: Option[Int] = None,
    maxGap: Option[Int] = None,
    /** Pinned physical regime ("broadcast" | "binrange"); None = session
      * conf / stats decide. Unlike the two above this is plan-shape only,
      * never result-affecting. */
    method: Option[String] = None) {
  /** Operator-authored join (semantics pinned in the plan). */
  def pinned: Boolean = minOverlap.isDefined
}

/** Recognizes inner joins whose condition contains the interval-overlap
  * core `a.end >= b.start AND a.start <= b.end`, optionally conjoined with
  * equality keys (`a.contig = b.contig`) and arbitrary extra conjuncts
  * (kept as a residual filter — a generalization over the reference, whose
  * matcher requires the exact shape and otherwise falls back to a
  * nested-loop join; see
  * `rangejoins/common/ExtractRangeJoinKeysWithEquality.scala:29-44`,
  * `ExtractRangeJoinKeys.scala:23-39`).
  *
  * Reference parity notes (SURVEY §2.3): `<=`/`>=` only (strict `<`/`>`
  * is NOT matched, same as the reference); key side assignment by
  * attribute containment (the reference's `canEvaluate`).
  *
  * Beyond the reference (which is Inner-only,
  * `ExtractRangeJoinKeysWithEquality.scala:29-44`): LeftOuter/RightOuter/
  * FullOuter/LeftSemi/LeftAnti interval joins are also matched — stock
  * Spark plans every one of these as a BroadcastNestedLoopJoin (the
  * O(|L|·|R|) scale-killer), so "reads with no annotation" (anti) or
  * "keep all reads, tag matched" (outer) hit exactly the wall this engine
  * exists to remove.
  */
object ExtractIntervalJoin extends PredicateHelper {

  private val supported: Set[JoinType] =
    Set(Inner, LeftOuter, RightOuter, FullOuter, LeftSemi, LeftAnti)

  def unapply(plan: LogicalPlan)
      : Option[(LogicalPlan, LogicalPlan, JoinType, IntervalJoinKeys, JoinHint)] =
    plan match {
      case Join(left, right, jt, Some(cond), hint) if supported(jt) =>
        extract(left, right, cond).map { keys => (left, right, jt, keys, hint) }
      case _ => None
    }

  private def evaluableOn(e: Expression, p: LogicalPlan): Boolean =
    e.deterministic && e.references.nonEmpty && e.references.subsetOf(p.outputSet)

  /** Coordinate columns may be int or bigint: a user with bigint
    * positions must not silently fall back to BroadcastNestedLoopJoin —
    * the exact scale-killer this strategy exists to avoid. Long bounds
    * are narrowed with an ANSI cast (loud runtime error above 2^31 —
    * far beyond any genomic coordinate — rather than a silent wrap). */
  private def isCoordTyped(e: Expression): Boolean =
    e.dataType == IntegerType || e.dataType == LongType

  private def asInt(e: Expression): Expression =
    if (e.dataType == LongType) Cast(e, IntegerType) else e

  def extract(left: LogicalPlan, right: LogicalPlan, cond: Expression): Option[IntervalJoinKeys] = {
    val conjuncts = splitConjunctivePredicates(cond)

    // Normalize every a >= b into b <= a, then classify by side.
    // ltr: (l, r) meaning l <= r with l from left, r from right  → leftStart=l, rightEnd=r
    // rtl: (r, l) meaning r <= l with r from right, l from left  → rightStart=r, leftEnd=l
    var ltr: Option[(Expression, Expression)] = None
    var rtl: Option[(Expression, Expression)] = None
    val eqL = Seq.newBuilder[Expression]
    val eqR = Seq.newBuilder[Expression]
    val residual = Seq.newBuilder[Expression]

    def classifyLe(a: Expression, b: Expression, orig: Expression): Unit = {
      if (isCoordTyped(a) && isCoordTyped(b) &&
          evaluableOn(a, left) && evaluableOn(b, right) && ltr.isEmpty) {
        ltr = Some((asInt(a), asInt(b)))
      } else if (isCoordTyped(a) && isCoordTyped(b) &&
          evaluableOn(a, right) && evaluableOn(b, left) && rtl.isEmpty) {
        rtl = Some((asInt(a), asInt(b)))
      } else {
        residual += orig
      }
    }

    var pinMinOverlap: Option[Int] = None
    var pinMaxGap: Option[Int] = None
    var pinMethod: Option[String] = None
    def allCoord(es: Expression*): Boolean = es.forall(isCoordTyped)

    conjuncts.foreach {
      case e @ EqualTo(a, b) =>
        if (evaluableOn(a, left) && evaluableOn(b, right)) { eqL += a; eqR += b }
        else if (evaluableOn(a, right) && evaluableOn(b, left)) { eqL += b; eqR += a }
        else residual += e
      // The operator-authored predicate: consumes both bound slots at
      // once and pins the plan-embedded semantics. Symmetric (overlap
      // is), so a swapped-side occurrence relabels rather than falling
      // through.
      case e @ graft.functions.IntervalOverlaps(ls, le, rs, re, m, g, meth)
          if ltr.isEmpty && rtl.isEmpty && allCoord(ls, le, rs, re) =>
        val matched =
          if (evaluableOn(ls, left) && evaluableOn(le, left) &&
              evaluableOn(rs, right) && evaluableOn(re, right)) {
            ltr = Some((asInt(ls), asInt(re))); rtl = Some((asInt(rs), asInt(le)))
            true
          } else if (evaluableOn(ls, right) && evaluableOn(le, right) &&
              evaluableOn(rs, left) && evaluableOn(re, left)) {
            ltr = Some((asInt(rs), asInt(le))); rtl = Some((asInt(ls), asInt(re)))
            true
          } else { residual += e; false }
        if (matched) {
          pinMinOverlap = Some(m); pinMaxGap = Some(g)
          pinMethod = Some(meth).filter(_.nonEmpty)
        }
      case e @ LessThanOrEqual(a, b) => classifyLe(a, b, e)
      case e @ GreaterThanOrEqual(a, b) => classifyLe(b, a, e)
      case e => residual += e
    }

    (ltr, rtl) match {
      case (Some((ls, re)), Some((rs, le))) =>
        Some(IntervalJoinKeys(ls, le, rs, re, eqL.result(), eqR.result(),
          residual.result().reduceOption(And), pinMinOverlap, pinMaxGap, pinMethod))
      case _ => None
    }
  }
}
