package graft.plans

import graft.sources.BamRelation

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  AttributeReference, ElementAt, ExprId, Expression, GetMapValue, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Per-key pruning of the BAM `tags` map (the P1 idea one level deeper):
  * when EVERY use of a [[BamRelation]]'s `tags` attribute anywhere in the
  * plan is a literal-key lookup — `element_at(tags, 'AS')` /
  * `tags['AS']` — the relation is swapped for a copy carrying exactly
  * those keys, and the binary decode loop renders ONLY the named tags
  * (all other tag values stay as skipped bytes; the reference
  * materializes its typed tag columns the same lazily-per-column way,
  * `AlignmentRelation.scala:246-257`). Any other reference to the
  * attribute — a pass-through projection, `map_keys`, a non-literal key,
  * the bare column in the output — disqualifies the relation and the
  * full map is decoded, so the rewrite is always semantics-preserving.
  *
  * Runs in the operator-optimization fixpoint (`injectOptimizerRule`)
  * AFTER column pruning has collapsed projections, so a plan that merely
  * forwards `tags` into one consuming expression has already been
  * rewritten into the direct-lookup shape this rule recognizes.
  * Idempotent: a keyed relation (`tagKeys.isDefined`) is never revisited.
  */
case class TagKeyPruneRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // tags-attribute ExprIds of every not-yet-keyed BAM relation.
    val tracked = mutable.Map.empty[ExprId, Unit]
    plan.foreach {
      case lr @ LogicalRelation(rel: BamRelation, _, _, _, _) if rel.tagKeys.isEmpty =>
        lr.output.find(_.name == "tags").foreach(a => tracked(a.exprId) = ())
      case _ => ()
    }
    if (tracked.isEmpty) return plan

    val keys = mutable.Map.empty[ExprId, mutable.SortedSet[String]]
    val full = mutable.Set.empty[ExprId]

    // Only well-formed 2-char tag names qualify: SAM tags are exactly two
    // characters, and DecodeSpec.tagKeyCodes packs charAt(0)/charAt(1) —
    // a shorter/longer literal must fall back to the full-map decode
    // (which returns null for it) instead of keying the relation.
    def litKey(e: Expression): Option[String] = e match {
      case Literal(k: UTF8String, StringType) if k != null && k.numChars() == 2 =>
        Some(k.toString)
      case _ => None
    }
    def visit(e: Expression): Unit = e match {
      case GetMapValue(a: AttributeReference, key)
          if tracked.contains(a.exprId) && litKey(key).isDefined =>
        keys.getOrElseUpdate(a.exprId, mutable.SortedSet.empty) += litKey(key).get
      case ea: ElementAt =>
        (ea.left, litKey(ea.right)) match {
          case (a: AttributeReference, Some(k)) if tracked.contains(a.exprId) =>
            keys.getOrElseUpdate(a.exprId, mutable.SortedSet.empty) += k
          case _ => ea.children.foreach(visit)
        }
      case a: AttributeReference if tracked.contains(a.exprId) => full += a.exprId
      case other => other.children.foreach(visit)
    }
    // The LogicalRelation leaf's own `output` arg would read as a bare
    // reference — skip leaves; every real USE lives in an operator above.
    plan.foreach {
      case _: LogicalRelation => ()
      case node => node.expressions.foreach(visit)
    }

    val prunable = keys.view.filterKeys(id => !full.contains(id)).toMap
    if (prunable.isEmpty) return plan
    plan.transform {
      case lr @ LogicalRelation(rel: BamRelation, _, _, _, _) if rel.tagKeys.isEmpty =>
        lr.output.find(_.name == "tags").flatMap(a => prunable.get(a.exprId)) match {
          case Some(ks) => lr.copy(relation = rel.copy(tagKeys = Some(ks.toSeq)))
          case None => lr
        }
    }
  }
}
