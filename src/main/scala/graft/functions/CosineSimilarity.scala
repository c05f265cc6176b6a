package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd cosine similarity over two `array<double>` columns —
  * the hot loop of similarity search. A `zip_with`+`aggregate`
  * higher-order formulation is interpreted per element with boxing; this
  * expression generates one tight fused loop inside whole-stage codegen
  * (the brief's preferred extension order: native Expression with
  * doGenCode > UDF). Accumulation is sequential in index order, so
  * results are bit-identical to the HOF formulation and to DuckDB's
  * double-precision `list_cosine_similarity` — the ANN oracle contract.
  *
  * Inputs of `array<float>` are implicitly cast. Arrays are assumed
  * element-non-null; length mismatch uses the shorter prefix for the dot
  * product (norms still use each array's own full length). A zero-norm
  * vector yields NaN (0/0) — deliberately NOT coerced to 0.0, because the
  * oracle contract is bit-parity with DuckDB's `list_cosine_similarity`,
  * which propagates NaN the same way. CAUTION: both Spark and DuckDB
  * order NaN as GREATER than every real double, so a raw
  * `ORDER BY sim DESC` would rank a degenerate zero-norm embedding
  * FIRST — every ranking consumer in [[graft.operators.EmbeddingOps]]
  * therefore filters NaN sims out before its rank window ("no direction
  * ⇒ not a neighbor"), matching the bounded-heap kernels, which skip
  * zero-norm candidates.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with ExpectsInputTypes {

  // AbstractDataType is private[sql]; DataType narrows the return type.
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_similarity"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
    var na = 0.0
    i = 0
    while (i < a.numElements()) { val x = a.getDouble(i); na += x * x; i += 1 }
    var nb = 0.0
    i = 0
    while (i < b.numElements()) { val y = b.getDouble(i); nb += y * y; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($l.numElements(), $r.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $l.getDouble($i) * $r.getDouble($i);
         |}
         |for (int $i = 0; $i < $l.numElements(); $i++) {
         |  double $x = $l.getDouble($i); $na += $x * $x;
         |}
         |for (int $i = 0; $i < $r.numElements(); $i++) {
         |  double $y = $r.getDouble($i); $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
