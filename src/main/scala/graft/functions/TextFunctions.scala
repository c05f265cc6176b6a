package graft.functions

import graft.operators.TextOps
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.ColumnBridge

/** SQL surface for the text-curation columns: the same codegen'd
  * expression compositions [[TextOps]] exposes to the DataFrame API,
  * registered as SQL functions so `spark.sql` users can run the curation
  * pipeline without Scala (`SELECT quality_score(text), lang_guess(text),
  * split_assign(doc_id) FROM docs`). Built by round-tripping the Column
  * composition through [[ColumnBridge]] — no UDFs, no new expression
  * classes, identical semantics to the DataFrame path by construction.
  *
  * Names chosen to not shadow any Spark built-in (the `reflect` lesson,
  * r2 ADVICE).
  */
object TextFunctions {

  type Builder = Seq[Expression] => Expression

  private def lift(f: Seq[Column] => Column): Builder =
    args => ColumnBridge.catalystExpression(f(args.map(ColumnBridge.column)))

  private val builders: Seq[(String, Int, Builder)] = Seq(
    ("token_count", 1, lift { case Seq(t) => TextOps.tokenCount(t) }),
    ("subtoken_count", 1, lift { case Seq(t) => TextOps.subtokenCount(t) }),
    ("stopword_ratio", 1, lift { case Seq(t) => TextOps.stopwordRatio(t) }),
    ("type_token_ratio", 1, lift { case Seq(t) => TextOps.typeTokenRatio(t) }),
    ("quality_score", 1, lift { case Seq(t) => TextOps.qualityScore(t) }),
    ("lang_guess", 1, lift { case Seq(t) => TextOps.langGuess(t) }),
    ("doc_fingerprint", 1, lift { case Seq(t) => TextOps.fingerprint(t) }),
    // Default 90/5/5 grid — the common case; custom weights stay a
    // DataFrame-API concern (SQL has no map literals worth the ceremony).
    ("split_assign", 1, lift { case Seq(k) => TextOps.splitColumn(k) }))

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] =
    builders.map { case (n, arity, b) =>
      val checked: Builder = { args =>
        require(args.length == arity, s"$n expects $arity arguments, got ${args.length}")
        b(args)
      }
      (FunctionIdentifier(n), new ExpressionInfo(TextFunctions.getClass.getName, n), checked)
    }
}
