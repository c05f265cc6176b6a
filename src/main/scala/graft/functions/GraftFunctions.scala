package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.IntegerType

/** The scalar-function surface (SURVEY §2.6), registered through
  * `SparkSessionExtensions.injectFunction`. Every function is a
  * **composition of built-in Catalyst expressions** — not a Scala UDF — so
  * the whole pack stays inside whole-stage codegen with zero
  * serialization/boxing overhead; this matters when e.g. `overlaplength`
  * runs in the residual filter of an interval join over billions of pairs.
  * (The reference registers plain Scala UDFs, `utils/UDFRegister.scala:12-41`;
  * semantics here match `RangeMethods.scala:15-102` exactly — the pure
  * mirror in [[RangeFunctions]] is property-tested against these.)
  *
  * Registered names: `shift, resize, overlap, overlaplength, flank,
  * promoters, clean_contig` + `bdg_`-prefixed aliases of each (reference
  * keeps un-prefixed names as deprecated aliases). The interval-reflect
  * function is registered **only** as `bdg_reflect`: an un-prefixed
  * `reflect` would shadow Spark's built-in Java-reflection
  * `reflect(class, method, ...)`, silently breaking stock SQL for any
  * session with graft attached (r2 ADVICE).
  */
object GraftFunctions {

  type Builder = Seq[Expression] => Expression

  private def interval(start: Expression, end: Expression): Expression =
    CreateNamedStruct(Seq(Literal("start"), start, Literal("end"), end))

  /** Integer division truncating toward zero, as Scala's `Int./`.
    * Catalyst's IntegralDivide returns LongType, hence the cast. */
  private def div(a: Expression, b: Int): Expression =
    Cast(IntegralDivide(a, Literal(b)), IntegerType)

  private val shiftB: Builder = { case Seq(s, e, k) =>
    interval(Add(s, k), Add(e, k))
  }

  private val resizeB: Builder = { case Seq(s, e, k, fix) =>
    val width = Subtract(e, s)
    val center = Add(s, div(width, 2))
    val oddPad = If(EqualTo(Remainder(k, Literal(2)), Literal(0)), div(k, 2), Add(div(k, 2), Literal(1)))
    val centered = interval(
      Subtract(center, Add(div(width, 2), oddPad)),
      Add(center, Add(div(width, 2), div(k, 2))))
    CaseWhen(Seq(
      (EqualTo(Lower(fix), Literal("start")), interval(s, Add(e, k))),
      (EqualTo(Lower(fix), Literal("end")), interval(Subtract(s, k), e))),
      centered)
  }

  private val overlapB: Builder = { case Seq(s1, e1, s2, e2) =>
    Add(Subtract(Least(Seq(e1, e2)), Greatest(Seq(s1, s2))), Literal(1))
  }

  private val flankB: Builder = { case Seq(s, e, w, startFlank, both) =>
    val width = Abs(w)
    val bothStart = If(startFlank, Subtract(s, width), Add(Subtract(e, width), Literal(1)))
    val bothIv = interval(bothStart, Subtract(Add(bothStart, Multiply(Literal(2), width)), Literal(1)))
    val wNonNeg = GreaterThanOrEqual(w, Literal(0))
    val oneStart = CaseWhen(Seq(
      (And(startFlank, wNonNeg), Subtract(s, w)),
      (startFlank, s),
      (wNonNeg, Add(e, Literal(1)))),
      Add(Add(e, w), Literal(1)))
    val oneIv = interval(oneStart, Subtract(Add(oneStart, width), Literal(1)))
    If(both, bothIv, oneIv)
  }

  private val promotersB: Builder = { case Seq(s, _, up, down) =>
    interval(Subtract(s, up), Subtract(Add(s, down), Literal(1)))
  }

  private val reflectB: Builder = { case Seq(s, e, bs, be) =>
    val ns = Subtract(Add(bs, be), e)
    interval(ns, Add(ns, Subtract(e, s)))
  }

  private val cleanContigB: Builder = { case Seq(c) =>
    val stripped = If(StartsWith(c, Literal("chr")),
      Substring(c, Literal(4), Literal(Int.MaxValue)), c)
    If(EqualTo(stripped, Literal("M")), Literal("MT"), stripped)
  }

  private val unCleanContigB: Builder = { case Seq(c) =>
    If(EqualTo(c, Literal("MT")), Literal("chrM"),
      Concat(Seq(Literal("chr"), c)))
  }

  private val cosineB: Builder = { case Seq(a, b) => CosineSimilarity(a, b) }

  private val cigarEventsB: Builder = { case Seq(s, e, c) => CigarCoverageEvents(s, e, c) }

  private val mdMismatchesB: Builder = { case Seq(s, cg, md, sq, q) =>
    MdMismatches(s, cg, md, sq, q)
  }

  private val builders: Seq[(String, Int, Builder)] = Seq(
    ("cosine_similarity", 2, cosineB),
    ("cigar_coverage_events", 3, cigarEventsB),
    ("md_mismatches", 5, mdMismatchesB),
    ("shift", 3, shiftB),
    ("resize", 4, resizeB),
    ("overlap", 4, overlapB),
    ("overlaplength", 4, overlapB),
    ("flank", 5, flankB),
    ("promoters", 4, promotersB),
    ("clean_contig", 1, cleanContigB),
    ("unclean_contig", 1, unCleanContigB))

  /** (identifier, info, builder) triples for `injectFunction` — both the
    * plain name and the `bdg_` alias (reflect: alias only, see above). */
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] =
    (builders.flatMap { case (name, arity, b) =>
      Seq(name, s"bdg_$name").map(n => (n, arity, b))
    } :+ (("bdg_reflect", 4, reflectB))).map { case (n, arity, b) =>
      val checked: Builder = { args =>
        require(args.length == arity, s"$n expects $arity arguments, got ${args.length}")
        b(args)
      }
      (FunctionIdentifier(n), new ExpressionInfo(GraftFunctions.getClass.getName, n), checked)
    }
}
