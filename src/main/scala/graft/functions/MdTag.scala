package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, QuinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable.ArrayBuffer

/** MD-tag mismatch derivation — the reference's `pileup/MDTagParser.scala:19-67`
  * + `pileup/model/ReadSummary.scala:37-137` (relative-position math across
  * insertions/clips/splices), as a native codegen'd expression.
  *
  * A BAM read records its mismatches in the MD auxiliary tag: numbers count
  * matching aligned bases, a bare letter is the REFERENCE base at a
  * mismatched aligned position, `^XYZ` spells deleted reference bases. The
  * mismatch's reference coordinate and its read base/quality require a
  * joint walk of MD and CIGAR: M/=/X ops consume both reference and read
  * (and are what MD counts), I/S consume read only, D/N consume reference
  * only, H/P consume neither.
  *
  * [[MdWalk.mismatches]] performs that walk per read and returns
  * `array<struct<pos:int, base:string, qual:int>>` — one entry per
  * mismatch with `pos` the 1-based reference position, `base` the read
  * base (from SEQ), `qual` the Phred score (from QUAL, char − 33).
  */
object MdWalk {

  private val EMPTY = new GenericArrayData(Array.empty[Any])

  def mismatches(posStart: Int, cigar: UTF8String, md: UTF8String,
      seq: UTF8String, quals: UTF8String): ArrayData = {
    if (cigar == null || md == null || cigar.numBytes() == 0 || md.numBytes() == 0) return EMPTY
    val cg = cigar.getBytes
    val mdB = md.getBytes
    val out = ArrayBuffer.empty[Any]

    // CIGAR cursor: current op + bases remaining in it.
    var ci = 0
    var opLen = 0
    var op: Char = 0
    var refPos = posStart
    var readIdx = 0

    def nextOp(): Boolean = {
      opLen = 0
      while (ci < cg.length && cg(ci) >= '0' && cg(ci) <= '9') {
        opLen = opLen * 10 + (cg(ci) - '0'); ci += 1
      }
      if (ci >= cg.length) return false
      op = cg(ci).toChar; ci += 1
      true
    }
    nextOp()

    // Position the cursor on an op with remaining bases, consuming
    // read-only ops (I/S advance readIdx) and reference-only ops (D/N
    // advance refPos — MD's ^ segments and splices both land here) on the
    // way. Returns false when the CIGAR is exhausted.
    def settle(): Boolean = {
      while (true) {
        if (opLen == 0) { if (!nextOp()) return false }
        else op match {
          case 'M' | '=' | 'X' => return true
          case 'I' | 'S' => readIdx += opLen; opLen = 0
          case 'D' | 'N' => refPos += opLen; opLen = 0
          case 'H' | 'P' => opLen = 0
          case other => throw new IllegalArgumentException(
            s"unsupported CIGAR op '$other' in '${cigar.toString}'")
        }
      }
      false
    }

    // Consume one aligned (M/=/X) base; returns false if none remain.
    def stepAligned(): Boolean = {
      if (!settle()) return false
      refPos += 1; readIdx += 1; opLen -= 1
      true
    }

    var mi = 0
    while (mi < mdB.length) {
      val c = mdB(mi).toChar
      if (c >= '0' && c <= '9') {
        var n = 0
        while (mi < mdB.length && mdB(mi) >= '0' && mdB(mi) <= '9') {
          n = n * 10 + (mdB(mi) - '0'); mi += 1
        }
        var k = n
        while (k > 0 && stepAligned()) k -= 1
      } else if (c == '^') {
        // Deleted reference bases: the letters name ref bases the D op
        // already accounts for (settle() advances refPos through D); just
        // consume the token.
        mi += 1
        while (mi < mdB.length && ((mdB(mi) >= 'A' && mdB(mi) <= 'Z') ||
            (mdB(mi) >= 'a' && mdB(mi) <= 'z'))) mi += 1
      } else {
        // Mismatch letter: the NEXT aligned base differs from reference.
        if (!settle()) throw new IllegalArgumentException(
          s"MD '${md.toString}' walks past CIGAR '${cigar.toString}'")
        val base =
          if (seq != null && readIdx < seq.numBytes()) seq.substring(readIdx, readIdx + 1)
          else UTF8String.fromString("N")
        val qual =
          if (quals != null && readIdx < quals.numBytes()) quals.getByte(readIdx) - 33
          else 0
        out += new GenericInternalRow(Array[Any](refPos, base, qual))
        refPos += 1; readIdx += 1; opLen -= 1
        mi += 1
      }
    }
    if (out.isEmpty) EMPTY else new GenericArrayData(out.toArray)
  }
}

/** `md_mismatches(pos_start, cigar, md_tag, seq, qual_str)` →
  * `array<struct<pos:int, base:string, qual:int>>`. All five inputs must
  * be non-null (coalesce nullable tag columns to `''` at the call site —
  * an empty cigar/md means "no recorded mismatches" and yields an empty
  * array). */
case class MdMismatches(first: Expression, second: Expression, third: Expression,
    fourth: Expression, fifth: Expression)
    extends QuinaryExpression with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(first, second, third, fourth, fifth)

  override def inputTypes: Seq[DataType] =
    Seq(IntegerType, StringType, StringType, StringType, StringType)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("base", StringType, nullable = false),
      StructField("qual", IntegerType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "md_mismatches"

  override protected def nullSafeEval(s: Any, cg: Any, md: Any, sq: Any, q: Any): Any =
    MdWalk.mismatches(s.asInstanceOf[Int], cg.asInstanceOf[UTF8String],
      md.asInstanceOf[UTF8String], sq.asInstanceOf[UTF8String], q.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, cg, md, sq, q) =>
      s"${ev.value} = graft.functions.MdWalk.mismatches($s, $cg, $md, $sq, $q);")

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(first = newChildren(0), second = newChildren(1), third = newChildren(2),
      fourth = newChildren(3), fifth = newChildren(4))
}
