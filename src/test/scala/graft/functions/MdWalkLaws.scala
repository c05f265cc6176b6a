package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property test for the MD/CIGAR walkers: generate a random alignment
  * MODEL (ops with per-base match/mismatch decisions), render the CIGAR,
  * MD, SEQ and QUAL strings from it the way an aligner would, and check
  * the walkers recover exactly the model's mismatches and covered
  * positions. This is the executable replacement for the reference's
  * golden-file MDTagParser suites (no BAM files offline).
  */
object MdWalkLaws extends Properties("MdWalk") {

  private val bases = "ACGT"

  /** One aligned segment: op + per-base (refBase, readBase) decisions. */
  private case class Op(op: Char, len: Int, ref: String, read: String)

  private val genOp: Gen[Op] = for {
    op <- Gen.frequency(6 -> 'M', 1 -> '=', 1 -> 'X', 1 -> 'I', 1 -> 'D', 1 -> 'N', 1 -> 'S')
    len <- Gen.chooseNum(1, 8)
    refs <- Gen.listOfN(len, Gen.oneOf(bases.toSeq))
    // For M: each base independently match/mismatch. '=' forces match,
    // 'X' forces mismatch (read base differs from ref).
    flips <- Gen.listOfN(len, Gen.prob(0.3))
  } yield {
    val ref = refs.mkString
    op match {
      case 'M' | '=' | 'X' =>
        val read = refs.zip(flips).map { case (r, flip) =>
          val mismatch = op match { case '=' => false; case 'X' => true; case _ => flip }
          if (mismatch) bases((bases.indexOf(r) + 1) % 4) else r
        }.mkString
        Op(op, len, ref, read)
      case 'I' | 'S' => Op(op, len, "", ref) // read-only bases
      case _ => Op(op, len, ref, "")         // D/N: reference-only
    }
  }

  private val genAln: Gen[(Int, List[Op])] = for {
    start <- Gen.chooseNum(1, 100000)
    n <- Gen.chooseNum(1, 10)
    ops <- Gen.listOfN(n, genOp)
  } yield (start, ops)

  /** Render (cigar, md, seq, quals, expectedMismatches, coveredRefPos). */
  private def render(start: Int, ops: List[Op]) = {
    val cigar = new StringBuilder
    val md = new StringBuilder
    val seq = new StringBuilder
    var refPos = start
    var matchRun = 0
    var mismatches = List.empty[(Int, String, Int)]
    var covered = List.empty[Int]
    ops.foreach { o =>
      cigar.append(o.len).append(o.op)
      o.op match {
        case 'M' | '=' | 'X' =>
          o.ref.zip(o.read).foreach { case (r, b) =>
            covered ::= refPos
            if (r == b) matchRun += 1
            else {
              md.append(matchRun).append(r); matchRun = 0
              // qual char derives from the read offset below, filled after
              mismatches ::= ((refPos, b.toString, -1))
            }
            seq.append(b)
            refPos += 1
          }
        case 'I' | 'S' => seq.append(o.read)
        case 'D' =>
          md.append(matchRun).append('^').append(o.ref); matchRun = 0
          refPos += o.len
        case 'N' => refPos += o.len
        case _ => ()
      }
    }
    md.append(matchRun)
    // Qual string: deterministic per read offset; recompute expected quals
    // by locating each mismatch read offset from (seq, read walk).
    val quals = seq.indices.map(i => ((i % 40) + 33).toChar).mkString
    // Re-walk to attach read offsets to mismatches in order.
    var readIdx = 0
    val expected = scala.collection.mutable.ListBuffer.empty[(Int, String, Int)]
    var rp = start
    ops.foreach { o =>
      o.op match {
        case 'M' | '=' | 'X' =>
          o.ref.zip(o.read).foreach { case (r, b) =>
            if (r != b) expected += ((rp, b.toString, quals(readIdx) - 33))
            rp += 1; readIdx += 1
          }
        case 'I' | 'S' => readIdx += o.len
        case 'D' | 'N' => rp += o.len
        case _ => ()
      }
    }
    (cigar.toString, md.toString, seq.toString, quals, expected.toList, covered.reverse)
  }

  property("mismatches recovered exactly from CIGAR+MD+SEQ+QUAL") =
    forAll(genAln) { case (start, ops) =>
      val (cigar, md, seq, quals, expected, _) = render(start, ops)
      val arr = MdWalk.mismatches(start, UTF8String.fromString(cigar),
        UTF8String.fromString(md), UTF8String.fromString(seq), UTF8String.fromString(quals))
      val got = (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 3)
        (r.getInt(0), r.getUTF8String(1).toString, r.getInt(2))
      }.toList
      got == expected
    }

  property("coverage events integrate back to the covered reference positions") =
    forAll(genAln) { case (start, ops) =>
      val (cigar, _, _, _, _, covered) = render(start, ops)
      val end = start + ops.filter(o => "M=XDN".contains(o.op)).map(_.len).sum - 1
      val arr = CigarWalk.coverageEvents(start, end, UTF8String.fromString(cigar))
      // Sum the ±1 deltas over positions: coverage 1 exactly on covered.
      val deltas = (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 2); (r.getInt(0), r.getInt(1))
      }
      val byPos = deltas.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      val eventsSorted = byPos.toSeq.sortBy(_._1)
      var cov = 0
      var run = List.empty[(Int, Int)] // (from, cov) changepoints
      eventsSorted.foreach { case (p, d) => cov += d; run ::= ((p, cov)) }
      val cps = run.reverse
      def covAt(p: Int): Int = cps.takeWhile(_._1 <= p).lastOption.map(_._2).getOrElse(0)
      val coveredSet = covered.toSet
      val lo = start - 2
      val hi = end + 2
      (lo to hi).forall(p => covAt(p) == (if (coveredSet(p)) 1 else 0))
    }
}
