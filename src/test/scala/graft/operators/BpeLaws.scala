package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Generative law for the distributed BPE trainer: on ANY corpus, the
  * `batch = 1` trainer must reproduce the in-memory sequential textbook
  * algorithm merge for merge — random corpora reach tie-breaks,
  * saturation, and self-pair ("aa") paths a fixed fixture undersamples.
  * Spark jobs per round are not free, so samples are few and vocabs
  * small. */
object BpeLaws extends Properties("Bpe") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private def spark = graft.SharedSpark.spark

  // Tiny alphabet on purpose: maximizes pair collisions, ties, and
  // overlapping self-pairs within few merges.
  private val genDocs: Gen[List[String]] = for {
    n <- Gen.chooseNum(1, 6)
    docs <- Gen.listOfN(n, for {
      w <- Gen.chooseNum(1, 8)
      words <- Gen.listOfN(w, for {
        len <- Gen.chooseNum(1, 6)
        cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
      } yield cs.mkString)
    } yield words.mkString(" "))
  } yield docs

  private def refTrain(wordFreq: Map[String, Long], numMerges: Int,
      minFreq: Long): List[(Int, String, String, String, Long)] = {
    var words: List[(Array[String], Long)] =
      wordFreq.toList.map { case (w, f) => (w.map(_.toString).toArray :+ BpeOps.EndOfWord, f) }
    val out = scala.collection.mutable.ListBuffer.empty[(Int, String, String, String, Long)]
    var done = false
    while (out.length < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (sym, f) =>
        (0 until sym.length - 1).foreach { i =>
          counts((sym(i), sym(i + 1))) = counts.getOrElse((sym(i), sym(i + 1)), 0L) + f
        }
      }
      val eligible = counts.filter(_._2 >= minFreq)
      if (eligible.isEmpty) done = true
      else {
        val ((l, r), f) = eligible.minBy { case ((l, r), f) => (-f, l, r) }
        out += ((out.length, l, r, l + r, f))
        words = words.map { case (sym, wf) =>
          val buf = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < sym.length) {
            if (i + 1 < sym.length && sym(i) == l && sym(i + 1) == r) { buf += l + r; i += 2 }
            else { buf += sym(i); i += 1 }
          }
          (buf.toArray, wf)
        }
      }
    }
    out.toList
  }

  property("batch=1 trainer == sequential textbook on random corpora") =
    forAll(genDocs) { texts =>
      import graft.SharedSpark.spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val wordFreq = BpeOps.wordFrequencies(docs).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val expect = refTrain(wordFreq, numMerges = 6, minFreq = 1)
      val got = BpeOps.trainBpe(docs, numMerges = 6, batch = 1, minFreq = 1)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toList.sortBy(_._1)
      got == expect
    }
}
