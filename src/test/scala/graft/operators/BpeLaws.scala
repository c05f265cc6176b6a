package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Generative laws for the distributed BPE trainer against the shared
  * [[BpeReference]] textbook machinery: random tiny-alphabet corpora
  * reach tie-breaks, saturation, overlapping self-pairs ("aa"), and the
  * minted-symbol interference case (an earlier merge in a batch minting
  * a symbol a later selected pair consumes) that a fixed fixture
  * undersamples. Spark jobs per round are not free, so samples are few
  * and vocabs small. */
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

  private def wordFreq(docs: org.apache.spark.sql.DataFrame): Map[String, Long] =
    BpeOps.wordFrequencies(docs).collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  // Random corpora sit under the r16 driver gate; these laws pin the
  // DISTRIBUTED trainer, so force that regime per sample (the driver
  // twin is differentially pinned against it in BpeSpec).
  private def forcedDistributed[A](body: => A): A = {
    spark.conf.set("spark.graft.bpe.localThreshold", "0")
    try body finally spark.conf.unset("spark.graft.bpe.localThreshold")
  }

  property("batch=1 trainer == sequential textbook on random corpora") =
    forAll(genDocs) { texts =>
      import graft.SharedSpark.spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val expect = BpeReference.refTrain(wordFreq(docs), numMerges = 6, minFreq = 1)
      val got = forcedDistributed {
        BpeOps.trainBpe(docs, numMerges = 6, batch = 1, minFreq = 1)
          .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
            r.getString(3), r.getLong(4))).toList.sortBy(_._1)
      }
      got == expect
    }

  property("driver gate == distributed trainer on random corpora") =
    forAll(genDocs) { texts =>
      import graft.SharedSpark.spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      def table() = BpeOps.trainBpe(docs, numMerges = 8, batch = 3, minFreq = 1)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toList.sortBy(_._1)
      forcedDistributed(table()) == table()
    }

  property("batched merges apply at exactly their recorded counts") =
    forAll(genDocs) { texts =>
      import graft.SharedSpark.spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val merges = forcedDistributed {
        BpeOps.trainBpe(docs, numMerges = 8, batch = 4, minFreq = 1)
          .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
          .sortBy(_._1)
      }
      var words = BpeReference.toWords(wordFreq(docs))
      merges.forall { case (_, l, r, f) =>
        val ok = BpeReference.countPair(words, l, r) == f
        words = BpeReference.applyMerge(words, l, r)
        ok
      }
    }
}
