package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential tests for the distributed BPE trainer: `batch = 1` must
  * reproduce the sequential textbook algorithm (count every adjacent
  * position, merge the (freq desc, pair asc) max, greedy left-to-right
  * application) exactly; batched rounds must stay valid merges; encode
  * obeys the structural piece-count bounds. */
class BpeSpec extends SparkSpec {

  private def docsOf(texts: String*) = {
    import graft.SharedSpark.spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  /** In-memory sequential reference (textbook BPE on a word-freq table). */
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

  private val fixture = docsOf(
    "the cat sat on the mat",
    "the cats sat on the mats",
    "lower lowest low low lower",
    "newer newest new new newer",
    "the the the low low cat")

  test("batch=1 equals the sequential textbook reference, merge for merge") {
    val spark = graft.SharedSpark.spark
    val wordFreq = BpeOps.wordFrequencies(fixture).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = refTrain(wordFreq, numMerges = 20, minFreq = 2)
    val got = BpeOps.trainBpe(fixture, numMerges = 20, batch = 1, minFreq = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toList.sortBy(_._1)
    assert(got === expect)
  }

  test("batched rounds: every merge's recorded count is exact at selection time") {
    // Re-derive each rank's pair count by replaying all PRIOR merges
    // over the word table with the in-memory machinery; the
    // non-interference selection must have recorded exactly that count.
    val wordFreq = BpeOps.wordFrequencies(fixture).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val merges = BpeOps.trainBpe(fixture, numMerges = 16, batch = 4, minFreq = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).sortBy(_._1)
    var words: List[(Array[String], Long)] =
      wordFreq.toList.map { case (w, f) => (w.map(_.toString).toArray :+ BpeOps.EndOfWord, f) }
    def countPair(l: String, r: String): Long = words.map { case (sym, f) =>
      (0 until sym.length - 1).count(i => sym(i) == l && sym(i + 1) == r) * f
    }.sum
    def apply1(l: String, r: String): Unit = words = words.map { case (sym, wf) =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < sym.length) {
        if (i + 1 < sym.length && sym(i) == l && sym(i + 1) == r) { buf += l + r; i += 2 }
        else { buf += sym(i); i += 1 }
      }
      (buf.toArray, wf)
    }
    // Within a round (batch), counts were all taken BEFORE any of the
    // round's merges applied; non-interference makes them exact anyway.
    // Replay sequentially and check each recorded count.
    merges.foreach { case (_, l, r, m, f) =>
      assert(countPair(l, r) === f,
        s"recorded count for ($l,$r)->$m must equal the true count at application time")
      assert(m === l + r)
      apply1(l, r)
    }
  }

  test("encode: structural bounds and monotone fertility in vocab size") {
    val small = BpeOps.trainBpe(fixture, numMerges = 4, batch = 2, minFreq = 2)
    val big = BpeOps.trainBpe(fixture, numMerges = 24, batch = 8, minFreq = 2)
    val encSmall = BpeOps.bpeEncode(fixture, small).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val encBig = BpeOps.bpeEncode(fixture, big).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(encSmall.keySet === encBig.keySet)
    encSmall.foreach { case (id, (nw, np, nc)) =>
      assert(np >= nw, "at least one piece per word")
      assert(np <= nc + nw, "at most chars + end-of-word symbols pieces")
      val (nwB, npB, ncB) = encBig(id)
      assert(nwB === nw && ncB === nc)
      assert(npB <= np, "more merges can only reduce or keep piece counts")
    }
  }

  test("trainer stops early when the corpus saturates below minFreq") {
    val tiny = docsOf("ab ab")
    // "ab" freq 2: pairs (a,b)=2, (b,</w>)=2 merge down quickly; after
    // the word collapses to one symbol there are no pairs left.
    val merges = BpeOps.trainBpe(tiny, numMerges = 50, batch = 4, minFreq = 2)
      .collect()
    assert(merges.length < 50, "must stop before the requested vocab on a tiny corpus")
    assert(merges.nonEmpty)
  }
}
