package graft.operators

/** Shared in-memory BPE machinery for the spec and the laws — ONE
  * definition of "textbook sequential BPE" (count every adjacent
  * position, merge the (freq desc, pair asc) max, greedy left-to-right
  * application) so the two suites cannot drift apart. */
object BpeReference {

  type Words = List[(Array[String], Long)]

  def toWords(wordFreq: Map[String, Long]): Words =
    wordFreq.toList.map { case (w, f) =>
      (w.map(_.toString).toArray :+ BpeOps.EndOfWord, f)
    }

  def applyMerge(words: Words, l: String, r: String): Words =
    words.map { case (sym, wf) =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < sym.length) {
        if (i + 1 < sym.length && sym(i) == l && sym(i + 1) == r) { buf += l + r; i += 2 }
        else { buf += sym(i); i += 1 }
      }
      (buf.toArray, wf)
    }

  def countPair(words: Words, l: String, r: String): Long =
    words.map { case (sym, f) =>
      (0 until sym.length - 1).count(i => sym(i) == l && sym(i + 1) == r) * f
    }.sum

  /** Sequential textbook trainer — the ground truth `batch = 1` must
    * reproduce merge for merge. */
  def refTrain(wordFreq: Map[String, Long], numMerges: Int,
      minFreq: Long): List[(Int, String, String, String, Long)] = {
    var words = toWords(wordFreq)
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
        val ((l, r), f) = eligible.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((out.length, l, r, l + r, f))
        words = applyMerge(words, l, r)
      }
    }
    out.toList
  }
}
