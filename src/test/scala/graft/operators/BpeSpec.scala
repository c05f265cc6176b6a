package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential tests for the distributed BPE trainer against the shared
  * [[BpeReference]] textbook implementation: `batch = 1` must reproduce
  * it exactly; batched rounds must apply every merge at exactly its
  * recorded count; encode obeys the structural piece-count bounds. */
class BpeSpec extends SparkSpec {

  private def docsOf(texts: String*) = {
    import graft.SharedSpark.spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private val fixture = docsOf(
    "the cat sat on the mat",
    "the cats sat on the mats",
    "lower lowest low low lower",
    "newer newest new new newer",
    "the the the low low cat")

  private def wordFreqOf(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    BpeOps.wordFrequencies(df).collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("batch=1 equals the sequential textbook reference, merge for merge") {
    val expect = BpeReference.refTrain(wordFreqOf(fixture), numMerges = 20, minFreq = 2)
    val got = BpeOps.trainBpe(fixture, numMerges = 20, batch = 1, minFreq = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toList.sortBy(_._1)
    assert(got === expect)
  }

  test("batched rounds: every merge's recorded count is exact at selection time") {
    // Replay all merges sequentially over the word table; the
    // non-interference selection (operands AND minted symbols disjoint
    // within a round) must make each recorded pair_freq exactly the true
    // count at the moment the merge applies.
    val merges = BpeOps.trainBpe(fixture, numMerges = 16, batch = 4, minFreq = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).sortBy(_._1)
    var words = BpeReference.toWords(wordFreqOf(fixture))
    merges.foreach { case (_, l, r, m, f) =>
      assert(BpeReference.countPair(words, l, r) === f,
        s"recorded count for ($l,$r)->$m must equal the true count at application time")
      assert(m === l + r)
      words = BpeReference.applyMerge(words, l, r)
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

  /** The lazy-checkpoint fold: each training round must cost ONE pass
    * over the words table (the pair-count collect materializes the
    * previous rewrite as a side effect). Under AQE that pass surfaces as
    * 2 listener jobs — the shuffle-stage materialization and the final
    * top-K stage of the SAME query; an eager checkpoint would add a
    * third, dedicated count job per round (measured: 14 vs 9 jobs on a
    * 4-round run). Counted via a job-group-scoped listener so concurrent
    * suites can't pollute the tally. */
  test("training runs one words-table pass per round") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val group = "bpe-job-count"
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (e.properties != null &&
          group == e.properties.getProperty("spark.jobGroup.id"))
          jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    // The tiny fixture sits under the driver gate; this spec pins the
    // DISTRIBUTED loop's job shape, so force that regime.
    spark.conf.set("spark.graft.bpe.localThreshold", "0")
    try {
      spark.sparkContext.setJobGroup(group, "bpe job-count spec")
      // batch=1 on the saturating fixture: selection rounds R = merge
      // count, plus one exhaustion-detecting round if the corpus dries
      // before numMerges.
      val merges = BpeOps.trainBpe(fixture, numMerges = 8, batch = 1, minFreq = 2)
        .collect()
      spark.sparkContext.clearJobGroup()
      assert(merges.length === 8)
      // Listener bus is async; wait for the count to settle.
      var last = -1; var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        val now = jobs.get()
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      // 8 rounds × 2 AQE stage-jobs + slack; the eager-checkpoint
      // regime's extra per-round job would push this past 24.
      assert(jobs.get() <= 18,
        s"expected ≤2 jobs/round (8 rounds), saw ${jobs.get()}")
    } finally {
      spark.conf.unset("spark.graft.bpe.localThreshold")
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("driver gate == distributed trainer, both batch shapes") {
    // The size-gated driver trainer (r16) must be bit-identical to the
    // distributed loop — same counts, same UTF8String candidate order,
    // same window truncation, same greedy selection.
    def run(numMerges: Int, batch: Int, threshold: String) = {
      spark.conf.set("spark.graft.bpe.localThreshold", threshold)
      try BpeOps.trainBpe(fixture, numMerges, batch, minFreq = 2)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toList.sortBy(_._1)
      finally spark.conf.unset("spark.graft.bpe.localThreshold")
    }
    for ((n, b) <- Seq((20, 1), (16, 4))) {
      val driver = run(n, b, threshold = "1048576")
      val dist = run(n, b, threshold = "0")
      assert(driver === dist, s"numMerges=$n batch=$b")
      assert(driver.nonEmpty)
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
