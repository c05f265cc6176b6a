package graft

import graft.tools.ScaleProbe

/** Gate-enforced invariants behind SCALE.md's measured scale-proof
  * (r15 VERDICT #1): the same probes `graft.tools.ScaleProbe` measures
  * at ~50M rows run here at gate size, asserting the STRUCTURE the
  * 100 TB argument rests on — pair-free counting in both physical
  * regimes, O(annotations) driver build state, and event-sweep shuffle
  * volume linear in reads (never in pairs or bases). The big-number
  * wall-clock/core-scaling evidence lives in SCALE.md ("Measured scale
  * probe"), produced by the tool on an idle machine. */
class ScaleProbeSpec extends SparkSpec {

  private val nReads = 1000000L
  private val nAnnots = 50000L
  private val genome = 100000000

  test("scale probes: pair-free count joins, bounded build, linear-in-reads shuffle") {
    val totals = new ScaleProbe.StageTotals
    spark.sparkContext.addSparkListener(totals)
    try {
      val Seq(cov, bc, br) =
        ScaleProbe.runAll(spark, totals, nReads, nAnnots, genome, parts = 16)

      // Coverage: the event sweep shuffles the ±1 points — ~2 per solid
      // read, 4 per spliced (every 5th) ⇒ ≤ 2.5·reads — and nothing
      // else. A per-base or per-pair formulation would be 40–100×.
      assert(cov.rows > 0)
      assert(cov.shuffle("shuffle_write_records") <= (nReads * 2.6).toLong,
        s"coverage shuffled ${cov.shuffle}, expected <= 2.6 x reads")

      // Broadcast count regime (the featureCounts shape): the build side
      // the driver holds is exactly the annotation set (forest is
      // O(annotations), never O(reads)); pairs are COUNTED, not
      // materialized — the only shuffled rows are narrow (key, count)
      // partials, so bytes stay ~16B per touched key vs >50B pair rows.
      assert(bc.extra("buildRows") === nAnnots)
      assert(bc.extra("pairCount") > 0L)
      assert(bc.rows <= nAnnots)
      assert(bc.shuffle("shuffle_write_bytes") <= bc.extra("pairCount") * 16 + (1L << 20),
        s"broadcast count path shuffled ${bc.shuffle} for ${bc.extra("pairCount")} pairs " +
          "— pair-width rows are hitting the exchange")

      // Bin-range (shuffle) regime: identical pair arithmetic — the two
      // regimes must agree bit-for-bit on the counted pairs — and its
      // shuffle moves O(reads + annotations) narrow rows, never O(pairs).
      assert(br.extra("pairCount") === bc.extra("pairCount"),
        "physical regimes disagree on the counted pairs")
      assert(br.rows === bc.rows)
      assert(br.shuffle("shuffle_write_records") <=
        (nReads * 2.2).toLong + nAnnots * 4,
        s"bin-range shuffled ${br.shuffle} records for $nReads reads — " +
          "pair rows are hitting the exchange")
    } finally spark.sparkContext.removeSparkListener(totals)
  }
}
