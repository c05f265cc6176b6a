package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Generative law for the nearest join's regime equivalence (r8 VERDICT
  * stretch #8): on ANY interval multiset — duplicate lefts, contigs with
  * no rights, dense overlap runs, equidistant flanks — the distributed
  * merge regime (phase-1 endpoint sweep + phase-2 residual interval
  * join) must emit the exact pair multiset the broadcast prefix-max
  * forest probe emits: same pairs, same ties, same distances. Random
  * inputs reach the sweep's tag-ordering subtleties (right starting
  * exactly at a left end, partition-boundary carries) that the five
  * hand-picked fixtures in IntervalJoinSpec undersample. */
object NearestJoinLaws extends Properties("NearestJoin") {

  // Each sample runs several Spark jobs (sweep summaries + two joins):
  // fewer, larger samples.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private def spark = graft.SharedSpark.spark

  private case class Iv(key: Long, contig: String, s: Int, e: Int)

  private def genIvs(keyBase: Long): Gen[List[Iv]] = for {
    n <- Gen.chooseNum(0, 80)
    ivs <- Gen.listOfN(n, for {
      // c3 appears on one side only with positive probability — the
      // absent-contig drop path.
      c <- Gen.frequency(4 -> Gen.oneOf("c0", "c1", "c2"), 1 -> Gen.const("c3"))
      s <- Gen.chooseNum(1, 400)
      len <- Gen.frequency(5 -> Gen.chooseNum(0, 15), 1 -> Gen.chooseNum(80, 200))
      k <- Gen.chooseNum(0L, 20L) // small key range -> duplicate rows
    } yield Iv(keyBase + k, c, s, s + len))
  } yield ivs

  property("merge regime == broadcast regime (pairs, ties, distances)") =
    forAll(genIvs(0L), genIvs(1000L)) { (ls, rs) =>
      import graft.SharedSpark.spark.implicits._
      val l = ls.map(iv => (iv.key, iv.contig, iv.s, iv.e))
        .toDF("a_key", "contig", "pos_start", "pos_end")
      val r = rs.map(iv => (iv.key, iv.contig, iv.s, iv.e))
        .toDF("b_key", "contig", "pos_start", "pos_end")
      def run(method: String): Seq[(Long, Long, Int)] =
        NearestJoinOps.nearestJoin(l, r, method)
          .select("a_key", "b_key", "distance")
          .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2)))
          .sorted.toSeq
      // Run the merge regime at a partition count that dwarfs the sample
      // (few endpoint rows per range partition) — the phase-1 carry folds
      // only do real work across partition boundaries, and the suite's
      // default 4 partitions undersampled them (the backward-carry
      // keep-first bug survived this law until the sf0.001 sweep hit it).
      val mergeHighPart = {
        val s = graft.SharedSpark.spark
        val old = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "24")
        try run("merge") finally s.conf.set("spark.sql.shuffle.partitions", old)
      }
      mergeHighPart == run("broadcast")
    }

  property("k-nearest == brute-force dense-rank; k=1 == nearest") =
    forAll(genIvs(0L), genIvs(1000L), Gen.chooseNum(1, 4)) { (ls, rs, k) =>
      import graft.SharedSpark.spark.implicits._
      val l = ls.map(iv => (iv.key, iv.contig, iv.s, iv.e))
        .toDF("a_key", "contig", "pos_start", "pos_end")
      val r = rs.map(iv => (iv.key, iv.contig, iv.s, iv.e))
        .toDF("b_key", "contig", "pos_start", "pos_end")
      def collect(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Int)] =
        df.select("a_key", "b_key", "distance")
          .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2)))
          .sorted.toSeq
      // Reference model: all same-contig pairs, keep those whose distance
      // is among the k smallest distinct distances for that left ROW
      // (duplicate left rows each emit their set — multiset semantics).
      val want = ls.flatMap { a =>
        val cands = rs.filter(_.contig == a.contig)
          .map(b => (b.key, math.max(math.max(b.s - a.e, a.s - b.e), 0)))
        val kept = cands.map(_._2).distinct.sorted.take(k).toSet
        cands.collect { case (bk, d) if kept(d) => (a.key, bk, d) }
      }.sorted
      collect(NearestJoinOps.nearestKJoin(l, r, k)) == want &&
        collect(NearestJoinOps.nearestKJoin(l, r, 1)) ==
          collect(NearestJoinOps.nearestJoin(l, r, "broadcast"))
    }

  property("directional/signed k-nearest == brute-force model") =
    forAll(genIvs(0L), genIvs(1000L), Gen.chooseNum(1, 3),
      Gen.oneOf(true, false), Gen.oneOf("both", "upstream", "downstream"),
      Gen.oneOf(true, false)) { (ls, rs, k, io, dir, signed) =>
      import graft.SharedSpark.spark.implicits._
      val l = ls.map(iv => (iv.key, iv.contig, iv.s, iv.e))
        .toDF("a_key", "contig", "pos_start", "pos_end")
      val r = rs.map(iv => (iv.key, iv.contig, iv.s, iv.e))
        .toDF("b_key", "contig", "pos_start", "pos_end")
      val got = NearestJoinOps.nearestKJoin(l, r, k, io, dir, signed)
        .select("a_key", "b_key", "distance")
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2)))
        .sorted.toSeq
      // Model: classify each same-contig pair (upstream/-1, overlap/0,
      // downstream/+1 of the LEFT row), drop disabled classes, rank by
      // unsigned distance over distinct values, sign output from class.
      val want = ls.flatMap { a =>
        val cands = rs.filter(_.contig == a.contig).flatMap { b =>
          val d = math.max(math.max(b.s - a.e, a.s - b.e), 0)
          val side = if (d == 0) 0 else if (b.e < a.s) -1 else 1
          val keepClass = (side != 0 || !io) &&
            (side == 0 || dir == "both" ||
              (dir == "upstream" && side < 0) || (dir == "downstream" && side > 0))
          if (keepClass) Some((b.key, d, side)) else None
        }
        val kept = cands.map(_._2).distinct.sorted.take(k).toSet
        cands.collect { case (bk, d, side) if kept(d) =>
          (a.key, bk, if (signed && side < 0) -d else d)
        }
      }.sorted
      got == want
    }
}
