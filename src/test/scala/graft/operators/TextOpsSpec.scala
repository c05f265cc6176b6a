package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Winnowing fingerprint laws (the guarantees of the
  * Schleimer–Wilkerson–Aiken scheme the operator implements). */
class TextOpsSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import graft.SharedSpark.spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def fps(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    TextOps.winnowFingerprints(df).collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }

  test("identical normalized texts fingerprint identically") {
    val m = fps(docs(
      1L -> "The quick  brown fox jumps over the lazy dog",
      2L -> "  the QUICK brown   fox jumps over the lazy DOG  "))
    assert(m(1L) === m(2L))
    assert(m(1L).nonEmpty)
  }

  test("a shared substring of length >= w+k-1 yields a shared fingerprint") {
    // k=5, w=4: any shared run of >= 8 normalized chars must share a fp.
    val shared = "unmistakable shared passage of text"
    val m = fps(docs(
      1L -> s"first document prefix $shared first suffix",
      2L -> s"совершенно другой старт $shared другое окончание"))
    assert((m(1L) & m(2L)).nonEmpty)
  }

  test("disjoint-alphabet documents share nothing") {
    val m = fps(docs(1L -> "aaaa bbbb cccc dddd eeee", 2L -> "xxxx yyyy zzzz wwww vvvv"))
    assert((m(1L) & m(2L)).isEmpty)
  }

  test("density: winnowed set is a subset of gram count, at most one per window") {
    val text = "some moderately long document used for the density bound " * 3
    val m = fps(docs(1L -> text))
    val len = docs(1L -> text).select(length(DedupOps.normText(lit(text)))).head().getInt(0)
    val grams = len - 5 + 1
    assert(m(1L).size <= grams - 4 + 1) // one fp per window max (distinct)
    assert(m(1L).nonEmpty)
  }

  test("winnowPairs pairs passage-sharing docs, exact counts, df-filtered") {
    val passage = "a very distinctive stolen paragraph that appears verbatim in two documents"
    val boiler = "standard header every file carries" // df = all docs → filtered out
    val rows = (1L -> s"$boiler alpha beta gamma delta unique one $passage") +:
      (2L -> s"$boiler epsilon zeta eta theta unique two $passage") +:
      (3L to 40L).map(i => i -> s"$boiler wholly unrelated content number $i${"x" * i.toInt}")
    val pairs = DedupOps.winnowPairs(docs(rows: _*)).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // Only the passage-sharing pair survives (boilerplate fps are beyond
    // the 5% df cutoff; per-doc fillers share nothing >= w+k-1 chars).
    assert(pairs.keySet === Set((1L, 2L)))
    assert(pairs((1L, 2L)) >= 3L)
  }

  test("assignSplits: deterministic, partition-invariant, weight-proportioned") {
    import graft.SharedSpark.spark.implicits._
    val d = graft.SharedSpark.spark.range(20000).toDF("doc_id")
    def counts(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      TextOps.assignSplits(df).groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = counts(d)
    assert(a === counts(d.repartition(13))) // no RNG, no order dependence
    assert(a.keySet === Set("train", "val", "test"))
    assert(math.abs(a("train") / 20000.0 - 0.9) < 0.01)
    // Same key → same split even from a different frame.
    val one = TextOps.assignSplits(Seq(42L).toDF("doc_id")).select("split").head().getString(0)
    val again = TextOps.assignSplits(d.filter($"doc_id" === 42L)).select("split").head().getString(0)
    assert(one === again)
  }

  test("tokenNgrams: exact sliding windows, sub-n docs contribute nothing") {
    import graft.SharedSpark.spark.implicits._
    val d = Seq((1L, "A b c d"), (2L, "xy")).toDF("doc_id", "text")
    val grams = TextOps.tokenNgrams(d, 3).as[(Long, String)].collect().toSet
    assert(grams === Set((1L, "a b c"), (1L, "b c d")))
  }

  test("contaminationReport: planted overlap counted, clean docs report zero") {
    import graft.SharedSpark.spark.implicits._
    val corpus = Seq((1L, "p q r s t"), (2L, "u v w x y"), (3L, "too short"))
      .toDF("doc_id", "text")
    val eval = Seq((100L, "q r s zz")).toDF("doc_id", "text")
    val rep = TextOps.contaminationReport(corpus, eval, n = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rep(1L) === ((3L, 1L))) // "q r s" is the one contaminated gram
    assert(rep(2L) === ((3L, 0L)))
    // Sub-n docs still appear: 0 grams checked, not silently missing.
    assert(rep(3L) === ((0L, 0L)))
  }

  test("contaminationReportBloom: bit-identical to the exact report on real data") {
    val docs = graft.Tables.documents(spark, sf0001)
    val corpus = docs.filter(org.apache.spark.sql.functions.col("source") =!= "src0")
    val eval = docs.filter(org.apache.spark.sql.functions.col("source") === "src0")
    val exact = TextOps.contaminationReport(corpus, eval).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bloom = TextOps.contaminationReportBloom(corpus, eval).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bloom === exact)
    assert(exact.exists(_._3 > 0L), "fixture should contain some contamination")
  }

  test("contaminationReportBloom: oversized eval cardinality fails loudly") {
    import graft.SharedSpark.spark.implicits._
    val d = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextOps.contaminationReportBloom(d, d, expectedGrams = Long.MaxValue / 4)
    }
    assert(e.getMessage.contains("maxBroadcastBytes"))
  }

  test("repetitionStats: duplicate-2gram fraction, degenerate docs give 0.0") {
    import graft.SharedSpark.spark.implicits._
    val d = Seq((1L, "x x x y"), (2L, "a b c"), (3L, "solo")).toDF("doc_id", "text")
    val m = TextOps.repetitionStats(d).as[(Long, Int, Int, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(m(1L) === ((3, 2, 1.0 / 3))) // grams: x x, x x, x y
    assert(m(2L) === ((2, 2, 0.0)))
    assert(m(3L) === ((0, 0, 0.0)))
  }

  test("sampleByStratum: rate-1 keeps all, rate-0 drops all, deterministic and proportional") {
    import graft.SharedSpark.spark.implicits._
    val d = graft.SharedSpark.spark.range(9000)
      .select(col("id").as("doc_id"),
        concat(lit("s"), (col("id") % 3).cast("string")).as("source"))
    def kept(df: org.apache.spark.sql.DataFrame): Set[Long] =
      TextOps.sampleByStratum(df, Map("s0" -> 1.0, "s1" -> 0.0), 0.5)
        .select("doc_id").as[Long].collect().toSet
    val k = kept(d)
    assert(k === kept(d.repartition(17))) // deterministic, order-free
    assert(k.count(_ % 3 == 0) === 3000) // s0 all kept
    assert(!k.exists(_ % 3 == 1)) // s1 dropped
    val s2 = k.count(_ % 3 == 2)
    assert(math.abs(s2 / 3000.0 - 0.5) < 0.05) // default rate ~50%
  }

  test("lineDedup strips cross-document boilerplate, keeps unique prose in order") {
    import graft.SharedSpark.spark.implicits._
    val boiler = (1 to 20).map(i => s"nav$i").mkString(" ")       // one exact chunk
    val uniqueA = (1 to 20).map(i => s"alpha$i").mkString(" ")
    val uniqueB = (1 to 20).map(i => s"beta$i").mkString(" ")
    val docs = Seq(
      (1L, s"$boiler $uniqueA"),   // boilerplate header + unique body
      (2L, s"$boiler $uniqueB"),
      (3L, uniqueA.toUpperCase)    // same words as A but only this doc (normalized equal!)
    ).toDF("doc_id", "text")
    // doc 3 normalizes to doc 1's body chunk -> df 2 -> both stripped.
    val out = TextOps.lineDedup(docs, maxDf = 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out(0) === ((1L, "", 0L, 2L)))          // header df=2, body df=2 (doc 3)
    assert(out(1) === ((2L, uniqueB, 1L, 1L)))     // header stripped, body kept
    assert(out(2) === ((3L, "", 0L, 1L)))
    // With maxDf = 2 everything but nothing... header df=2 <= 2: all kept.
    val lax = TextOps.lineDedup(docs, maxDf = 2).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(lax === Map(1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("shardForTraining: balanced shards, stable interleave, files round-trip in ord order") {
    import graft.SharedSpark.spark.implicits._
    val d = graft.SharedSpark.spark.range(8000).toDF("doc_id")
    val sharded = TextOps.shardForTraining(d, nShards = 8)
    val counts = sharded.groupBy("shard").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet === (0 until 8).toSet)
    assert(counts.values.forall(c => math.abs(c - 1000.0) < 150), s"balanced-ish: $counts")
    // Interleave order is a property of the key, not the frame.
    val o1 = sharded.filter($"doc_id" === 7).select("ord").head().getLong(0)
    val o2 = TextOps.shardForTraining(d.repartition(11), 8)
      .filter($"doc_id" === 7).select("ord").head().getLong(0)
    assert(o1 === o2)
    // The written files preserve the hash-interleaved order per shard.
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    TextOps.writeTrainingShards(d, out, nShards = 4)
    val back = graft.SharedSpark.spark.read.parquet(out)
    assert(back.count() === 8000)
    assert(back.select("shard").distinct().count() === 4)
    val shard0 = graft.SharedSpark.spark.read
      .parquet(s"$out/shard=0").select("ord").as[Long].collect()
    assert(shard0.toSeq === shard0.sorted.toSeq, "within-file order is the interleave order")
  }

  test("piiStats/redactPii: planted PII redacted and counted by class") {
    import graft.SharedSpark.spark.implicits._
    val d = Seq(
      (1L, "contact alice.smith+x@example.co.uk or 10.0.0.1 today"),
      (2L, "call +123 456-7890 card 4111111111111111 ok"),
      (3L, "clean document with no identifiers at all")).toDF("doc_id", "text")
    val stats = TextOps.piiStats(d).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    // Columns: (n_emails, n_ips, n_numbers, n_phones).
    assert(stats(1L) === ((1, 1, 0, 0)))
    assert(stats(2L) === ((0, 0, 1, 1)))
    assert(stats(3L) === ((0, 0, 0, 0)))
    val redacted = d.select($"doc_id", TextOps.redactPii($"text").as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(redacted(1L) === "contact <EMAIL> or <IP> today")
    assert(redacted(2L) === "call <PHONE> card <NUMBER> ok")
    assert(redacted(3L) === "clean document with no identifiers at all")
  }

  test("resampleByWeight: expected multiplicity, zero drops, deterministic") {
    import graft.SharedSpark.spark.implicits._
    val d = graft.SharedSpark.spark.range(9000)
      .select(col("id").as("doc_id"),
        concat(lit("s"), (col("id") % 3).cast("string")).as("source"))
    val out = TextOps.resampleByWeight(d, Map("s0" -> 2.5, "s1" -> 0.0))
    val bySource = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!bySource.contains("s1"))
    assert(bySource("s2") === 3000L) // weight 1.0: exactly once
    assert(math.abs(bySource("s0") - 7500.0) < 400, s"~2.5x: ${bySource("s0")}")
    // Per-key determinism: same counts on a reshuffled frame.
    val again = TextOps.resampleByWeight(d.repartition(13), Map("s0" -> 2.5, "s1" -> 0.0))
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === bySource)
    // Copy indices are 1..n per key.
    val copies = out.filter($"doc_id" === 0L).select("copy").as[Long].collect().sorted
    assert(copies.head === 1L && copies.toSeq === (1L to copies.length).toSeq)
  }

  test("topTerms: rare repeated tokens outrank common ones, ranks 1..k") {
    import graft.SharedSpark.spark.implicits._
    val d = Seq(
      (1L, "rare rare common common common"),
      (2L, "common common other"),
      (3L, "common unrelated words here")).toDF("doc_id", "text")
    val top = TextOps.topTerms(d, k = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    // doc 1: "rare" tf=2 df=1 → score 6; "common" tf=3 df=3 → score 3.
    assert(top((1L, 1)) === "rare")
    assert(top((1L, 2)) === "common")
    // doc 2: "other" tf=1 df=1 → 3; "common" tf=2 df=3 → 2.
    assert(top((2L, 1)) === "other")
    assert(top((2L, 2)) === "common")
  }

  test("unigramSurprisal: hand-computed bit gaps, boilerplate scores below rare text") {
    import graft.SharedSpark.spark.implicits._
    val d = Seq(
      (1L, "the the the the"), // 4x the most frequent token
      (2L, "the zyx"), //         one common + one hapax
      (3L, "qqq www")) //         two hapaxes
      .toDF("doc_id", "text")
    // Corpus: total=8 tokens (bits 4); tf: the=5 (bits 3), each hapax=1 (bits 1).
    val got = TextOps.unigramSurprisal(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) === ((4L, 4L, 1.0))) //  4 x (4-3)
    assert(got(2L) === ((2L, 4L, 2.0))) //  (4-3) + (4-1)
    assert(got(3L) === ((2L, 6L, 3.0))) //  2 x (4-1)
    // The quality-proxy ordering the filter relies on.
    assert(got(1L)._3 < got(2L)._3 && got(2L)._3 < got(3L)._3)
  }

  test("documents shorter than k chars produce no rows; shorter than w grams one window") {
    val m = fps(docs(1L -> "abc", 2L -> "abcdef"))
    assert(!m.contains(1L)) // 3 chars < k=5: no grams
    assert(m(2L).size === 1) // 2 grams < w=4: single whole-text window
  }

  test("tokenizeEncode: rank by frequency then lexicographic, OOV = -1, position order kept") {
    // tf: b=3, a=2, c=2, z=1. vocabSize=3 keeps b(0), a(1), c(2); z is OOV.
    val d = docs(
      1L -> "a b c",
      2L -> "b b a c",
      3L -> "z  B") // double space + case: normalization folds both
    val got = TextOps.tokenizeEncode(d, vocabSize = 3).collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((Seq(1, 0, 2), 3L, 0L)))
    assert(got(2L) === ((Seq(0, 0, 1, 2), 4L, 0L)))
    assert(got(3L) === ((Seq(-1, 0), 2L, 1L)))
  }

  test("chunkDocuments: overlapping windows tile the token stream; short tail kept") {
    // 10 tokens, chunk=4, overlap=1 (stride 3): starts 0,3,6,9 ->
    // [t0..t3], [t3..t6], [t6..t9], [t9] (tail shorter than a window).
    val d = docs(1L -> (0 until 10).map(i => s"t$i").mkString(" "), 2L -> "   ")
    val got = TextOps.chunkDocuments(d, chunkTokens = 4, overlapTokens = 1).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq === Seq(
      (1L, 0, 4, "t0 t1 t2 t3"),
      (1L, 1, 4, "t3 t4 t5 t6"),
      (1L, 2, 4, "t6 t7 t8 t9"),
      (1L, 3, 1, "t9")))
    // every consecutive pair shares exactly `overlap` tokens
    got.sliding(2).foreach {
      case Array((_, _, _, a), (_, _, n2, b)) if n2 == 4 =>
        assert(a.split(" ").takeRight(1).toSeq === b.split(" ").take(1).toSeq)
      case _ => ()
    }
  }

  test("piiScrub: counts per category, redaction leaves no residual match") {
    val d = docs(
      1L -> "write a@b.io or admin@site.example.com, call 555-1234, host 10.0.0.1",
      2L -> "no pii here, 555-12 is not a phone and 1.2.3 is not an ip",
      3L -> "double 555-0000 555-9999 and 192.168.0.255")
    val got = TextOps.piiScrub(d).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))))
      .toMap
    assert(got(1L)._1 === 2 && got(1L)._2 === 1 && got(1L)._3 === 1)
    assert(got(2L) === ((0, 0, 0, got(2L)._4)))
    assert(got(3L)._2 === 2 && got(3L)._3 === 1)
    // Redacted text carries placeholders and no residual matches.
    assert(got(1L)._4 === "write [EMAIL] or [EMAIL], call [PHONE], host [IP]")
    got.values.foreach { case (_, _, _, red) =>
      Seq(TextOps.EmailRe, TextOps.PhoneRe, TextOps.Ipv4Re).foreach { re =>
        assert(!re.r.findFirstIn(red).isDefined, s"residual match in '$red'")
      }
    }
  }

  test("tokenizeEncode: whitespace-only docs drop out; n_oov counts every miss") {
    val d = docs(1L -> "   ", 2L -> "q w e r")
    val got = TextOps.tokenizeEncode(d, vocabSize = 2).collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getLong(3)))).toMap
    assert(!got.contains(1L))
    // vocab keeps e(0), q(1) (all tf=1, lexicographic): w and r are OOV.
    assert(got(2L) === ((Seq(1, -1, 0, -1), 2L)))
  }
}
