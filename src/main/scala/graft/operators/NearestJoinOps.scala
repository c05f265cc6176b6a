package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

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
  * without materializing any pair: both sides' endpoints are
  * range-partitioned and sorted by `(contig, pos)` (rights keyed by
  * start, lefts by end; 1-2 small rows per input row — the CoverageOps
  * event-point shape), then one partition-local pass tracks the running
  * max right-end (flank-left / overlap) and next right-start
  * (flank-right), with O(partitions x contigs) carry state folded on the
  * driver exactly like [[CoverageOps]]' prefix scan. Phase 2 re-joins:
  * each left interval expanded by its own distance overlap-joins the
  * right side through the engine's interval join (which picks
  * broadcast-forest or the AQE-skew-splittable bin-range rewrite from
  * stats), and the residual `distance == d*` keeps exactly the tied
  * nearest features. At 100 TB nothing collects: phase 1 shuffles
  * O(|L|+|R|) endpoint rows, phase 2's probe windows are tight by
  * construction (each widened by exactly its d*), so candidates =
  * overlaps + ties.
  *
  * Dispatch: `spark.graft.nearestjoin.method` = `auto` (default —
  * broadcast while the right side's Catalyst estimate fits
  * `spark.graft.rangejoin.maxBroadcastBytes`, else merge), `broadcast`
  * (forced — the user takes responsibility, standard hint semantics),
  * or `merge`.
  */
object NearestJoinOps {

  /** Inner nearest join: left rows on contigs absent from `right` drop
    * (no feature to be near). Output = left columns ++ right columns ++
    * `distance: Int`; both inputs need `(contig, pos_start, pos_end)`. */
  def nearestJoin(left: DataFrame, right: DataFrame): DataFrame = {
    val spark = left.sparkSession
    val maxBytes = spark.conf
      .get("spark.graft.rangejoin.maxBroadcastBytes", (256L << 20).toString).toLong
    val method = spark.conf.get("spark.graft.nearestjoin.method", "auto")
    val fits = right.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(maxBytes)
    method match {
      case "broadcast" => broadcastNearestJoin(left, right)
      case "merge" => mergeNearestJoin(left, right)
      case "auto" => if (fits) broadcastNearestJoin(left, right)
                     else mergeNearestJoin(left, right)
      case other => throw new IllegalArgumentException(
        s"spark.graft.nearestjoin.method must be auto|broadcast|merge, got '$other'")
    }
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

  /** Phase 1 of the merge regime: nearest distance per DISTINCT left
    * `(contig, pos_start, pos_end)` triple (the distance is a pure
    * function of the triple, so duplicates re-attach by equi-join).
    * Returns `(contig, pos_start, pos_end, _nd)`; triples on contigs with
    * no right rows are absent (inner semantics). */
  private[operators] def nearestDistances(left: DataFrame, right: DataFrame): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    // Endpoint rows. Sort key (contig, pos, tag): rights (tag 0) sort
    // before lefts (tag 1) at equal pos, so a right starting exactly at a
    // left's end is visible to its running-max (it overlaps: rs = le and
    // re >= rs >= ls) and correctly absent from next-right (rs > le).
    //   right -> key (contig, rs, 0), payload re
    //   left  -> key (contig, le, 1), payload ls
    val rPts = right.select(col("contig"), col("pos_start").cast("int"),
        col("pos_end").cast("int")).na.drop()
      .as[(String, Int, Int)].rdd.map { case (c, rs, re) => ((c, rs, 0), re) }
    val lPts = left.select(col("contig"), col("pos_start").cast("int"),
        col("pos_end").cast("int")).na.drop().distinct()
      .as[(String, Int, Int)].rdd.map { case (c, ls, le) => ((c, le, 1), ls) }
    val pts = rPts.union(lPts).persist(StorageLevel.MEMORY_AND_DISK)
    val nShuffle = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val partitioner = new org.apache.spark.RangePartitioner(nShuffle, pts)
    val sorted = pts.repartitionAndSortWithinPartitions(partitioner)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // O(partitions x contigs) summaries: per-contig max right-end (for the
    // forward carry) and per-contig first right-start (for the backward
    // carry), both in partition order.
    case class Summary(idx: Int, maxEnd: Seq[(String, Int)], firstRight: Seq[(String, Int)])
    val summaries = sorted.mapPartitionsWithIndex { (idx, it) =>
      val maxEnd = mutable.LinkedHashMap.empty[String, Int]
      val firstRight = mutable.LinkedHashMap.empty[String, Int]
      it.foreach {
        case ((c, pos, 0), re) =>
          if (!firstRight.contains(c)) firstRight(c) = pos
          maxEnd(c) = math.max(maxEnd.getOrElse(c, Int.MinValue), re)
        case _ =>
      }
      Iterator.single(Summary(idx, maxEnd.toSeq, firstRight.toSeq))
    }.collect().sortBy(_.idx)
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
    // Backward fold: first right-start per contig over all LATER partitions.
    val carryNext = new Array[Map[String, Int]](nParts)
    val runNext = mutable.HashMap.empty[String, Int]
    for (i <- nParts - 1 to 0 by -1) {
      carryNext(i) = runNext.toMap
      summaries(i).firstRight.foreach { case (c, p) =>
        if (!runNext.contains(c)) runNext(c) = p
      }
    }
    val carryB = spark.sparkContext.broadcast((carryMax, carryNext))

    val out = sorted.mapPartitionsWithIndex { (idx, it) =>
      val (carryMaxA, carryNextA) = carryB.value
      val cMax = carryMaxA(idx)
      val cNext = carryNextA(idx)
      val arr = it.toArray
      // Backward pass: next right-start strictly after index i, same contig.
      val nextRight = new Array[Int](arr.length)
      val pend = mutable.HashMap.empty[String, Int]
      for (i <- arr.length - 1 to 0 by -1) {
        val ((c, pos, tag), _) = arr(i)
        nextRight(i) = pend.getOrElse(c, cNext.getOrElse(c, Int.MinValue))
        if (tag == 0) pend(c) = pos
      }
      // Forward pass: running max right-end per contig; emit lefts.
      val runMaxP = mutable.HashMap.empty[String, Int]
      arr.iterator.zipWithIndex.flatMap {
        case (((c, pos, 0), re), _) =>
          runMaxP(c) = math.max(runMaxP.getOrElse(c,
            cMax.getOrElse(c, Int.MinValue)), re)
          Iterator.empty
        case (((c, le, _), ls), i) =>
          val pme = runMaxP.getOrElse(c, cMax.getOrElse(c, Int.MinValue))
          val nxt = nextRight(i)
          if (pme >= ls) Iterator.single((c, ls, le, 0)) // overlap
          else {
            val dl = if (pme == Int.MinValue) Int.MaxValue else ls - pme
            val dr = if (nxt == Int.MinValue) Int.MaxValue else nxt - le
            val d = math.min(dl, dr)
            if (d == Int.MaxValue) Iterator.empty // no right on contig
            else Iterator.single((c, ls, le, d))
          }
      }
    }.toDF("contig", "pos_start", "pos_end", "_nd")
      // Phase 2 consumes this twice conceptually (join-back + the window
      // expansion feeding the interval join); materialize via localCheckpoint
      // would lose lineage — a plain persist is dropped by ContextCleaner.
    pts.unpersist(blocking = false)
    out
  }

  /** Phase 2: attach d* to every left row, expand its window by d*, and
    * recover the tied nearest rights through the engine's interval join
    * with the `distance == d*` residual. */
  private def mergeNearestJoin(left: DataFrame, right: DataFrame): DataFrame = {
    graft.Graft.ensure(left.sparkSession)
    val dstar = nearestDistances(left, right)
    val l = left.join(dstar, Seq("contig", "pos_start", "pos_end"))
      .withColumn("_xs", col("pos_start") - col("_nd"))
      .withColumn("_xe", col("pos_end") + col("_nd"))
      .alias("l")
    val r = right.alias("r")
    l.join(r,
        col("l.contig") === col("r.contig") &&
        col("r.pos_start") <= col("l._xe") && col("r.pos_end") >= col("l._xs"))
      .filter(greatest(col("r.pos_start") - col("l.pos_end"),
        col("l.pos_start") - col("r.pos_end"), lit(0)) === col("l._nd"))
      .select(left.columns.map(c => col("l." + c)) ++
        right.columns.map(c => col("r." + c)) :+
        col("l._nd").cast("int").as("distance"): _*)
  }
}
