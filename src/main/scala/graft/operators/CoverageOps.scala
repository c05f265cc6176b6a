package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import scala.collection.mutable

/** Depth-of-coverage as RLE blocks — the reference's second flagship
  * (SURVEY §2.4 A1/A2; reference `pileup/model/Read.scala:27-54`,
  * `ContigAggregateRDD.scala:183-232`).
  *
  * Algorithm (one shuffle, no driver data volume):
  *  1. Each read `[pos_start, pos_end]` becomes two event points:
  *     `(contig, pos_start, +1)` and `(contig, pos_end+1, -1)` — a single
  *     scan via explode, so the input is read once.
  *  2. Events are range-partitioned and sorted by `(contig, pos)` — the
  *     only shuffle, and it moves 2 small rows per read, not the reads.
  *  3. Distributed prefix scan: a cheap first pass collects per-partition
  *     net deltas per contig (O(partitions) on the driver); the driver
  *     folds them into a carry-in coverage for each partition.
  *  4. Each partition streams its sorted events once, maintaining the
  *     running coverage (carry + prefix sum) and emitting maximal
  *     `(contig, pos_start, pos_end, coverage)` runs with `coverage > 0`;
  *     a run still open at partition end is closed at the next partition's
  *     first event position (driver-provided).
  *  5. A run that crosses a partition boundary *without changing coverage*
  *     comes out split in two; only first/last blocks of each partition can
  *     be affected, so the driver collects those O(partitions) rows, merges
  *     adjacent equal runs, and patches the result.
  *
  * At 100 TB this scales: the shuffle is by genome position (uniformly
  * splittable, no hot keys), every pass is partition-local, and driver
  * state is O(partitions + contigs), never O(data). The reference gets the
  * same shuffle-free property with custom partition-bound coalescing
  * (`AlignmentsRDD.repartition:207-238`); range-partitioned event points
  * are the Spark-native equivalent.
  *
  * Coverage is emitted as Int (the reference uses Short with a documented
  * ≤32767 assumption — SURVEY §7 hard parts; Int removes the overflow).
  */
object CoverageOps {

  private case class Block(contig: String, posStart: Int, posEnd: Int, coverage: Int)

  val blockSchema: StructType = StructType(Seq(
    StructField("contig", StringType, nullable = true),
    StructField("pos_start", IntegerType, nullable = false),
    StructField("pos_end", IntegerType, nullable = false),
    StructField("coverage", IntegerType, nullable = false)))

  /** Reference-covering segments of one read per its CIGAR string
    * (reference `pileup/model/Read.scala:27-54`): M/=/X consume reference
    * positions AND add coverage; D/N consume reference positions without
    * coverage (deletion / spliced intron); I/S/H/P consume none. Thin
    * test/derivation view over the single production walker
    * ([[graft.functions.CigarWalk.coverageEvents]], whose event pairs
    * `(s,+1),(e+1,-1)` are folded back into `[s,e]` segments here). */
  private[graft] def cigarCoveredSegments(posStart: Int, cigar: String): List[(Int, Int)] = {
    require(cigar != null && cigar.nonEmpty, "cigarCoveredSegments needs a CIGAR")
    val events = graft.functions.CigarWalk.coverageEvents(
      posStart, posStart, org.apache.spark.unsafe.types.UTF8String.fromString(cigar))
    (0 until events.numElements() by 2).map { i =>
      (events.getStruct(i, 2).getInt(0), events.getStruct(i + 1, 2).getInt(0) - 1)
    }.toList
  }

  /** ±1 coverage event points for a reads DataFrame, 2 rows per covered
    * segment. When a `cigar` column is present the points follow the CIGAR
    * walk via the native [[graft.functions.CigarCoverageEvents]]
    * expression (not a typed flatMap — the scan → explode → exchange
    * pipeline stays in one whole-stage-codegen span with no Dataset
    * encoder boundary; a null/empty cigar degrades to the solid
    * interval). PlanAuditSpec pins this shape. */
  private[graft] def eventPoints(reads: DataFrame): DataFrame = {
    val ev =
      if (reads.columns.contains("cigar")) {
        import org.apache.spark.sql.graft.ColumnBridge
        ColumnBridge.column(graft.functions.CigarCoverageEvents(
          ColumnBridge.expression(col("pos_start").cast("int")),
          ColumnBridge.expression(col("pos_end").cast("int")),
          ColumnBridge.expression(coalesce(col("cigar"), lit("")))))
      } else {
        array(
          struct(col("pos_start").cast("int").as("pos"), lit(1).as("delta")),
          struct((col("pos_end") + 1).cast("int").as("pos"), lit(-1).as("delta")))
      }
    reads.select(col("contig"), explode(ev).as("ev"))
      .select(col("contig"), col("ev.pos").as("pos"), col("ev.delta").as("delta"))
  }

  /** RLE coverage blocks for a reads DataFrame with
    * `(contig, pos_start, pos_end)` columns (1-based, end-inclusive).
    * When a `cigar` column is present the event points follow the CIGAR
    * walk — N/D stretches consume positions without adding coverage, so a
    * spliced read contributes two (or more) disjoint covered runs. A
    * null/empty cigar falls back to the solid `[pos_start, pos_end]`
    * interval. */
  def blocks(reads: DataFrame): DataFrame =
    scanEvents(eventPoints(reads))

  /** GATK-CallableLoci / mosdepth-thresholds style depth classification:
    * every base of each contig's covered span labeled
    * `NO_COVERAGE` (interior zero-depth gaps) / `LOW_COVERAGE`
    * (< `minDepth`) / `CALLABLE` / `EXCESSIVE_COVERAGE` (> `maxDepth`),
    * emitted as maximal same-status runs
    * `(contig, pos_start, pos_end, status)`. The span convention is the
    * same as [[graft.operators.RangeSetOps.complement]]: interior gaps
    * between the contig's first and last covered base (leading/trailing
    * reference is not reported — there is no contig-length source here).
    *
    * Scale shape: everything after [[blocks]] operates on the RLE
    * representation — output-sized, bounded by depth changes, never
    * per-base — so the per-contig windows here run over compressed runs
    * exactly like complement's (the heavy lifting is blocks' event-point
    * scan). Classification can only merge runs, never split them, so
    * the result is at most the block count plus gaps. */
  def callableLoci(reads: DataFrame, minDepth: Int = 4,
      maxDepth: Int = Int.MaxValue): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(minDepth >= 1 && maxDepth >= minDepth,
      s"need 1 <= minDepth <= maxDepth, got $minDepth/$maxDepth")
    val cls = blocks(reads).withColumn("status",
      when(col("coverage") < minDepth, lit("LOW_COVERAGE"))
        .when(col("coverage") > maxDepth, lit("EXCESSIVE_COVERAGE"))
        .otherwise(lit("CALLABLE")))
      .select(col("contig"), col("pos_start"), col("pos_end"), col("status"))
    val w = Window.partitionBy(col("contig")).orderBy(col("pos_start"))
    val gaps = cls
      .withColumn("prev_end", lag(col("pos_end"), 1).over(w))
      .withColumn("gap_start", col("prev_end") + 1)
      .withColumn("gap_end", col("pos_start") - 1)
      .filter(col("prev_end").isNotNull && col("gap_start") <= col("gap_end"))
      .select(col("contig"), col("gap_start").as("pos_start"),
        col("gap_end").as("pos_end"), lit("NO_COVERAGE").as("status"))
    // RLE over the classified runs: adjacent runs with equal status fuse
    // (neighboring depths 5 and 7 are both CALLABLE), everything else
    // stays split. Runs are disjoint by construction, so "adjacent"
    // means exactly pos_start == prev_end + 1.
    cls.unionAll(gaps)
      .withColumn("prev_status", lag(col("status"), 1).over(w))
      .withColumn("prev_end2", lag(col("pos_end"), 1).over(w))
      .withColumn("newrun",
        when(col("prev_end2").isNull || col("pos_start") =!= col("prev_end2") + 1 ||
          col("status") =!= col("prev_status"), 1L).otherwise(0L))
      .withColumn("run_id",
        sum(col("newrun")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("contig"), col("run_id"), col("status"))
      .agg(min(col("pos_start")).as("pos_start"), max(col("pos_end")).as("pos_end"))
      .select(col("contig"), col("pos_start"), col("pos_end"), col("status"))
  }

  /** Merge already-computed RLE coverage block sets into the coverage of
    * their union — the incremental-ingest path: per-batch (or per-sample)
    * blocks combine WITHOUT rescanning reads. Each block becomes two
    * event points weighted by its depth (`(start, +cov)`,
    * `(end+1, -cov)`), and the identical distributed prefix scan emits
    * the summed RLE — so `mergeCoverage(blocks(a), blocks(b)) ==
    * blocks(a ∪ b)` exactly (a law the oracle query checks). At 100 TB
    * the block sets are the compressed representation; merging N batches
    * shuffles O(blocks) rows instead of re-reading O(reads). */
  def mergeCoverage(blockSets: DataFrame*): DataFrame = {
    require(blockSets.nonEmpty, "mergeCoverage needs at least one block set")
    val events = blockSets.map(_.select(col("contig"),
        explode(array(
          struct(col("pos_start").cast("int").as("pos"),
            col("coverage").cast("int").as("delta")),
          struct((col("pos_end") + 1).cast("int").as("pos"),
            (-col("coverage")).cast("int").as("delta")))).as("ev"))
      .select(col("contig"), col("ev.pos").as("pos"), col("ev.delta").as("delta")))
      .reduce(_ unionAll _)
    scanEvents(events)
  }

  private def scanEvents(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._

    // Event generation upstream is a full input scan (often through the
    // CIGAR-walk explode). The straightforward
    // `repartitionByRange.sortWithinPartitions` ran it three times — the
    // range partitioner's bounds-sampling job, the shuffle map stage —
    // and re-sorted the exchange output once per downstream pass
    // (summaries + main RLE). Instead: persist the small event rows
    // (contig, int, int — 2 per read), so sampling and shuffle share one
    // scan, and persist the sorted result so the sort runs once with both
    // passes reading its partitions. Everything stays DataFrame-level —
    // Tungsten UnsafeRow shuffle + codegen sort; the earlier RDD-tuple
    // form paid a per-row Dataset decode plus Java-serialized shuffle
    // (measured ~2x on the 4-sample blocksBy event volume). The scan
    // passes read InternalRows and intern the contig string only when it
    // changes (events are contig-sorted, so O(contigs) allocations).
    // Persists are dropped before returning — every job needing them runs
    // eagerly in this method.
    val nShuffle = math.max(1, spark.sessionState.conf.numShufflePartitions)
    // A null contig/pos carries no coverage information (and the raw
    // InternalRow passes below assume non-null fields).
    val ev = events.na.drop().persist(StorageLevel.MEMORY_AND_DISK)
    val sortedDf = ev
      .repartitionByRange(nShuffle, col("contig"), col("pos"))
      .sortWithinPartitions(col("contig"), col("pos"))
    sortedDf.persist(StorageLevel.MEMORY_AND_DISK)
    val rdd = sortedDf.queryExecution.toRdd

    // Pass 1: per-partition (first event key, net delta per contig in order).
    case class Summary(idx: Int, first: Option[(String, Int)], perContig: Seq[(String, Long)])
    val summaries = rdd.mapPartitionsWithIndex { (idx, it) =>
      var first: Option[(String, Int)] = None
      val order = mutable.ArrayBuffer.empty[String]
      val net = mutable.HashMap.empty[String, Long]
      var curU: org.apache.spark.unsafe.types.UTF8String = null
      var cur: String = null
      it.foreach { row =>
        val c = row.getUTF8String(0)
        if (curU == null || !c.equals(curU)) { curU = c.copy(); cur = curU.toString }
        if (first.isEmpty) first = Some((cur, row.getInt(1)))
        if (!net.contains(cur)) order += cur
        net(cur) = net.getOrElse(cur, 0L) + row.getInt(2)
      }
      Iterator.single(Summary(idx, first, order.map(c => c -> net(c)).toSeq))
    }.collect().sortBy(_.idx)

    val nParts = summaries.length
    // Driver fold: carry-in coverage per partition (for its first contig)
    // and the first event key of the next non-empty partition.
    val carryIn = new Array[Long](nParts)
    val running = mutable.HashMap.empty[String, Long]
    summaries.foreach { s =>
      carryIn(s.idx) = s.first.map { case (c, _) => running.getOrElse(c, 0L) }.getOrElse(0L)
      s.perContig.foreach { case (c, d) => running(c) = running.getOrElse(c, 0L) + d }
    }
    val nextFirst = new Array[Option[(String, Int)]](nParts)
    var upcoming: Option[(String, Int)] = None
    for (i <- nParts - 1 to 0 by -1) {
      nextFirst(i) = upcoming
      if (summaries(i).first.isDefined) upcoming = summaries(i).first
    }
    val carryB = spark.sparkContext.broadcast((carryIn, nextFirst))

    // Pass 2: streaming RLE per partition. Tag first/last block per
    // partition for the boundary merge.
    val taggedRdd = rdd.mapPartitionsWithIndex { (idx, it) =>
      val (carries, nexts) = carryB.value
      val out = mutable.ArrayBuffer.empty[Block]
      var curContig: String = null
      var cov = 0L
      var blockStart = 0
      var started = false // processed at least one position group
      var lastPos = Int.MinValue

      def advance(contig: String, pos: Int, net: Long): Unit = {
        if (contig != curContig) {
          // All events of the previous contig are behind us globally, so
          // its coverage is zero here (valid intervals guarantee it).
          curContig = contig
          cov = if (!started) carries(idx) else 0L
          blockStart = pos
          cov += net
          started = true
        } else {
          val newCov = cov + net
          if (newCov != cov) {
            if (cov > 0) out += Block(curContig, blockStart, pos - 1, cov.toInt)
            blockStart = pos
            cov = newCov
          }
        }
        lastPos = pos
      }

      // Merge equal-(contig,pos) runs of events, then advance. Contig
      // strings are interned on change only (sorted input, so one
      // allocation per contig run — `eq` then suffices in the hot compare).
      var pendContig: String = null
      var pendPos = 0
      var pendNet = 0L
      var hasPend = false
      var curU: org.apache.spark.unsafe.types.UTF8String = null
      var curS: String = null
      it.foreach { row =>
        val c = row.getUTF8String(0)
        if (curU == null || !c.equals(curU)) { curU = c.copy(); curS = curU.toString }
        val contig = curS
        val pos = row.getInt(1)
        val delta = row.getInt(2)
        if (hasPend && (contig eq pendContig) && pos == pendPos) pendNet += delta
        else {
          if (hasPend) advance(pendContig, pendPos, pendNet)
          pendContig = contig; pendPos = pos; pendNet = delta; hasPend = true
        }
      }
      if (hasPend) advance(pendContig, pendPos, pendNet)
      if (started && cov > 0) {
        // Open run at partition end: closes at the next partition's first
        // event position (same contig — coverage > 0 implies more events).
        val end = nexts(idx) match {
          case Some((_, np)) => np - 1
          case None => lastPos // unreachable for valid input
        }
        out += Block(curContig, blockStart, end, cov.toInt)
      }
      val n = out.length
      out.iterator.zipWithIndex.map { case (b, i) =>
        (b.contig, b.posStart, b.posEnd, b.coverage, idx, i == 0 || i == n - 1)
      }
      // RDD-level persist (not DataFrame cache): serves both the boundary
      // collect below and the returned plan, and — unlike CacheManager
      // entries — is auto-unpersisted by the ContextCleaner once the result
      // is garbage-collected, so library callers don't leak cache blocks.
    }.persist(StorageLevel.MEMORY_AND_DISK)
    val tagged = taggedRdd.toDF("contig", "pos_start", "pos_end", "coverage", "pid", "boundary")

    // Driver boundary merge: only first/last blocks of a partition can be
    // two halves of one run. O(partitions) rows.
    val boundaryRows = tagged.filter(col("boundary")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .sortBy(b => (b._1, b._2))
    // All eager jobs are done; the returned plan reads taggedRdd only
    // (lineage survives for recompute-on-eviction).
    ev.unpersist(blocking = false)
    sortedDf.unpersist(blocking = false)
    val merged = mutable.ArrayBuffer.empty[(String, Int, Int, Int)]
    boundaryRows.foreach { b =>
      merged.lastOption match {
        case Some(last) if last._1 == b._1 && last._3 + 1 == b._2 && last._4 == b._4 =>
          merged(merged.length - 1) = (last._1, last._2, b._3, last._4)
        case _ => merged += b
      }
    }
    val mergedDf = spark.createDataFrame(
      spark.sparkContext.parallelize(merged.toSeq.map(b => Row(b._1, b._2, b._3, b._4)), 1),
      blockSchema)
    tagged.filter(!col("boundary"))
      .select(col("contig"), col("pos_start"), col("pos_end"), col("coverage"))
      .unionAll(mergedDf)
  }

  /** Per-target coverage summary (bedtools-coverage / mosdepth-regions
    * semantics): for each target interval, the summed depth over its
    * bases, the count of covered bases, and the mean depth (uncovered
    * bases count as zero). Composes the RLE [[blocks]] with the
    * interval-forest join — depth blocks are the compressed
    * representation, so the join moves O(blocks ∩ targets) rows, never
    * per-base rows; a left-outer join keeps zero-coverage targets with
    * zeros. `targets` needs `(contig, pos_start, pos_end)` plus the
    * `nameCol` identity; `(nameCol, contig, pos_start, pos_end)` must be
    * unique. */
  def targetCoverage(reads: DataFrame, targets: DataFrame,
      nameCol: String = "name"): DataFrame = {
    val b = blocks(reads).select(
      col("contig").as("_bc"), col("pos_start").as("_bs"),
      col("pos_end").as("_be"), col("coverage").as("_cov"))
    // least/greatest SKIP null operands, so on an unmatched (null-block)
    // outer row the raw clip would silently evaluate to the full target
    // length — gate the overlap on block presence explicitly.
    val ov = when(col("_bs").isNotNull,
      least(col("pos_end"), col("_be")) - greatest(col("pos_start"), col("_bs")) + 1)
    targets.join(b,
        col("contig") === col("_bc") &&
          graft.functions.IntervalOverlaps.of(
            col("pos_start"), col("pos_end"), col("_bs"), col("_be")),
        "left_outer")
      .groupBy(col(nameCol), col("contig"), col("pos_start"), col("pos_end"))
      .agg(
        coalesce(sum(ov.cast("long") * col("_cov")), lit(0L)).as("depth_sum"),
        coalesce(sum(ov.cast("long")), lit(0L)).as("covered_bases"))
      .withColumn("mean_depth",
        col("depth_sum").cast("double") /
          (col("pos_end") - col("pos_start") + 1).cast("double"))
  }

  /** RLE coverage for every group in ONE pass — `keys` (e.g. `sample_id`)
    * fold into the range-partition key, so a multi-sample corpus is
    * scanned and shuffled once instead of once per sample. Beyond the
    * reference (whose `coverage(...)` TVF takes a single sample,
    * `ResolveTableValuedFunctionsSeq.scala:119-140`): at 100 TB a
    * per-sample re-scan is N× the I/O, while one composite-key pass
    * keeps the same event-point shuffle volume (2 rows/read) and the
    * same O(partitions) driver state.
    *
    * Key columns must be non-null and free of `\u0001` (both hold for
    * sample ids and contigs; `concat_ws` would silently drop nulls). */
  def blocksBy(reads: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "blocksBy needs at least one key column")
    val sep = "\u0001"
    val passThrough = Seq(col("pos_start"), col("pos_end")) ++
      (if (reads.columns.contains("cigar")) Seq(col("cigar")) else Nil)
    val synth = reads.select(
      concat_ws(sep, (keys :+ "contig").map(col): _*).as("contig") +: passThrough: _*)
    val parts = split(col("contig"), sep)
    blocks(synth).select(
      keys.zipWithIndex.map { case (k, i) => parts.getItem(i).as(k) } ++
        Seq(parts.getItem(keys.length).as("contig"),
          col("pos_start"), col("pos_end"), col("coverage")): _*)
  }

  /** Mean coverage per fixed-size tiling window (SURVEY §2.5 W1):
    * tile = `(pos-1) / windowSize`, mean over all `windowSize` positions
    * (uncovered positions count as zero); all-zero tiles are not emitted.
    * Computed from the RLE blocks — each block contributes
    * `overlap × coverage` to the tiles it spans — so the shuffle is over
    * blocks, not positions. */
  def windowed(reads: DataFrame, windowSize: Int): DataFrame = {
    val b = blocks(reads)
    b.select(col("contig"),
        explode(sequence(
          (col("pos_start") - 1).divide(windowSize).cast("long"),
          (col("pos_end") - 1).divide(windowSize).cast("long"))).as("tile"),
        col("pos_start"), col("pos_end"), col("coverage"))
      .select(col("contig"), col("tile"),
        (least(col("pos_end"), (col("tile") + 1) * windowSize)
          - greatest(col("pos_start"), col("tile") * windowSize + 1) + 1)
          .cast("long").multiply(col("coverage")).as("contrib"))
      .groupBy(col("contig"), col("tile"))
      .agg((sum(col("contrib")) / lit(windowSize.toDouble)).as("mean_coverage"))
  }
}
