package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

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
  * Shape: the right side is collected size-gated against the engine's
  * broadcast budget and assembled into the same per-contig
  * [[IntervalForest]] the overlap join broadcasts, augmented with a
  * prefix-max-end array that answers nearest-distance in pure O(log n)
  * (no tree walk: overlap exists iff the max end among `starts <= qe`
  * reaches `qs`, else the flanking candidates are that max end and the
  * first start right of `qe`). The left side is probed in place — it
  * never shuffles, never sorts, the identical scale property as
  * BroadcastForestMode. A both-sides-large nearest join would need an
  * expanding bin-range search; the gate fails loudly with that guidance
  * rather than silently collecting an oversized build side.
  *
  * The probe runs entirely on `InternalRow`: build rows are collected as
  * `UnsafeRow`s off `queryExecution.toRdd`, each output pair is stitched
  * with a reused [[JoinedRow]] chain and flattened by one
  * [[UnsafeProjection]] — no external-`Row` conversion, no
  * `Encoders.row` round-trip anywhere in the hot loop (that earlier
  * shape made nearest ~2.5x the cost of the equivalent overlap join on
  * identical output).
  */
object NearestJoinOps {

  /** Inner nearest join: left rows on contigs absent from `right` drop
    * (no feature to be near). Output = left columns ++ right columns ++
    * `distance: Int`; both inputs need `(contig, pos_start, pos_end)`. */
  def nearestJoin(left: DataFrame, right: DataFrame): DataFrame = {
    val spark = left.sparkSession
    val maxBytes = spark.conf
      .get("spark.graft.rangejoin.maxBroadcastBytes", (256L << 20).toString).toLong
    val estimated = right.queryExecution.optimizedPlan.stats.sizeInBytes
    require(estimated <= BigInt(maxBytes),
      s"nearestJoin build side is estimated at $estimated bytes, over " +
      s"spark.graft.rangejoin.maxBroadcastBytes=$maxBytes — it is collected and " +
      "broadcast as a per-contig interval forest. Filter/project it down, or " +
      "raise the conf if the driver can hold it.")

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
}
