package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pileup aggregation (SURVEY §2.4 A3/A4): per-position ref/non-ref
  * counts, alt-base count map, and base-quality renderings at every
  * position where at least one read carries a mismatch. The reference
  * derives mismatches by MD-tag parsing (`pileup/MDTagParser.scala:19-67`)
  * and accumulates `IntMap[pos → Map[base → count]]` per partition; here
  * mismatch positions are columns on the reads table and the accumulation
  * is a two-level hash aggregation — shuffle keyed by (contig, pos),
  * uniformly distributed, no driver state.
  *
  * Total depth at each alt position comes from joining the RLE coverage
  * blocks with the engine's own interval-forest join (point-in-block,
  * broadcast of the small alt-position side) — the pileup path exercises
  * the flagship join rather than recomputing coverage.
  *
  * Alts/quals are emitted as canonical sorted strings (the contract the
  * reference's `altmap_to_str`/`qualsmap_to_str` UDFs provide for
  * golden-file comparison, `pileup/udfs/AltFunctions.scala:15-21`).
  */
object PileupOps {

  /** Per-alt-position pileup for a reads DataFrame carrying
    * (contig, pos_start, pos_end, has_alt, alt_pos, alt_base, base_qual).
    * Output: (contig, pos, coverage, count_ref, count_nonref, alts, quals).
    *
    * `qualsBinSize` (SURVEY §2.4 A5, reference
    * `pileup/PileupStrategy.scala:110-118`) coarsens the quality axis:
    * each base quality is floored to its bin (`qual div binSize`) before
    * rendering, shrinking distinct qual entries per position. */
  def pileup(reads: DataFrame, qualsBinSize: Option[Int] = None): DataFrame = {
    val spark = reads.sparkSession
    graft.Graft.ensure(spark)

    val qual = qualsBinSize match {
      case Some(b) => expr(s"base_qual div $b").cast("int")
      case None => col("base_qual")
    }
    // Level 1: per (contig, pos, base) — count + sorted qual rendering.
    val perBase = reads.filter(col("has_alt"))
      .select(col("contig"), col("alt_pos").as("pos"), col("alt_base").as("base"), qual.as("q"))
      .groupBy(col("contig"), col("pos"), col("base"))
      .agg(count(lit(1)).as("cnt"),
        array_join(array_sort(collect_list(col("q"))), "+").as("quals_b"))

    // Level 2: per (contig, pos) — canonical sorted alt/qual strings.
    val perPos = perBase
      .groupBy(col("contig"), col("pos"))
      .agg(sum(col("cnt")).as("count_nonref"),
        array_join(transform(array_sort(collect_list(struct(col("base"), col("cnt")))),
          x => concat(x.getField("base"), lit(" -> "), x.getField("cnt"))), ", ").as("alts"),
        array_join(transform(array_sort(collect_list(struct(col("base"), col("quals_b")))),
          x => concat(x.getField("base"), lit(":"), x.getField("quals_b"))), " ").as("quals"))

    // Depth lookup: point-in-block interval join against coverage blocks
    // (plans as IntervalForestJoin; perPos is the small broadcast side).
    val blocks = CoverageOps.blocks(reads)
    perPos.as("p").join(blocks.as("b"),
        expr("p.contig = b.contig AND p.pos >= b.pos_start AND p.pos <= b.pos_end"))
      .select(col("p.contig").as("contig"), col("p.pos").as("pos"),
        col("b.coverage").as("coverage"),
        (col("b.coverage").cast("long") - col("count_nonref")).as("count_ref"),
        col("count_nonref"), col("alts"), col("quals"))
  }
}
