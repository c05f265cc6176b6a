package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** samtools-mpileup format converters (SURVEY §2.9 C1 — the reference's
  * `pileup/converters/samtools/SamtoolsConverter.scala:13-237` /
  * `SamtoolsSchema.scala`): the text format `samtools mpileup` emits —
  * one row per covered position, `(contig, pos, ref, coverage,
  * pileup-string, quality-string)` where the pileup string spells each
  * covering base (`.`/`,` = ref match, letters = alts, `^X`/`$` read
  * start/end marks, `+n<seq>`/`-n<seq>` indels, `*` deleted base) and the
  * quality string carries one `chr(q+33)` per base.
  *
  * Both directions, Spark-first:
  *  - [[toMpileup]] renders the engine's map-schema pileup
  *    ([[PileupOps.pileupMaps]]) into canonical mpileup rows as PURE
  *    column expressions — codegen'd, scan speed, fully DuckDB-mirrorable
  *    (oracle `pileup_format_samtools`). Canonical order: ref matches
  *    first, then alt bases ascending, each base's quals ascending.
  *  - [[fromMpileup]] parses mpileup rows back into the map schema in a
  *    distributed per-row kernel — the reference's converter semantics
  *    (mark stripping `PileupStringUtils`, indel consumption, `*`
  *    removal, `.`/`,` → ref) without its driver-side block compressor
  *    (`SamtoolsConverter.generateCompressedOutput:145-235` collects the
  *    WHOLE table to the driver; here blocks come from composing with
  *    [[Converters.perBaseToBlocks]], which stays distributed).
  *
  * [[fromGatkPileup]] covers the second text flavor the reference
  * converts (`converters/gatk/GatkConverter.scala`) — GATK Pileup walker
  * rows, no quality string.
  *
  * Round-trip law (tested): `fromMpileup(toMpileup(pm)) == pm` on every
  * pileupMaps frame. Cross-position deletion transfer — the reference's
  * `DelTransfer` coverage adjustment at loci FOLLOWING a deletion — is
  * [[delTransfer]]: span extraction is per-row, the per-locus overlap
  * count is an interval join, so the correction is distributed where the
  * reference's is a driver-sequential mutable context.
  */
object MpileupOps {

  /** Dense-histogram quality map rendered per base, quals ascending —
    * chr(q+33), repeated per occurrence. */
  private def qualsRender = {
    val perBase = (e: org.apache.spark.sql.Column) =>
      array_join(transform(sequence(lit(0), size(e.getField("value")) - 1),
        i => repeat(chr(i + 33), element_at(e.getField("value"), i + 1).cast("int"))), "")
    (m: org.apache.spark.sql.Column) =>
      array_join(transform(array_sort(map_entries(m)), perBase), "")
  }

  /** Render the reference-schema pileup (contig, pos, ref, coverage,
    * count_ref, count_nonref, alts map<tinyint,smallint>,
    * quals map<tinyint,array<smallint>>) as mpileup text rows:
    * `(contig, pos, ref, coverage, pileup, quals)`. Ref-match quality is
    * not tracked by the engine (quals attach to alts only), so ref
    * positions render the fixed placeholder `I` (Q40) — documented,
    * deterministic, and consumed-but-ignored by [[fromMpileup]]. */
  def toMpileup(pileupMaps: DataFrame): DataFrame = {
    val altsStr = array_join(
      transform(array_sort(map_entries(col("alts"))),
        e => repeat(chr(e.getField("key").cast("int")), e.getField("value").cast("int"))), "")
    pileupMaps.select(
      col("contig"), col("pos"), col("ref"), col("coverage"),
      concat(repeat(lit("."), col("count_ref").cast("int")), altsStr).as("pileup"),
      concat(repeat(lit("I"), col("count_ref").cast("int")),
        qualsRender(col("quals"))).as("quals"))
  }

  /** GATK-pileup text parity (reference
    * `pileup/converters/gatk/GatkConverter.scala:13-50` /
    * `GatkSchema.scala`): rows `(contig, pos, ref, coverage, pileup)` —
    * the space-delimited GATK Pileup walker output, which carries NO
    * quality string — parsed into the engine's map schema. Reference
    * semantics: per-base counts are raw character counts of
    * `A/C/G/T/N` (case kept as distinct alt keys when `caseSensitive`,
    * folded to upper otherwise), `coverage` is the pileup string length,
    * `ref` uppercased, contig normalized, `quals` null.
    *
    * Unlike the reference — which `collect()`s the WHOLE table to the
    * driver and rebuilds a DataFrame (`GatkConverter.scala:47`) — this is
    * pure column expressions: codegen'd, distributed, and mirrored by a
    * DuckDB oracle (`pileup_format_gatk`). */
  def fromGatkPileup(rows: DataFrame, caseSensitive: Boolean = true): DataFrame = {
    val p = if (caseSensitive) col("pileup") else upper(col("pileup"))
    val baseChars = if (caseSensitive) "ACGTNacgtn" else "ACGTN"
    def countOf(ch: Char) =
      length(p) - length(replace(p, lit(ch.toString), lit("")))
    val entries = baseChars.map { ch =>
      struct(lit(ch.toByte).as("key"),
        least(countOf(ch), lit(32767)).cast("smallint").as("value"))
    }
    val alts = filter(array(entries: _*), e => e.getField("value") > 0)
    val nonref = baseChars.map(countOf).reduce(_ + _).cast("long")
    val stripped = when(col("contig").startsWith("chr"),
      col("contig").substr(lit(4), lit(Int.MaxValue))).otherwise(col("contig"))
    rows.select(
      when(stripped === "M", lit("MT")).otherwise(stripped).as("contig"),
      col("pos").cast("int").as("pos"),
      upper(col("ref")).as("ref"),
      length(p).cast("int").as("coverage"),
      (countOf('.') + countOf(',')).cast("long").as("count_ref"),
      nonref.as("count_nonref"),
      when(size(alts) > 0, map_from_entries(alts)).as("alts"),
      lit(null).cast("map<tinyint,array<smallint>>").as("quals"))
  }

  /** Deletion spans declared by `-n<seq>` markers in the pileup strings:
    * one `(contig, d_start, d_end)` row per occurrence with n > 0,
    * spanning the n loci FOLLOWING the anchor position — the loci where
    * samtools prints `*` for the deleted read and still counts it in the
    * raw coverage column. Per-row parse, no cross-row state. */
  private[graft] def deletionSpans(rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col("contig"), col("pos").cast("int"), col("pileup"))
      .as[(String, Int, String)]
      .flatMap { case (contig, pos, p) =>
        val spans = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
        var i = 0
        while (i < p.length) {
          p.charAt(i) match {
            case '^' => i += 2
            case '+' | '-' =>
              val isDel = p.charAt(i) == '-'
              var j = i + 1
              var n = 0
              while (j < p.length && p.charAt(j).isDigit) { n = n * 10 + (p.charAt(j) - '0'); j += 1 }
              if (isDel && n > 0) spans += ((contig, pos + 1, pos + n))
              i = j + n
            case _ => i += 1
          }
        }
        spans
      }
      .toDF("contig", "d_start", "d_end")
  }

  /** The reference's DelTransfer coverage correction (reference
    * `DelTransfer.scala:5-34` wired through
    * `SamtoolsConverter.generateAltsQuals:105-134`), distributed:
    * samtools' raw coverage column counts the `*` placeholders of reads
    * whose deletion spans a locus, so each locus' coverage is reduced by
    * the number of `-n<seq>` spans (declared at EARLIER rows) that cover
    * it. The reference threads a mutable `DelContext` through a
    * sequential row scan — correct only single-threaded, O(dels) scanned
    * per locus. Here the spans are parsed per-row ([[deletionSpans]]) and
    * the per-locus overlap count is an interval join of loci against
    * spans — planned by the engine's own forest/bin-range strategy, so
    * the correction distributes and survives any partitioning.
    *
    * Input needs `(contig, pos, coverage, pileup)`; all columns pass
    * through with `coverage` adjusted. */
  def delTransfer(rows: DataFrame): DataFrame = {
    val dels = deletionSpans(rows)
    val loci = rows.select(col("contig").as("l_contig"), col("pos").cast("int").as("l_pos"))
    val counts = loci.join(dels,
        col("l_contig") === col("contig") &&
        col("l_pos") >= col("d_start") && col("l_pos") <= col("d_end"))
      .groupBy(col("l_contig"), col("l_pos"))
      .agg(count(lit(1)).as("del_cov"))
    val covAdj = (col("coverage") - coalesce(col("del_cov"), lit(0))).cast("int")
    rows.join(counts,
        rows("contig") === col("l_contig") && rows("pos").cast("int") === col("l_pos"),
        "left")
      .select(rows.columns.map {
        case "coverage" => covAdj.as("coverage")
        case c => rows(c)
      }: _*)
  }

  /** Parse mpileup rows `(contig, pos, ref, pileup, quals)` into the
    * engine's map schema. Counts derive from the STRING (the trustworthy
    * source), not the coverage column: `coverage = ref matches + alt
    * bases` after removing marks/indels/deleted bases — the reference's
    * post-cleaning count. Lowercase (minus-strand) bases fold to upper,
    * as the reference's caseSensitive=false path. Per-row kernel, no
    * cross-row state, any partitioning. */
  def fromMpileup(rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col("contig"), col("pos").cast("int"), col("ref"),
        col("pileup"), col("quals"))
      .as[(String, Int, String, String, String)]
      .map { case (contig, pos, ref, p, q) =>
        var i = 0
        var qi = 0
        var refCount = 0L
        val altCounts = scala.collection.mutable.TreeMap.empty[Byte, Long]
        val altQuals = scala.collection.mutable.TreeMap.empty[Byte, scala.collection.mutable.ArrayBuffer[Int]]
        while (i < p.length) {
          p.charAt(i) match {
            case '^' => i += 2 // caret + mapq char; no base, no qual
            case '$' => i += 1 // end mark; no base, no qual
            case '+' | '-' => // indel attached to the previous base: skip
              var j = i + 1
              var n = 0
              while (j < p.length && p.charAt(j).isDigit) { n = n * 10 + (p.charAt(j) - '0'); j += 1 }
              i = j + n
            case '*' => qi += 1; i += 1 // deleted base: consumes a qual, not counted
            case '.' | ',' => refCount += 1; qi += 1; i += 1
            case c =>
              val b = c.toUpper.toByte
              altCounts.update(b, altCounts.getOrElse(b, 0L) + 1L)
              altQuals.getOrElseUpdate(b, scala.collection.mutable.ArrayBuffer.empty) +=
                (q.charAt(qi) - 33)
              qi += 1; i += 1
          }
        }
        val countNonref = altCounts.values.sum
        val alts = altCounts.map { case (b, n) => b -> math.min(n, 32767L).toShort }.toMap
        val quals = altQuals.map { case (b, qs) =>
          val hist = new Array[Short](qs.max + 1)
          qs.foreach { v =>
            if (hist(v) < 32767) hist(v) = (hist(v) + 1).toShort
          }
          b -> hist.toSeq
        }.toMap
        (contig, pos, ref, (refCount + countNonref).toInt, refCount, countNonref,
          if (alts.nonEmpty) alts else null,
          if (quals.nonEmpty) quals else null)
      }
      .toDF("contig", "pos", "ref", "coverage", "count_ref", "count_nonref", "alts", "quals")
  }
}
