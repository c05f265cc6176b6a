package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Variant normalization — the vt/bcftools-norm algorithm (Tan et al.
  * 2015, "Unified representation of genetic variants"): every indel is
  * rewritten to its unique left-aligned, parsimonious form so that
  * equivalent variants compare equal across callers. The reference
  * engine stops at variant SCANS (SURVEY §2.1 S3/S4); normalization is
  * the first thing every downstream VCF pipeline does with them.
  *
  * Two phases, exactly the published algorithm:
  *
  *  1. While the alleles end with the same base: if both are longer
  *     than one base, truncate the shared last base; otherwise EXTEND
  *     LEFT — prepend the reference-genome base at `pos - 1` to both
  *     alleles and decrement `pos` (this is what shifts an indel
  *     through a repeat run to its leftmost representation), stopping
  *     at the contig start.
  *  2. While both alleles are longer than one base and share their
  *     first base, truncate it and increment `pos` (parsimony).
  *
  * The genome lookups go through [[MockReference]] (the deterministic
  * FASTA stand-in — a real deployment swaps in a broadcast genome, same
  * per-row probe shape, see MockReference's scaladoc), which is what
  * makes the DuckDB oracle exact: the identical recursive rewrite runs
  * against the identical coordinate-function reference.
  *
  * Scale shape: one typed map over the variants, zero shuffles, no
  * driver state; per-row work is bounded by allele length plus the
  * left-shift distance (repeat run length in a real genome). */
object VariantOps {

  /** [[MockReference.refBase]] as a plain Scala function for the typed
    * kernel: `base(contig, pos) = "ACGT"[(ascii(contig) + pos) mod 4]`. */
  private def mockBase(contig: String, pos: Int): Char = {
    val a = if (contig.isEmpty) 0 else contig.charAt(0).toInt
    "ACGT".charAt(((a + pos) % 4 + 4) % 4)
  }

  /** bcftools `norm -m-` multi-allelic decomposition: a row whose `alt`
    * carries comma-separated alleles becomes one row per allele,
    * `allele_idx` preserving the original order (1-based, matching VCF
    * GT indices). Pure codegen split+posexplode — scan speed, zero
    * shuffles; compose with [[normalize]] for the full
    * `norm -m- && norm` pipeline (each split allele then left-aligns
    * independently, which is the entire point of decomposing first). */
  def splitMultiallelic(variants: DataFrame): DataFrame =
    variants.select(col("variant_id"), col("contig"), col("pos_start"), col("ref"),
        posexplode(split(col("alt"), ",")).as(Seq("_i", "alt")))
      .select(col("variant_id"), col("contig"), col("pos_start"), col("ref"),
        col("alt"), (col("_i") + 1).cast("int").as("allele_idx"))

  /** The full `bcftools norm -m- && norm` pipeline: decompose
    * multi-allelic rows, then left-align each allele independently.
    * Output adds `allele_idx`; the identity passes through [[normalize]]
    * packed as `variant_id * 1000 + allele_idx` (≥1000 alts on one row
    * fails loudly — the VCF spec's practical ceiling is far below; and
    * `variant_id` must be ≥ 0, also enforced loudly — a negative id
    * would silently corrupt the div/% unpacking, r6 ADVICE). */
  def decomposeAndNormalize(variants: DataFrame): DataFrame = {
    val sp = splitMultiallelic(variants)
      .withColumn("_chk", assert_true(col("allele_idx") < 1000 && col("variant_id") >= 0,
        concat(lit("decomposeAndNormalize: needs variant_id >= 0 and < 1000 alt "),
          lit("alleles per row; got variant_id="), col("variant_id"),
          lit(" allele_idx="), col("allele_idx"))))
      .filter(col("_chk").isNull).drop("_chk")
    normalize(sp.select(
        (col("variant_id") * 1000 + col("allele_idx")).as("variant_id"),
        col("contig"), col("pos_start"), col("ref"), col("alt")))
      .select(expr("variant_id div 1000").as("variant_id"),
        (col("variant_id") % 1000).cast("int").as("allele_idx"),
        col("contig"), col("pos_start"), col("pos_end"), col("ref"), col("alt"))
  }

  /** The per-variant left-align/parsimony rewrite shared by every
    * normalization surface: returns the normalized (pos, ref, alt). */
  private[graft] def normalizeOne(c: String, p0: Int, r0: String, a0: String):
      (Int, String, String) = {
    require(r0.nonEmpty && a0.nonEmpty,
      s"variant at $c:$p0 has an empty allele (ref='$r0', alt='$a0')")
    var pos = p0; var ref = r0; var alt = a0
    // Phase 1: right-trim / left-extend.
    var cont = true
    while (cont) {
      val rEq = ref != alt && ref.last == alt.last
      if (rEq && ref.length > 1 && alt.length > 1) {
        ref = ref.init; alt = alt.init
      } else if (rEq && pos > 1) {
        val b = mockBase(c, pos - 1)
        ref = (s"$b$ref").init
        alt = (s"$b$alt").init
        pos -= 1
      } else cont = false
    }
    // Phase 2: left-trim to parsimony.
    while (ref.length > 1 && alt.length > 1 && ref.head == alt.head) {
      ref = ref.tail; alt = alt.tail; pos += 1
    }
    (pos, ref, alt)
  }

  /** Normalize `(variant_id, contig, pos_start, ref, alt)` rows; output
    * the same columns with normalized coordinates plus `pos_end`
    * (`pos_start + length(ref) - 1`, the interval convention the join
    * engine uses). Alleles must be non-empty. */
  def normalize(variants: DataFrame): DataFrame = {
    val spark = variants.sparkSession
    import spark.implicits._
    variants
      .select(col("variant_id").cast("long"), col("contig"),
        col("pos_start").cast("int"), col("ref"), col("alt"))
      .as[(Long, String, Int, String, String)]
      .map { case (id, c, p0, r0, a0) =>
        val (pos, ref, alt) = normalizeOne(c, p0, r0, a0)
        (id, c, pos, pos + ref.length - 1, ref, alt)
      }
      .toDF("variant_id", "contig", "pos_start", "pos_end", "ref", "alt")
  }

  /** COLUMN-PRESERVING normalization — the reference's VCF-scan option
    * surface (`VCFRelation.scala:30-39`: Glow's `normalize_variants`
    * transform rewrites coordinates/alleles in place and keeps every
    * other column). Replaces `pos_start`/`pos_end`/`ref`/`alt`; rows
    * with a null/multi-allelic `alt` pass through unchanged (bcftools
    * `norm` semantics: decompose first — see [[splitInPlace]]). One
    * struct-returning UDF per row, no shuffle. */
  def normalizeInPlace(variants: DataFrame): DataFrame = {
    val norm = udf { (c: String, p0: Int, r0: String, a0: String) =>
      val (pos, ref, alt) = normalizeOne(c, p0, r0, a0)
      (pos, pos + ref.length - 1, ref, alt)
    }
    val applicable = col("contig").isNotNull && col("pos_start").isNotNull &&
      col("alt").isNotNull && !col("alt").contains(",") &&
      col("ref").isNotNull && length(col("ref")) > 0 && length(col("alt")) > 0
    val passEnd =
      if (variants.columns.contains("pos_end")) col("pos_end").cast("int")
      else (col("pos_start") + length(col("ref")) - 1).cast("int")
    variants
      .withColumn("_n", when(applicable,
        norm(col("contig"), col("pos_start").cast("int"), col("ref"), col("alt"))))
      .withColumn("pos_start", coalesce(col("_n._1"), col("pos_start").cast("int")))
      .withColumn("pos_end", coalesce(col("_n._2"), passEnd))
      .withColumn("ref", coalesce(col("_n._3"), col("ref")))
      .withColumn("alt", coalesce(col("_n._4"), col("alt")))
      .drop("_n")
  }

  /** Column-preserving multi-allelic decomposition (`norm -m-`): one row
    * per comma-separated alt allele, `allele_idx` appended (1-based, VCF
    * GT index order); null-alt rows pass through with idx 1. Compose
    * with [[normalizeInPlace]] for the scan option `split_and_normalize`. */
  def splitInPlace(variants: DataFrame): DataFrame = {
    val others = variants.columns.filter(_ != "alt").map(col).toIndexedSeq
    variants
      .select(others :+ posexplode_outer(split(col("alt"), ",")).as(Seq("_i", "alt")): _*)
      .withColumn("allele_idx", (coalesce(col("_i"), lit(0)) + 1).cast("int"))
      .drop("_i")
  }
}
