package graft.operators

import graft.SparkSpec

/** Hand-verified normalization cases against the mock reference
  * (contig "1": base(pos) = "ACGT"[(49 + pos) % 4] → G,T,A,C cycling
  * from pos 1), plus structural invariants on a derived batch. The
  * full differential coverage is the DuckDB recursive-CTE oracle on
  * 2000 derived variants (`variant_normalize`). */
class VariantOpsSpec extends SparkSpec {

  private def norm(rows: (Long, String, Int, String, String)*) = {
    import graft.SharedSpark.spark.implicits._
    VariantOps.normalize(
        rows.toDF("variant_id", "contig", "pos_start", "ref", "alt"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3),
        r.getString(4), r.getString(5)))).toMap
  }

  test("right-trim then parsimony stops when an allele reaches one base") {
    // ACG→AG: shared 'G' trims (both >1) to AC→A; tails differ, left-trim
    // needs both >1, so the deletion stays anchored at its pos.
    assert(norm((1L, "1", 10, "ACG", "AG"))(1L) === (("1", 10, 11, "AC", "A")))
  }

  test("left-extension shifts an insertion through the reference") {
    // G→AG at pos 5: shared 'G' with ref len 1 → prepend base(4)='C',
    // pos 4, trim shared last → C→CA; tails differ, done.
    assert(norm((1L, "1", 5, "G", "AG"))(1L) === (("1", 4, 4, "C", "CA")))
  }

  test("pure parsimony: shared head trims and advances pos") {
    // TAC→TAG: shared tail? 'C' vs 'G' no; heads T=T both >1 → trim,
    // pos 21; A=A both >1 → trim, pos 22 → C→G SNV.
    assert(norm((1L, "1", 20, "TAC", "TAG"))(1L) === (("1", 22, 22, "C", "G")))
  }

  test("a period-matching insertion left-aligns to the contig start and stops") {
    // contig "1" cycles GTAC from pos 1; inserting its own period after
    // pos 8 shifts all the way down and must stop AT pos 1 (no base
    // before the contig), alleles still sharing their last base.
    val (c, ps, _, ref, alt) = norm((1L, "1", 8, "C", "CGTAC"))(1L)
    assert(c === "1" && ps === 1)
    assert(ref.length === 1 && alt.length === 5)
    assert(ref.last === alt.last, "stuck-at-start keeps the shared tail")
  }

  test("batch invariants: parsimonious output, valid coordinates") {
    import graft.SharedSpark.spark.implicits._
    val v = (1 to 400).map { k =>
      (k.toLong, (k % 4).toString, (k * 7) % 500 + 2,
        "ACGTACGT".substring(k % 4, k % 4 + 1 + k % 3),
        "TGCATGCA".substring(k % 5 % 4, k % 5 % 4 + 1 + k % 2))
    }.toDF("variant_id", "contig", "pos_start", "ref", "alt")
    VariantOps.normalize(v).collect().foreach { r =>
      val (pos, end, ref, alt) = (r.getInt(2), r.getInt(3), r.getString(4), r.getString(5))
      assert(pos >= 1 && end === pos + ref.length - 1)
      assert(ref.nonEmpty && alt.nonEmpty)
      // parsimonious: no shared head while both are multi-base
      assert(!(ref.length > 1 && alt.length > 1 && ref.head == alt.head))
      // right-reduced: a shared tail may only survive when stuck at pos 1
      if (ref != alt && ref.last == alt.last) assert(pos === 1)
    }
  }
}
