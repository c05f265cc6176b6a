package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Deterministic stand-in for an indexed FASTA reference (SURVEY §2.4 A4;
  * reference `pileup/model/Reference.scala:10-28`, which broadcasts the
  * contig sequences and answers `getBase(contig, pos)` lookups inside the
  * pileup aggregation).
  *
  * No FASTA exists in the offline environment, so the "reference genome"
  * here is a pure function of the coordinate — `base(contig, pos) =
  * "ACGT"[(ascii(contig) + pos) mod 4]` — evaluated as a codegen'd
  * expression per emitted pileup row. The lookup shape matches a real
  * deployment: a per-row, shuffle-free probe of broadcast-resident state
  * (a broadcast byte array in the FASTA case, a constant-folded expression
  * here); swapping in a real genome only changes this one function.
  * Mirrored verbatim in the DuckDB oracles (`PileupQueries`).
  */
object MockReference extends ReferenceSource {

  /** Reference base at (`contigCol`, `posCol`) as a SQL expression over
    * those column names. */
  override def refBase(contigCol: String, posCol: String): Column =
    expr(s"substr('ACGT', CAST((ascii($contigCol) + $posCol) % 4 AS INT) + 1, 1)")

  /** The same derivation as oracle SQL text (DuckDB dialect). */
  def refBaseSql(contigCol: String, posCol: String): String =
    s"substr('ACGT', (ascii($contigCol) + $posCol) % 4 + 1, 1)"
}
