package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** MD-tag mismatch walk (reference `pileup/MDTagParser.scala:19-67` +
  * `ReadSummary.scala:37-137` relative-position math): reference
  * coordinates must account for N/D reference skips, read offsets for
  * I/S read skips. */
class MdTagSpec extends SparkSpec {

  private def walk(start: Int, cigar: String, md: String, seq: String,
      quals: String): Seq[(Int, String, Int)] = {
    val arr = MdWalk.mismatches(start, UTF8String.fromString(cigar),
      UTF8String.fromString(md), UTF8String.fromString(seq),
      UTF8String.fromString(quals))
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getInt(0), r.getUTF8String(1).toString, r.getInt(2))
    }
  }

  test("simple mismatch: position, read base from SEQ, qual from QUAL") {
    // 10M, MD 4A5: ref base A mismatched at aligned offset 4.
    assert(walk(100, "10M", "4A5", "CCCCGCCCCC", "IIIIJIIIII") ===
      Seq((104, "G", 'J' - 33)))
  }

  test("no mismatches: pure-number MD yields empty") {
    assert(walk(100, "10M", "10", "CCCCCCCCCC", "IIIIIIIIII") === Seq.empty)
  }

  test("N splice consumes reference but not read") {
    // 5M3N5M, MD 7C2: aligned offset 7 lands in the second M segment,
    // 3 ref positions past the gap; read offset stays 7.
    assert(walk(100, "5M3N5M", "7C2", "AAAAAAATAA", "IIIIIIIKII") ===
      Seq((100 + 3 + 7, "T", 'K' - 33)))
  }

  test("insertion consumes read but not reference") {
    // 3M2I3M, MD 4T1: aligned offset 4 is the 2nd base of the final M run
    // (ref 100+4=104... careful: I consumes no ref), read offset 4+2=6.
    assert(walk(100, "3M2I3M", "4T1", "AAAiiGTA", "IIIIIIJI") ===
      Seq((104, "T", 'J' - 33)))
  }

  test("soft clip offsets the read, not the reference") {
    // 2S6M, MD 1T4: ref pos 100+1, read offset 2+1=3.
    assert(walk(100, "2S6M", "1T4", "ssAGAAAA", "IIIIJIII") ===
      Seq((101, "G", 'I' - 33)))
  }

  test("deletion: ^ letters advance neither read nor aligned count") {
    // 4M2D4M, MD 4^AC2G1: mismatch at aligned offset 6 → ref
    // 100+4(M)+2(D)+2 = 108, read offset 6.
    assert(walk(100, "4M2D4M", "4^AC2G1", "AAAAAACA", "IIIIIIJI") ===
      Seq((108, "C", 'J' - 33)))
  }

  test("multiple mismatches, including adjacent letters") {
    // MD 2A0C6: mismatches at aligned offsets 2 and 3.
    assert(walk(50, "10M", "2A0C6", "GGTTGGGGGG", "IJKLIIIIII") ===
      Seq((52, "T", 'K' - 33), (53, "T", 'L' - 33)))
  }

  test("fixture consistency: MD-derived mismatches equal the pre-digested columns") {
    val md = graft.Tables.readsMd(spark, sf0001)
    import org.apache.spark.sql.graft.ColumnBridge
    val mm = ColumnBridge.column(MdMismatches(
      ColumnBridge.expression(col("pos_start").cast("int")),
      ColumnBridge.expression(col("cigar")),
      ColumnBridge.expression(col("md_tag")),
      ColumnBridge.expression(col("seq")),
      ColumnBridge.expression(col("qual_str"))))
    val derived = md.select(col("contig"), explode(mm).as("m"))
      .select(col("contig"), col("m.pos"), col("m.base"), col("m.qual"))
    val digested = md.filter(col("has_alt"))
      .select(col("contig"), col("alt_pos"), col("alt_base"), col("base_qual"))
    assert(derived.exceptAll(digested).isEmpty && digested.exceptAll(derived).isEmpty)
    assert(derived.count() > 0)
  }
}
