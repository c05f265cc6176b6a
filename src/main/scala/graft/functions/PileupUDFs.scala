package graft.functions

import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Pileup post-processing scalar functions (reference
  * `pileup/udfs/{QualityFunctions,AltFunctions,CoverageFunctions}.scala`).
  * These run over the small *output* of coverage/pileup queries (maps of
  * alt counts / quality histograms), not in any hot scan path, so plain
  * Scala UDFs are the right tool (SURVEY §2.6 note).
  *
  * Quality histograms are indexed by Phred score; rendering adds 33 to get
  * the FASTQ ASCII character, skipping empty slots.
  */
object PileupUDFs {

  def qualsToMap(map: Map[Byte, collection.Seq[Short]]): Map[Byte, Map[String, Short]] =
    if (map == null) null
    else map.map { case (k, v) =>
      val nested = mutable.HashMap.empty[String, Short]
      var i = 0
      while (i < v.length) {
        if (v(i) != 0) nested += (i + 33).toChar.toString -> v(i)
        i += 1
      }
      k -> nested.toMap
    }

  def qualsToCharMap(map: Map[Byte, collection.Seq[Short]]): Map[String, Map[String, Short]] =
    if (map == null) null
    else qualsToMap(map).map { case (k, v) => k.toChar.toString -> v }

  def qualsToCoverage(map: Map[Byte, collection.Seq[Short]], cov: Short): Short =
    if (map == null) cov
    else map.iterator.map { case (_, v) => v.sum }.sum.toShort

  def byteKeysToChar[V](map: Map[Byte, V]): Map[String, V] =
    if (map == null) null
    else map.map { case (k, v) => k.toChar.toString -> v }

  /** Canonical sorted rendering for golden-file comparison. */
  def altMapToString(map: Map[String, Short]): String =
    if (map == null) null
    else map.toSeq.sortBy(_._1).map { case (k, v) => s"$k -> $v" }.mkString(", ")

  def qualsMapToString(map: Map[String, Map[String, Short]]): String =
    if (map == null) null
    else map.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k -> (" + v.toSeq.sortBy(_._1).map { case (c, n) => s"$c -> $n" }.mkString(", ") + ")" }
      .mkString("; ")

  def register(spark: SparkSession): Unit = {
    val u = spark.udf
    u.register("quals_to_map", qualsToMap _)
    u.register("to_charmap", qualsToCharMap _)
    u.register("quals_to_cov", qualsToCoverage _)
    u.register("quals_to_char", (m: Map[Byte, Map[String, Short]]) => byteKeysToChar(m))
    u.register("alts_to_char", (m: Map[Byte, Short]) => byteKeysToChar(m))
    u.register("altmap_to_str", altMapToString _)
    u.register("qualsmap_to_str", qualsMapToString _)
    u.register("cov_equals", (a: Short, b: Short) => a == b)
  }
}
