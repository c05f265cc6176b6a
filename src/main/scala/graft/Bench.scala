package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * emits ONE JSON line as the very last stdout line (after spark.stop(), so
  * no Spark/sbt noise can trail it). Failures are recorded per-query in
  * "errors" instead of being silently folded into the timing. The same JSON
  * is also written to bench_out.json as a belt-and-braces copy. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the session (codegen paths, parquet footers) so the first
    // measured query doesn't absorb JVM startup costs.
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, sfDir).select("l_orderkey").limit(1).collect()
    val names = SparkEntry.queries.keys.toSeq.sorted
    var times = Vector.empty[(String, Double)]
    var errors = Vector.empty[(String, String)]
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch {
        case e: Throwable =>
          errors :+= (name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }
      times :+= (name -> (System.nanoTime() - t0) / 1e9)
      // Operators persist intermediate frames (LSH bands, coverage blocks)
      // whose lifecycle outlives the query; drop them so cached blocks
      // don't accumulate across the run and skew later timings.
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = times.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = times.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":${jstr(sfDir)}}"""
    Files.writeString(Paths.get("bench_out.json"), json + "\n")
    spark.stop()
    // Last line of stdout, printed after Spark shutdown.
    println(json)
  }
}
