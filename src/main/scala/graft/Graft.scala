package graft

import graft.functions.{GraftFunctions, PileupUDFs}
import graft.plans.{GraftTableFunctions, IntervalJoinStrategy}

import org.apache.spark.sql.SparkSession

/** Runtime attachment of the engine to an *existing* SparkSession —
  * the moral equivalent of the reference's `SequilaSession(spark)` wrapper
  * (`utvf/SequilaSession.scala:29-75`), but with no forked
  * Analyzer/SessionState: strategies go through
  * `experimental.extraStrategies` and functions through the session
  * registries. Idempotent; call at the top of any query that needs the
  * engine so the contract works even when the caller built the session
  * without `spark.sql.extensions=graft.GraftExtensions`.
  */
object Graft {

  def ensure(spark: SparkSession): SparkSession = synchronized {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!classic.experimental.extraStrategies.exists(_.isInstanceOf[IntervalJoinStrategy])) {
      classic.experimental.extraStrategies = classic.experimental.extraStrategies ++
        Seq(IntervalJoinStrategy(spark), graft.plans.GenomicStrategy(spark))
    }
    val freg = classic.sessionState.functionRegistry
    GraftFunctions.registrations.foreach { case (id, info, b) =>
      if (!freg.functionExists(id)) freg.registerFunction(id, info, b)
    }
    val treg = classic.sessionState.tableFunctionRegistry
    GraftTableFunctions.registrations.foreach { case (id, info, b) =>
      if (!treg.functionExists(id)) treg.registerFunction(id, info, b)
    }
    PileupUDFs.register(spark)
    spark
  }
}
