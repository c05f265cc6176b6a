package graft

import org.apache.spark.sql.functions._

/** The typed Scala facade — reference `SequilaSession` parity
  * (`utvf/SequilaSession.scala:89-113`): coverage/pileup as typed
  * Datasets, plus the pipeline operators. */
class GraftSessionSpec extends SparkSpec {

  test("typed coverage/pileup Datasets match the DataFrame surface") {
    val gs = GraftSession(spark)
    val reads = Tables.reads(spark, sf0001).filter(col("sample_id") === "s1")

    val covDs = gs.coverageDs(reads)
    val covDf = gs.coverage(reads)
    assert(covDs.count() === covDf.count())
    val block: Coverage = covDs.orderBy(col("contig"), col("pos_start")).head()
    assert(block.pos_start <= block.pos_end && block.coverage > 0)

    val pilDs = gs.pileupDs(reads)
    assert(pilDs.count() === gs.pileup(reads).count())
    val row: Pileup = pilDs.orderBy(col("contig"), col("pos")).head()
    assert(row.count_ref + row.count_nonref === row.coverage.toLong)
    assert(row.alts.contains(" -> "))
  }

  test("facade operators run end-to-end") {
    val gs = GraftSession(spark)
    val docs = Tables.corpus(spark, sf0001)
    assert(gs.exactDuplicates(docs).count() > 0)
    val emb = Tables.embeddings(spark, sf0001)
    val q = emb.filter(col("vec_id") < 5)
    assert(gs.similarityTopKIvf(emb, q, 3).count() === 15)
    assert(gs.sql("SELECT * FROM bdg_grange('1', 10, 20)").count() === 1)
    val base = Tables.documents(spark, sf0001)
    assert(gs.crossDuplicates(docs.filter(col("doc_id") >= 10000), base, 0.6).count() > 0)
    val packed = gs.packForTraining(base, budget = 256)
    assert(packed.count() === base.count())
    assert(packed.filter(col("pack_offset") >= 256 || col("pack_offset") < 0).count() === 0)
  }
}
