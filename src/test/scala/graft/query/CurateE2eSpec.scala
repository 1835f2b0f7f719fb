package graft.query

import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.functions._

import graft.{PlanNodes, SparkSuite, TestSpark}

/** curate_e2e beyond the DuckDB hash compare: the composed plan must
  * agree with running the five stages independently, and it must BE one
  * pipeline (bounded shuffle count, broadcast decontamination) rather
  * than five materialized jobs. */
class CurateE2eSpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  test("composition agrees with the five stages run independently") {
    // staged reference: each stage materialized through the SAME
    // operators a user would run standalone (collect() boundaries force
    // independence); the DuckDB twin independently covers per-stage
    // semantics — this test covers the WIRING
    val keptIds = TextQuality.qualityFilter(spark, dir)
      .filter(col("keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .withColumn("canon_md5", TextSim.canonicalMd5(col("text")))
      .select("doc_id", "source", "canon_md5")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val dedupedIds = docs.filter(d => keptIds(d._1))
      .groupBy(_._3).map(_._2.map(_._1).min).toSet
    val contaminated = TextSim.decontaminate(spark, dir)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val mixedIds = Sampling.sampleMixture(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expectedIds = dedupedIds
      .filter(d => d % 50 != 0 && !contaminated(d) && mixedIds(d))

    val out = TextQuality.curateE2e(spark, dir).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSet === expectedIds)
    assert(expectedIds.nonEmpty, "fixture must survive the pipeline")
    // and the fixture must exercise the pipeline: quality and
    // mixture/decon each drop docs (canonical dups need not exist among
    // quality survivors at this SF — dedup semantics are covered by the
    // dedup_canonical key; here the group-min reference already proves
    // the wiring)
    assert(keptIds.size < docs.length)
    assert(dedupedIds.size <= keptIds.size)
    assert(expectedIds.size < dedupedIds.size)
  }

  test("bins are dense and offsets bounded per source") {
    val out = TextQuality.curateE2e(spark, dir, capacity = 512).collect()
    assert(out.forall(r => r.getAs[Long]("bin_offset") >= 0 &&
      r.getAs[Long]("bin_offset") < 512))
    out.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      val bins = rows.sortBy(_.getAs[Long]("doc_id")).map(_.getAs[Long]("bin"))
      assert(bins.head === 0L)
      assert(bins.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    }
  }

  test("plan is one pipeline: bounded shuffles, broadcast decontamination") {
    val nodes = PlanNodes.all(TextQuality.curateE2e(spark, dir))
    val hashShuffles = nodes.collect {
      case e: ShuffleExchangeExec
        if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
    }
    // dedup window + pack window on the corpus side, plus the two small
    // aggregations inside the contaminated-id subplan — anything beyond
    // that means a stage materialized or lost its broadcast
    assert(hashShuffles.size <= 5,
      s"expected ≤5 hash shuffles in the composed plan, got " +
        s"${hashShuffles.size}")
    assert(nodes.exists(_.isInstanceOf[BroadcastExchangeExec]),
      "contaminated-id set must reach the anti-join via broadcast")
  }
}
