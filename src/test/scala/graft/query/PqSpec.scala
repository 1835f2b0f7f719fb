package graft.query

import org.apache.spark.sql.functions._
import graft.{SparkSuite, TestSpark}
import graft.functions.cosine_sim

/** Product quantization ([[Pq]]): the ADC algebra (LUT-sum score ==
  * cosine of the codebook reconstruction), model determinism, the
  * code-table shape, and the per-query recall floor on the
  * uniform-random worst-case fixture. */
class PqSpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  test("ADC identity: the LUT-sum approx_cos equals cosine_sim of the " +
      "materialized reconstruction (float-sum tolerance)") {
    import spark.implicits._
    val (cb, codes) = Pq.ensureIndex(spark, dir)
    val e = graft.core.Tables.load(spark, dir, "embeddings")
    // reconstruction x̂: per vector, codebook centroids concatenated in
    // subspace order
    val recon = codes.join(cb, Seq("sub", "cid"))
      .groupBy("vec_id")
      .agg(array_sort(collect_list(struct(col("sub"), col("cvec"))))
        .as("parts"))
      .select(col("vec_id"),
        flatten(transform(col("parts"), p => p("cvec"))).as("xhat"))
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("qv"))
    // the identity under test is algebraic: the LUT path's score for
    // EVERY (query, vector) pair equals cosine against x̂
    val lutScore = {
      codes.join(q, col("vec_id") =!= col("query_id"))
        .join(cb, Seq("sub", "cid"))
        .withColumn("part_ip",
          graft.functions.dot_product(
            slice(col("qv"), col("sub") * 4 + 1, lit(4)), col("cvec")))
        .groupBy("query_id", "vec_id")
        .agg(sum(col("part_ip")).as("ip"), sum(col("csq")).as("sq"))
        .join(q.select(col("query_id"),
          sqrt(graft.functions.dot_product(col("qv"), col("qv"))).as("qn")),
          Seq("query_id"))
        .select(col("query_id"), col("vec_id"),
          (col("ip") / (col("qn") * sqrt(col("sq")))).as("adc_cos"))
        .as[(Long, Long, Double)].collect()
        .map(t => (t._1, t._2) -> t._3).toMap
    }
    val reconScore = {
      val r = recon.join(q, col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          cosine_sim(col("qv"), col("xhat")).as("c"))
        .as[(Long, Long, Double)].collect()
      r.map(t => (t._1, t._2) -> t._3).toMap
    }
    assert(lutScore.keySet === reconScore.keySet)
    lutScore.foreach { case (k, v) =>
      assert(math.abs(v - reconScore(k)) < 1e-9,
        s"pair $k: LUT $v vs recon ${reconScore(k)}")
    }
  }

  test("training is deterministic: two independent runs produce " +
      "bit-identical codebooks") {
    import spark.implicits._
    val e = graft.core.Tables.load(spark, dir, "embeddings")
    def train() = {
      val sv = e.select(col("vec_id"),
          posexplode(array((0 until 16).map(s =>
            slice(col("embedding"), s * 4 + 1, 4).cast("array<double>")): _*))
            .as(Seq("sub", "svec")))
      Pq.trainCodebooks(sv, 16, 32, 2, 77L)
        .select("sub", "cid", "cvec")
        .as[(Int, Long, Seq[Double])].collect().sortBy(t => (t._1, t._2))
    }
    val a = train(); val b = train()
    assert(a.length === 16 * 32)
    assert(a.toSeq === b.toSeq)
  }

  test("codes table shape: one code per (vector, subspace), cids in " +
      "[1, ks]") {
    import spark.implicits._
    val (_, codes) = Pq.ensureIndex(spark, dir)
    val n = graft.core.Tables.load(spark, dir, "embeddings").count()
    assert(codes.count() === n * 16)
    val (lo, hi) = codes.agg(min("cid"), max("cid"))
      .as[(Long, Long)].head()
    assert(lo >= 1L && hi <= 32L)
    assert(codes.groupBy("vec_id", "sub").count()
      .filter(col("count") > 1).isEmpty)
  }

  test("per-query recall floor on the worst-case fixture: every query " +
      "retrieves >= 4 of the brute-force top-5; contract key all-true") {
    import spark.implicits._
    val hits = Contracts.recallVsTopk(
        TextSim.similarityTopk(spark, dir, 5),
        Pq.similarityPq(spark, dir, 5), 4)
      .as[(Long, Boolean)].collect()
    assert(hits.length === 10)
    assert(hits.forall(_._2), s"below-floor queries: ${hits.filterNot(_._2).mkString(",")}")
    assert(Contracts.pqRecallPerQuery(spark, dir)
      .as[(Long, Boolean)].collect().forall(_._2))
  }

  test("delta maintenance: frozen-codebook assignment serves the " +
      "merged corpus at the same floors, and the codes cover base and " +
      "delta exactly once") {
    import spark.implicits._
    val (_, codes) = Pq.ensureDeltaIndex(spark, dir)
    val n = graft.core.Tables.load(spark, dir, "embeddings").count()
    assert(codes.count() === n * 16, "merged codes row count")
    assert(codes.groupBy("vec_id", "sub").count()
      .filter(col("count") > 1).isEmpty, "double-coded (vec, sub)")
    assert(Contracts.pqDeltaRecallPerQuery(spark, dir)
      .as[(Long, Boolean)].collect().forall(_._2))
  }

  test("IVF-PQ composition holds the same per-query recall floor as " +
      "its component operators") {
    import spark.implicits._
    // the IVF stage caps recall at the probed-cell mass on the
    // uniform fixture (the Ivf family's own measured regime), so the
    // composition inherits the per-SF floors, not plain PQ's
    val floor = if (graft.core.Tables.load(spark, dir, "embeddings")
        .count() < 1000) 3 else 4
    val hits = Contracts.recallVsTopk(
        TextSim.similarityTopk(spark, dir, 5),
        Pq.similarityIvfPq(spark, dir, 5), floor)
      .as[(Long, Boolean)].collect()
    assert(hits.length === 10)
    assert(hits.forall(_._2),
      s"below-floor queries: ${hits.filterNot(_._2).mkString(",")}")
    assert(Contracts.ivfPqRecallPerQuery(spark, dir)
      .as[(Long, Boolean)].collect().forall(_._2))
  }
}
