package graft.query

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The PQ retrain loop ([[PqDrift]] gauge → [[Pq.similarityPqRetrain]]
  * action) driven through the shared planted-shift fixtures
  * ([[DriftFixtures]] — the IvfRetrainSpec corpora): a delivery in
  * fresh diffuse clusters the frozen codebooks never saw must flip the
  * per-subspace gauge and the retrained codebooks must restore the
  * recall the frozen model lost; an in-distribution delivery must stay
  * quiet and serve the frozen delta chain's answers bit-for-bit. */
class PqDriftSpec extends SparkSuite {

  private def writeCorpus(dir: java.nio.file.Path, shifted: Boolean)
      : String = DriftFixtures.writeCorpus(spark, dir, shifted)

  /** Recall@5 of `approx` against the brute-force truth at `dir`. */
  private def recallOf(dir: String,
      approx: org.apache.spark.sql.DataFrame): Double = {
    val truth = TextSim.similarityTopk(spark, dir, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = approx.select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (truth & got).size.toDouble / truth.size
  }

  /** Mean squared assignment distance of the DELIVERY's subvectors
    * under a (codebooks, codes) index — the quantity PQ training
    * minimizes (Jégou '11 §II), i.e. the direct contract a retrain
    * must improve. */
  private def deltaQuantErr(dir: String,
      index: (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame)): Double = {
    val e = graft.core.Tables.load(spark, dir, "embeddings")
    val cut = e.agg(max(col("vec_id"))).head().getLong(0) * 4 / 5 + 1
    val (cb, codes) = index
    val d = 64 / Pq.M
    val sv = e.filter(col("vec_id") >= cut).select(col("vec_id"),
      posexplode(array((0 until Pq.M).map(s =>
        slice(col("embedding"), s * d + 1, d).cast("array<double>")): _*))
        .as(Seq("sub", "svec")))
    sv.join(codes, Seq("vec_id", "sub")).join(cb, Seq("sub", "cid"))
      .select(aggregate(zip_with(col("svec"), col("cvec"),
        (a, b) => (a - b) * (a - b)), lit(0.0), _ + _).as("sq"))
      .agg(avg(col("sq"))).head().getDouble(0)
  }

  test("planted shift: per-subspace gauge fires, the retrained " +
      "codebooks materially cut the delivery's quantization error, " +
      "and recall does not degrade") {
    withTmpDir { tmp =>
      val dir = writeCorpus(tmp, shifted = true)
      // 1. the gauge fires on the shifted delivery
      val gauge = PqDrift.pqDriftCheck(spark, dir)
      assert(gauge.select("pq_retrain").head().getBoolean(0),
        "planted shift must flip pq_retrain")
      // 2. the apply panel records the decision and reads all-quiet
      val post = PqDrift.pqRetrainApply(spark, dir)
      assert(post.select("retrained").head().getBoolean(0))
      assert(post.agg(sum(col("n_delta"))).head().getLong(0) === 0L,
        "retrain resets the chain: the post panel's delta is empty")
      assert(post.filter(col("needs_retrain")).count() === 0L,
        "post-retrain panel must be all-quiet")
      // 3. the action's direct contract: codebooks retrained on the
      //    full corpus cut the delivery's mean squared assignment
      //    distance (measured 0.42× on this fixture; 0.6 is the bar)
      val frozenErr = deltaQuantErr(dir, Pq.ensureDeltaIndex(spark, dir))
      val retrainedErr = deltaQuantErr(dir, Pq.ensureIndex(spark, dir))
      info(f"delivery quantization error: frozen=$frozenErr%.5f, " +
        f"retrained=$retrainedErr%.5f (x${retrainedErr / frozenErr}%.3f)")
      assert(retrainedErr <= frozenErr * 0.6,
        f"retraining must materially cut the delivery's quantization " +
          f"error, got $frozenErr%.5f -> $retrainedErr%.5f")
      // 4. the downstream symptom must not move the wrong way at a
      //    tight rerank budget (the fixture's diffuse fresh clusters
      //    keep ADC ordering partially informative even frozen, so the
      //    recall gap is small — the error cut above is the load-
      //    bearing restoration claim)
      val r = 8
      val frozen = recallOf(dir,
        Pq.similarityPqDelta(spark, dir, k = 5, rerank = r))
      val after = recallOf(dir,
        Pq.similarityPqRetrain(spark, dir, k = 5, rerank = r))
      info(f"rerank=$r: frozen recall=$frozen%.3f, " +
        f"retrained recall=$after%.3f")
      assert(after >= frozen,
        f"retraining must not degrade recall, got $frozen%.3f -> " +
          f"$after%.3f")
    }
  }

  test("no shift: gauge quiet, apply panel keeps the pre panel, " +
      "retrain path serves the frozen chain bit-for-bit") {
    withTmpDir { tmp =>
      val dir = writeCorpus(tmp, shifted = false)
      val gauge = PqDrift.pqDriftCheck(spark, dir)
      assert(!gauge.select("pq_retrain").head().getBoolean(0),
        "an in-distribution delivery must not flip the gauge")
      val post = PqDrift.pqRetrainApply(spark, dir)
      assert(!post.select("retrained").head().getBoolean(0))
      assert(post.drop("retrained").collect().map(_.toString).sorted
        === gauge.collect().map(_.toString).sorted,
        "quiet gauge: the post panel IS the pre panel")
      val viaRetrain = Pq.similarityPqRetrain(spark, dir, k = 5)
      val viaDelta = Pq.similarityPqDelta(spark, dir, k = 5)
      assert(viaRetrain.count() === viaDelta.count())
      assert(viaRetrain.except(viaDelta).count() === 0L,
        "quiet gauge must not change the serving state")
    }
  }
}
