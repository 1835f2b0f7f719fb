package graft.query

import org.apache.spark.sql.functions._

import graft.{SparkSuite, TestSpark}

/** Incremental IVF maintenance — the weekly-delivery regime applied to
  * ANN (similarity_ivf_delta): the delta is ASSIGNED to frozen
  * base-trained centroids and appended as one O(delta) manifest
  * commit, and the post-delivery index must (a) cover the merged
  * corpus exactly, (b) hold the same per-query recall floors as the
  * retrained index, (c) have cost O(delta) on disk — base cell files
  * untouched. */
class IvfDeltaSpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  test("merged cells cover exactly the full corpus, each vector once") {
    val (_, cells) = Ivf.ensureDeltaIndex(spark, dir)
    val e = graft.core.Tables.load(spark, dir, "embeddings")
    assert(cells.count() === e.count(), "append lost or duplicated rows")
    assert(cells.select("vec_id").distinct().count() === e.count())
  }

  test("append is O(delta): two manifest versions, base dirs shared") {
    val (_, cells) = Ivf.ensureDeltaIndex(spark, dir)
    // the live manifest references the base version's files PLUS a
    // delta dir — if append rewrote the base, every input file would
    // be delta-dir-local
    val files = cells.inputFiles
    val dirs = files.map(f => f.substring(0, f.lastIndexOf('/')))
      .map(d => d.replaceAll(".*/(v-\\d+)-[^/]*.*", "$1")).distinct.sorted
    assert(dirs.length >= 2,
      s"live manifest reads from ${dirs.mkString(",")} — append rewrote " +
        "the base instead of referencing it")
  }

  test("delta index recall matches the retrained index's floors") {
    val truth = TextSim.similarityTopk(spark, dir, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val s = df.select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (truth & s).size.toDouble / truth.size
    }
    val delta = recallOf(Ivf.similarityIvfDelta(spark, dir, k = 5,
      nprobe = Ivf.HighRecallNprobe))
    val retrained = recallOf(Ivf.similarityIvf(spark, dir, k = 5,
      nprobe = Ivf.HighRecallNprobe))
    info(f"recall: delta-maintained=$delta%.3f retrained=$retrained%.3f")
    // identical-distribution delta: frozen centroids cannot degrade
    // recall materially (the drift-bound premise in Ivf's scaladoc)
    assert(delta >= 0.9, f"delta recall $delta%.3f below the 0.9 bar")
  }

  test("drift measure: delta fits like any out-of-sample slice") {
    // the retrain trigger must isolate DISTRIBUTION drift from
    // k-means's in-sample advantage (at 16 centroids over the 500-row
    // 64-dim fixture, the training slice fits its own model ~0.11
    // better than held-out data even when iid — so neither
    // base-vs-delta under the frozen model nor frozen-vs-retrained on
    // the delta can see drift through that bias). The clean measure:
    // train a side model WITHOUT a base holdout, then compare two
    // slices that are BOTH out-of-sample for it — the base holdout
    // (same distribution as training, by construction) and the delta.
    // Any gap is pure drift; iid fixture ⇒ noise-sized.
    val e = graft.core.Tables.load(spark, dir, "embeddings")
    val cutoff = e.agg(max(col("vec_id"))).head().getLong(0) * 4 / 5 + 1
    val base = e.filter(col("vec_id") < cutoff)
    val holdout = base.filter(col("vec_id") % 5 === 2)
    val trainSlice = base.filter(col("vec_id") % 5 =!= 2)
    val model = Ivf.trainCentroids(trainSlice, nlist = 16, iters = 2,
      seed = 7L)
    def fitOf(slice: org.apache.spark.sql.DataFrame): Double = slice
      .crossJoin(broadcast(model))
      .withColumn("c",
        graft.functions.cosine_sim(col("embedding"), col("cvec")))
      .groupBy("vec_id").agg(max(col("c")).as("best"))
      .agg(avg("best")).head().getDouble(0)
    val controlFit = fitOf(holdout)
    val deltaFit = fitOf(e.filter(col("vec_id") >= cutoff))
    val drift = controlFit - deltaFit
    info(f"out-of-sample mean nearest-centroid cos: base holdout=" +
      f"$controlFit%.4f delta=$deltaFit%.4f drift=$drift%.4f")
    assert(math.abs(drift) < 0.05,
      f"identical-distribution delta shows drift $drift%.4f")
  }
}
