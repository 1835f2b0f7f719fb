package graft.query

import org.apache.spark.sql.DataFrame
import graft.{SparkSuite, TestSpark}

/** Retrain-trigger gauge ([[IndexDrift]]): planted distribution
  * shifts must flip exactly the flag built to catch them, a no-shift
  * delivery must keep every flag down, and the fixture panel must be
  * internally consistent. */
class IndexDriftSpec extends SparkSuite {

  import spark.implicits._

  /** (vec_id, 8-dim embedding) frame; first 4 dims pick the cell. */
  private def vecs(rows: Seq[(Long, Seq[Float])]): DataFrame =
    rows.toDF("vec_id", "embedding")

  /** A tight population in the all-positive cell 15 (jitter ±eps on
    * dim 5 so msd_base > 0 and the distance ratio is defined). */
  private def tight(ids: Range, eps: Float): Seq[(Long, Seq[Float])] =
    ids.map(i => (i.toLong, Seq(0.2f, 0.2f, 0.2f, 0.2f,
      if (i % 2 == 0) 0.1f + eps else 0.1f - eps, 0f, 0f, 0f)))

  private def panel(base: Seq[(Long, Seq[Float])],
      delta: Seq[(Long, Seq[Float])]) =
    IndexDrift.indexDriftOf(vecs(base), vecs(delta))
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap

  test("no shift: a delivery drawn from the base population keeps " +
      "every flag down") {
    val base = tight(0 until 20, 0.05f)
    val delta = tight(100 until 120, 0.05f) // same geometry, new ids
    val p = panel(base, delta)
    assert(p.keySet === Set(15L))
    val r = p(15L)
    assert(r.getAs[Boolean]("occ_shift") === false)
    assert(r.getAs[Boolean]("dist_drift") === false)
    assert(r.getAs[Boolean]("needs_retrain") === false)
    assert(r.getAs[Boolean]("index_retrain") === false)
    assert(r.getAs[Double]("msd_base") === r.getAs[Double]("msd_delta"))
  }

  test("assignment-distance inflation flips dist_drift (and only it)") {
    val base = tight(0 until 20, 0.05f)
    // same cell, same occupancy — but the delivery sits 10x farther
    // from the frozen centroid than the base did
    val delta = tight(100 until 120, 0.5f)
    val p = panel(base, delta)
    val r = p(15L)
    assert(r.getAs[Boolean]("dist_drift") === true,
      s"msd ${r.getAs[Double]("msd_base")} -> " +
        s"${r.getAs[Double]("msd_delta")} did not flag")
    assert(r.getAs[Boolean]("occ_shift") === false)
    assert(r.getAs[Boolean]("needs_retrain") === true)
    assert(r.getAs[Boolean]("index_retrain") === true)
  }

  test("occupancy migration flips occ_shift (distances unchanged)") {
    // base: 10 vectors in cell 15, 10 in cell 0; delta migrates to
    // 18/2 — share shift 0.4 >> the 5% bar, per-cell geometry intact
    def cell0(ids: Range, eps: Float): Seq[(Long, Seq[Float])] =
      ids.map(i => (i.toLong, Seq(-0.2f, -0.2f, -0.2f, -0.2f,
        if (i % 2 == 0) 0.1f + eps else 0.1f - eps, 0f, 0f, 0f)))
    val base = tight(0 until 10, 0.05f) ++ cell0(10 until 20, 0.05f)
    val delta = tight(100 until 118, 0.05f) ++ cell0(118 until 120, 0.05f)
    val p = panel(base, delta)
    assert(p(15L).getAs[Boolean]("occ_shift") === true)
    assert(p(0L).getAs[Boolean]("occ_shift") === true)
    assert(p(15L).getAs[Boolean]("dist_drift") === false)
    assert(p(0L).getAs[Boolean]("dist_drift") === false)
    assert(p(15L).getAs[Boolean]("index_retrain") === true)
  }

  test("a delivery landing in a cell the base never populated drifts") {
    val base = tight(0 until 20, 0.05f)
    val delta = tight(100 until 118, 0.05f) ++
      Seq((118L, Seq(-0.2f, 0.2f, 0.2f, 0.2f, 0.1f, 0f, 0f, 0f)),
        (119L, Seq(-0.2f, 0.2f, 0.2f, 0.2f, 0.1f, 0f, 0f, 0f)))
    val p = panel(base, delta)
    val fresh = p(7L) // sign pattern -+++ = 0b0111
    assert(fresh.getLong(1) === 0L) // n_base
    assert(fresh.getLong(2) === 2L) // n_delta
    assert(fresh.getAs[Boolean]("dist_drift") === true,
      "new region of space not flagged")
    assert(fresh.getAs[Boolean]("index_retrain") === true)
  }

  test("fixture panel: internally consistent, decision = any flag") {
    val rows = IndexDrift.indexDriftCheck(spark, TestSpark.sfDir)
      .collect()
    assert(rows.nonEmpty && rows.length <= 16)
    val any = rows.exists(_.getAs[Boolean]("needs_retrain"))
    rows.foreach { r =>
      assert(r.getAs[Boolean]("index_retrain") === any)
      assert(r.getAs[Boolean]("needs_retrain") ===
        (r.getAs[Boolean]("occ_shift") || r.getAs[Boolean]("dist_drift")))
      assert(r.getLong(1) + r.getLong(2) > 0L)
    }
  }
}
