package graft.query

import graft.{SparkSuite, TestSpark}

/** similarity_ivf's claim — nprobe cells recover most true neighbors at
  * a fraction of the scan — measured against the brute-force baseline
  * (same contract as LshRecallSpec; fixture neighbors are FAR, cosine
  * 0.26–0.49, the hard case for any ANN structure). */
class IvfRecallSpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  test("similarity_ivf recall >= 0.6 vs similarity_topk at k=5") {
    val truth = TextSim.similarityTopk(spark, dir, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ivf.similarityIvf(spark, dir, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth & approx).size.toDouble / truth.size
    info(f"recall=$recall%.3f (${(truth & approx).size}/${truth.size})")
    assert(recall >= 0.6)
  }

  test("ivf probes-vs-recall curve is monotone and reaches 1.0 at full probe") {
    // the documented curve on the uniform-random WORST case (recall ≈
    // probed fraction, slightly better because probes are the cells
    // NEAREST the query): each point reuses the memoized index, so the
    // sweep costs one probe join per nprobe
    val truth = TextSim.similarityTopk(spark, dir, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val curve = Seq(4, 8, 12, 14, 16).map { np =>
      val approx = Ivf.similarityIvf(spark, dir, k = 5, nprobe = np)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      np -> (truth & approx).size.toDouble / truth.size
    }
    curve.foreach { case (np, r) => info(f"nprobe=$np%2d/16  recall=$r%.3f") }
    assert(curve.map(_._2) === curve.map(_._2).sorted,
      "recall must be monotone non-decreasing in nprobe")
    assert(curve.last._2 === 1.0,
      "nprobe == nlist probes every cell — must equal brute force")
  }

  test("ivf high-recall config holds recall >= 0.9 on the worst case") {
    val truth = TextSim.similarityTopk(spark, dir, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ivf.similarityIvf(spark, dir, k = 5,
        nprobe = Ivf.HighRecallNprobe)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth & approx).size.toDouble / truth.size
    info(f"recall=$recall%.3f @ nprobe=${Ivf.HighRecallNprobe}/16")
    assert(recall >= 0.9)
  }

  test("ivf scores only the probed cells, not the whole corpus") {
    val e = graft.core.Tables.load(spark, dir, "embeddings")
    val corpusN = e.count()
    val scored = Ivf.similarityIvf(spark, dir, k = corpusN.toInt).count()
    // defaults probe nprobe/nlist = 8/16 = 1/2 of a balanced corpus →
    // ~5× corpusN expected over 10 queries; 8× bound leaves room for
    // unbalanced cells while still proving it beats brute force's 10×
    assert(scored < 8 * corpusN, s"IVF scored $scored pairs — not sub-scan")
  }

  test("ivf is deterministic (exact-decimal centroid means)") {
    val a = Ivf.similarityIvf(spark, dir).collect().toSeq
    val b = Ivf.similarityIvf(spark, dir).collect().toSeq
    assert(a === b)
  }
}
