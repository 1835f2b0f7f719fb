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
