package graft.query

import graft.{SparkSuite, TestSpark}

/** The claim similarity_lsh makes — approximate NN with high recall
  * against the brute-force baseline — measured, not asserted in a
  * comment. The fixture corpus' true neighbors are FAR (cosine
  * 0.26–0.49), the hard case for hyperplane LSH, so the default
  * table/probe budget is sized for it (see similarityLsh scaladoc). */
class LshRecallSpec extends SparkSuite {

  test("similarity_lsh recall >= 0.9 vs similarity_topk at k=5") {
    val dir = TestSpark.sfDir
    val truth = TextSim.similarityTopk(spark, dir, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = TextSim.similarityLsh(spark, dir, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth & approx).size.toDouble / truth.size
    info(f"recall=$recall%.3f (${(truth & approx).size}/${truth.size})")
    assert(recall >= 0.9)
  }

  test("lsh candidates are a strict subset of the corpus work (not a full scan)") {
    // the whole point of the bucket join: fewer exact-distance pairs than
    // brute force's |queries| × |corpus|
    val dir = TestSpark.sfDir
    val e = graft.core.Tables.load(spark, dir, "embeddings")
    val corpusN = e.count()
    // distinct candidate pairs scored by the LSH path (re-derive at k=corpus
    // so no top-k truncation hides the candidate set size)
    val scored = TextSim.similarityLsh(spark, dir, k = corpusN.toInt)
      .count()
    assert(scored < 10 * corpusN, s"LSH scored $scored pairs — not sub-scan")
  }
}
