package graft.query

import org.apache.spark.sql.functions._
import graft.{SparkSuite, TestSpark}

/** The one scale-killer the r13 audit named: a degenerate (band,
  * bucket) holding B near-identical docs (templated/boilerplate pages
  * at crawl scale) makes all-i<j candidate expansion O(B²). The
  * star-bounded form must (a) emit O(B) candidates on such a bucket,
  * (b) still cluster the bucket into ONE component, and (c) be
  * pair-for-pair identical to the all-pairs form at fixture bucket
  * sizes — the hash-unchanged guarantee the correctness gate rides on. */
class DegenerateBucketSpec extends SparkSuite {

  import spark.implicits._

  /** ~10k byte-identical boilerplate docs (one shingle set ⇒ one
    * signature ⇒ the SAME bucket in all 8 bands) + a handful of
    * unrelated docs that must stay singletons. */
  private val boilerplateN = 10000
  private lazy val corpus = {
    val boiler = (0 until boilerplateN).map(i => (i.toLong,
      "all rights reserved this page is served from template seven " +
      "with the standard navigation header and footer blocks included"))
    val organic = Seq(
      (90001L, "completely unrelated text about alpine meadow ecology"),
      (90002L, "a second organic document on deep sea hydrothermal vents"),
      (90003L, "third organic text concerning medieval trade routes"))
    (boiler ++ organic).toDF("doc_id", "text")
  }

  test("degenerate bucket emits O(B) star candidates, not O(B^2)") {
    val sh = TextSim.shingleHashesOf(corpus)
    val buckets = TextSim.bandBucketsOf(sh)
    val n = TextSim.starCandidates(buckets).count()
    // identical docs share one bucket per band; the DOUBLE star roots
    // at the bucket's two lowest docs, distinct'd across bands =>
    // exactly (B-1) + (B-2) spanning candidates ((mn,mn2) overlaps).
    // All-pairs would emit B*(B-1)/2 ≈ 50M.
    val expected = (boilerplateN - 1).toLong + (boilerplateN - 2).toLong
    assert(n === expected,
      s"expected $expected double-star candidates, got $n")
  }

  test("star edges still collapse the boilerplate into one cluster") {
    val pairs = TextSim.dedupMinhashStarOf(corpus, threshold = 0.8)
    val labels = Cluster.connectedComponents(
      pairs.select(col("d1").as("src"), col("d2").as("dst")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size === boilerplateN)
    assert(labels.values.toSet === Set(0L),
      "boilerplate bucket did not collapse to the single min-id cluster")
    assert(!labels.contains(90001L), "organic doc wrongly linked")
  }

  test("star form == all-pairs form on the driver fixture (hash gate)") {
    val dir = TestSpark.sfDir
    val star = TextSim.dedupMinhashStar(spark, dir, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val allPairs = TextSim.dedupMinhash(spark, dir, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(star.toSeq === allPairs.toSeq)
    assert(star.nonEmpty, "fixture produced no >=0.8 pairs — vacuous")
  }
}
