package graft.query

import org.apache.spark.sql.functions._
import graft.{SparkSuite, TestSpark}

/** The r14 verdict's top task: the star/spanning candidate bound
  * propagated from the minhash family to the SHARED-SHINGLE family
  * ([[TextSim.dedupNgramStarOf]], [[TextSim.dedupLevenshteinStarOf]]).
  * Three obligations:
  *   (a) fixture identity — at driver document frequencies (max df 25
  *       < the 32 all-pair cap) the star forms are pair-identical to
  *       the exact forms, the hash-unchanged guarantee the correctness
  *       gate rides on;
  *   (b) an at-cap boilerplate shingle (df inside the 1000 DF cap but
  *       far above the pair cap) emits O(df) candidates, not O(df²),
  *       while the transitive closure still collapses its docs into
  *       one component;
  *   (c) double-star robustness — a degenerate group whose MINIMUM is
  *       a chance collider (every edge through it fails verification)
  *       stays connected through the second root (the r14 ADVICE
  *       degenerate-root gap). */
class StarShingleSpec extends SparkSuite {

  import spark.implicits._

  private val dir = TestSpark.sfDir

  test("fixture identity: dedupNgramStar == dedupNgram pair-for-pair") {
    val star = TextSim.dedupNgramStar(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val exact = TextSim.dedupNgram(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(star === exact)
    assert(star.nonEmpty, "fixture produced no ngram pairs — vacuous")
  }

  test("fixture identity: dedupLevenshteinStar == dedupLevenshtein") {
    val star = TextSim.dedupLevenshteinStar(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val exact = TextSim.dedupLevenshtein(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(star === exact)
    assert(star.nonEmpty, "fixture produced no lev pairs — vacuous")
  }

  /** df docs all sharing ONE boilerplate trigram ("all rights
    * reserved"), each otherwise unique: the shared shingle's posting
    * is at-cap (df > 32 pair cap, < 1000 DF cap), every other shingle
    * has df 1. */
  private def boilerplateCorpus(df: Int) =
    (0 until df).map(i => (i.toLong,
      s"all rights reserved unique$i filler$i token$i"))
      .toDF("doc_id", "text")

  test("at-cap shingle: O(df) star candidates where all-pairs is O(df²)") {
    val df = 200
    val docs = boilerplateCorpus(df)
    val starN = TextSim.arrayStarPairs(
      TextSim.cappedPostings(docs, 1000), allPairCap = 32).count()
    // one over-cap posting (the shared trigram) => double star =
    // (df-1) + (df-2); every other posting has df 1 (dropped)
    assert(starN === (2 * df - 3).toLong,
      s"expected ${2 * df - 3} double-star candidates, got $starN")
    val exactN = TextSim.orderedPairs(
      TextSim.cappedPostings(docs, 1000)
        .filter(size(col("docs")) >= 2),
      "docs", "d1", "d2").count()
    assert(exactN === (df.toLong * (df - 1) / 2),
      s"all-pairs baseline changed: $exactN")
  }

  test("at-cap shingle: closure still collapses to one component") {
    val df = 200
    // each doc: 4 shingles, 1 shared => jaccard 1/7 ≈ 0.1429 between
    // every pair; threshold 0.1 verifies every emitted candidate
    val pairs = TextSim.dedupNgramStarOf(boilerplateCorpus(df),
      threshold = 0.1)
    val labels = Cluster.connectedComponents(
      pairs.select(col("d1").as("src"), col("d2").as("dst")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size === df)
    assert(labels.values.toSet === Set(0L),
      "at-cap posting did not collapse to one min-id component")
  }

  test("double star: connectivity survives a chance-collider minimum") {
    // synthetic group of 40 members (over the 32 cap) where doc 0 is
    // a verification-failing collider: drop every edge touching it and
    // assert docs 1..39 remain ONE component via the second root —
    // a single star rooted at 0 would leave them all disconnected
    val rows = (0 until 40).map(i => (7L, i.toLong)).toDF("g", "doc_id")
    val edges = TextSim.starEdges(rows, Seq("g"), allPairCap = 32)
      .filter(col("d1") =!= 0L && col("d2") =!= 0L)
    val labels = Cluster.connectedComponents(
      edges.select(col("d1").as("src"), col("d2").as("dst")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.keySet === (1L to 39L).toSet)
    assert(labels.values.toSet === Set(1L),
      "second star root did not preserve connectivity")
  }
}
