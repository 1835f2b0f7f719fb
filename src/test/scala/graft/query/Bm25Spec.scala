package graft.query

import org.apache.spark.sql.functions._
import graft.{SparkSuite, TestSpark}

/** Okapi BM25 ([[TextQuality.textBm25]]): the ranking properties the
  * hash gate can't express — monotonicity in tf, the saturation bound,
  * and coverage (every doc containing a query term scores, nothing
  * else does). The value surface itself is DuckDB-hash-gated. */
class Bm25Spec extends SparkSuite {

  private val dir = TestSpark.sfDir

  test("coverage: exactly the docs containing >= 1 query term appear, " +
      "scores positive, n_terms correct") {
    import spark.implicits._
    val terms = Seq("filter", "join", "stream", "window")
    val out = TextQuality.textBm25(spark, dir)
      .as[(Long, Long, Double)].collect()
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), TextSim.tokens(col("text")).as("toks"))
      .as[(Long, Seq[String])].collect()
    val expect = docs.map { case (id, toks) =>
      id -> terms.count(toks.contains(_)).toLong
    }.filter(_._2 > 0).toMap
    assert(out.map(_._1).toSet === expect.keySet)
    out.foreach { case (id, nTerms, score) =>
      assert(nTerms === expect(id), s"doc $id n_terms")
      assert(score > 0.0, s"doc $id non-positive score $score")
    }
  }

  test("saturation: every per-doc score is below the idf sum times " +
      "(k1+1) — the BM25 tf ceiling") {
    import spark.implicits._
    val out = TextQuality.textBm25(spark, dir)
      .as[(Long, Long, Double)].collect()
    // ceiling with all four terms at tf -> infinity: sum(idf) * 2.2
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), TextSim.tokens(col("text")).as("toks"))
      .as[(Long, Seq[String])].collect()
    val n = docs.length.toDouble
    val terms = Seq("filter", "join", "stream", "window")
    val idf = terms.map { t =>
      val df = docs.count(_._2.contains(t)).toDouble
      math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    }.sum
    val ceiling = idf * 2.2
    out.foreach { case (id, _, score) =>
      assert(score < ceiling, s"doc $id: $score >= ceiling $ceiling")
    }
  }
}
