package graft.query

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.{PlanNodes, SparkSuite, TestSpark}

/** Unit checks for the learned-quality-filter inference beyond the
  * DuckDB hash-compare: the score is recomputed token-for-token in
  * plain JVM code, and the plan is pinned to the shape a model join
  * must have — the corpus never shuffles for the model. */
class ModelScoreSpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  private def bucket(tok: String): Int = {
    val h = MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8"))
    ((h(0).toInt & 0xff))
  }

  private def weight(b: Int): Long = (b % 7 - 3).toLong

  test("score and feature count tie out against a JVM re-computation") {
    val toks = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), TextSim.tokens(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val out = TextQuality.qualityModelScore(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    // docs with ≥1 token appear; empty docs are featureless by design
    assert(out.keySet === toks.filter(_._2.nonEmpty).keySet)
    out.foreach { case (id, (nFeats, score, keep)) =>
      val ts = toks(id)
      assert(nFeats === ts.size.toLong, s"doc $id n_feats")
      val want = ts.map(t => weight(bucket(t))).sum
      assert(score === want, s"doc $id score")
      assert(keep === (score > 0), s"doc $id keep flag")
    }
    // the model discriminates on this corpus: both outcomes occur
    val keeps = out.values.map(_._3).toSet
    assert(keeps === Set(true, false))
  }

  test("plan shape: the model is BROADCAST; the corpus side never shuffles for the join") {
    val df = TextQuality.qualityModelScore(spark, dir)
    df.collect()
    val nodes = PlanNodes.all(df).map(_.getClass.getSimpleName)
    assert(nodes.exists(_.contains("BroadcastHashJoin")),
      s"no broadcast join in: ${nodes.distinct.mkString(", ")}")
    assert(!nodes.exists(_.contains("SortMergeJoin")),
      "model join degraded to a corpus-shuffling sort-merge join")
  }
}
