package graft.query

import org.apache.spark.sql.functions._

import graft.{SparkSuite, TestSpark}

/** The tokenizer-vocabulary drift gauge
  * ([[TextQuality.vocabDriftCheck]]): a planted OOV-heavy delivery
  * must flip `vocab_retrain` through the oov arm, a planted head-token
  * migration through the occ_shift arm, and an in-distribution
  * delivery must stay quiet. The ACTION for this gauge is re-running
  * the [[Bpe]]/[[Unigram]] trainers from [[VocabStore.mergedCounts]] —
  * already incremental (O(vocab) merge, VocabStoreSpec), so unlike the
  * IVF family no separate apply path exists to test; the gauge is the
  * missing half. */
class VocabDriftSpec extends SparkSuite {

  import spark.implicits._

  private def docsOf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("OOV-heavy delivery flips vocab_retrain via the oov arm") {
    val base = docsOf((0L until 20L).map(i =>
      i -> "alpha beta gamma delta"): _*)
    // >1% of delivery occurrences are tokens the base never saw
    val delta = docsOf(100L -> "alpha beta zzz-novel qqq-novel")
    val panel = TextQuality.vocabDriftOf(base, delta).collect()
    assert(panel.forall(_.getAs[Boolean]("vocab_retrain")),
      "planted OOV mass must flip the decision")
    assert(panel.head.getAs[Boolean]("oov_drift"))
    assert(panel.head.getAs[Long]("new_tokens") === 2L)
    assert(panel.head.getAs[Double]("oov_rate") === 0.5)
  }

  test("head-token share migration flips via the occ_shift arm " +
      "with zero OOV") {
    val base = docsOf((0L until 20L).map(i =>
      i -> "alpha beta"): _*)
    // delivery re-uses ONLY base vocabulary but all mass moves to one
    // token: alpha's share 0.5 -> 1.0, a 50-point migration
    val delta = docsOf((100L until 110L).map(i => i -> "alpha"): _*)
    val panel = TextQuality.vocabDriftOf(base, delta).collect()
    assert(panel.head.getAs[Double]("oov_rate") === 0.0)
    assert(panel.exists(_.getAs[Boolean]("occ_shift")))
    assert(panel.forall(_.getAs[Boolean]("vocab_retrain")))
  }

  test("in-distribution delivery stays quiet on the fixture") {
    val panel = TextQuality
      .vocabDriftCheck(spark, TestSpark.sfDir).collect()
    assert(panel.nonEmpty)
    assert(panel.forall(!_.getAs[Boolean]("vocab_retrain")),
      "fixture delivery is same-generator: the gauge must stay quiet")
  }
}
