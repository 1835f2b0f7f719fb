package graft.query

import org.apache.spark.sql.functions._

import graft.{SparkSuite, TestSpark}

/** Embedding-level eval-set decontamination
  * ([[TextSim.decontaminateSemantic]]): the planted-leak contract —
  * a verbatim copy of an eval vector in the corpus MUST flag at
  * cosine 1.0 (the paraphrase-leak proxy: any re-encoding at high
  * cosine is a fortiori caught), orthogonal mass must not, and the
  * plan keeps the eval side broadcast. */
class SemanticDecontamSpec extends SparkSuite {

  import spark.implicits._

  private def vec(seed: Int): Array[Float] =
    Array.tabulate(8)(i =>
      (((seed * 31 + i) % 13) - 6).toFloat / 6f)

  test("a planted verbatim leak flags at cos 1.0; orthogonal mass " +
      "does not") {
    val ev = Seq((100L, vec(1)), (200L, vec(2)))
      .toDF("eval_id", "ev")
    // corpus: one exact copy of eval 100, one axis-disjoint vector
    val disjoint = Array.tabulate(8)(i =>
      if (vec(1)(i) == 0f && vec(2)(i) == 0f) 1f else 0f)
    val corpus = Seq((1L, vec(1)), (2L, disjoint))
      .toDF("vec_id", "embedding")
    val hits = TextSim.decontaminateSemanticOf(corpus, ev)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(hits.exists { case (v, e, c) => v == 1L && e == 100L &&
      c == 1.0 }, s"planted leak missed: ${hits.mkString(",")}")
    assert(!hits.exists(_._1 == 2L),
      s"orthogonal vector flagged: ${hits.mkString(",")}")
  }

  test("fixture run is non-vacuous and the eval side broadcasts") {
    val df = TextSim.decontaminateSemantic(spark, TestSpark.sfDir)
    assert(df.count() > 0, "vacuous: no contamination hits on fixture")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      "eval side must broadcast")
    // no corpus vector pairs with itself or another corpus vector:
    // every reported eval_id is genuinely in the eval split
    assert(df.filter(col("eval_id") % 97 =!= 0).count() === 0L)
    assert(df.filter(col("vec_id") % 97 === 0).count() === 0L)
  }
}
