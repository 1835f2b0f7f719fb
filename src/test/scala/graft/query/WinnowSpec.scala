package graft.query

import graft.{SparkSuite, TestSpark}

/** Winnowing ([[TextSim.textWinnow]]): the paper's two theorems on
  * planted fixtures — the MATCH GUARANTEE (any shared run of
  * w + k − 1 = 6 tokens shares a selected fingerprint) and the
  * DENSITY bound (~2/(w+1) of grams selected) — plus the
  * rightmost-tie rule and the short-document convention. */
class WinnowSpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  private def fpsOf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    TextSim.textWinnowOf(rows.toDF("doc_id", "text"))
      .as[(Long, Long, String)].collect()
  }

  test("match guarantee: two documents sharing a 6-token run share a " +
      "fingerprint hash, whatever surrounds it") {
    val shared = "red orange yellow green blue indigo"
    val a = s"alpha beta gamma $shared delta epsilon"
    val b = s"one two $shared three four five six seven"
    val fps = fpsOf(Seq((1L, a), (2L, b)))
    val h1 = fps.filter(_._1 == 1L).map(_._3).toSet
    val h2 = fps.filter(_._1 == 2L).map(_._3).toSet
    assert((h1 & h2).nonEmpty, "guaranteed match missed")
  }

  test("density: on fixture documents the selected fraction tracks " +
      "the paper's 2/(w+1) expectation") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val nGrams = docs
      .select(greatest(size(TextSim.tokens(col("text"))) - 2, lit(0))
        .as("n")).agg(sum("n")).head().getLong(0)
    val nSel = TextSim.textWinnow(spark, dir).count()
    val density = nSel.toDouble / nGrams
    // E[density] = 2/(w+1) = 0.4 for w=4; allow a generous band (real
    // text repeats grams, which lowers distinct selections slightly)
    assert(density > 0.25 && density < 0.55, s"density $density")
  }

  test("rightmost tie rule: a constant-token document selects each " +
      "window's last position") {
    // every 3-gram is "x x x" -> identical hashes -> ties everywhere
    val fps = fpsOf(Seq((1L, Seq.fill(10)("x").mkString(" "))))
    // 8 grams, windows j=1..5 select position j+3 -> positions 4..8
    assert(fps.map(_._2).sorted.toSeq === Seq(4L, 5L, 6L, 7L, 8L))
  }

  test("short documents winnow as one window; sub-k docs emit nothing") {
    val fps = fpsOf(Seq(
      (1L, "a b c d"), // 2 grams < w -> one window, one selection
      (2L, "a b")))    // < k tokens -> nothing
    assert(fps.count(_._1 == 1L) === 1)
    assert(!fps.exists(_._1 == 2L))
  }
}
