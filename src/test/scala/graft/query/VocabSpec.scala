package graft.query

import org.apache.spark.sql.functions._

import graft.{SparkSuite, TestSpark}

/** Unit checks for the tokenizer-vocabulary coverage cut beyond the
  * DuckDB hash-compare: ordering/monotonicity laws on the fixture, and
  * the exact cut boundary on a constructed corpus. */
class VocabSpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  test("vocab ranking laws: counts non-increasing, shares cumulative to 1, membership a rank prefix") {
    val rows = TextQuality.vocabCoverage(spark, dir).collect()
    assert(rows.nonEmpty)
    // ordered by rank 1..n
    assert(rows.map(_.getLong(2)).toSeq === (1L to rows.length).toSeq)
    // counts never increase along the rank order
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) >= b.getLong(1),
        s"count rose from rank ${a.getLong(2)} to ${b.getLong(2)}")
    case _ => ()
    }
    // the last cumulative share is the whole corpus
    assert(math.abs(rows.last.getDouble(3) - 1.0) < 1e-9)
    // membership is a PREFIX of the rank order (monotone flag)
    val flags = rows.map(_.getBoolean(4)).toSeq
    assert(flags === flags.sortBy(!_), s"in_vocab not a rank prefix: $flags")
    assert(flags.head, "the top-ranked token must always be in-vocab")
    // total count ties out against the raw token count
    val total = graft.core.Tables.load(spark, dir, "documents")
      .select(explode(TextSim.tokens(col("text"))).as("t")).count()
    assert(rows.map(_.getLong(1)).sum === total)
  }

  test("the coverage cut lands exactly where the integer boundary says, on a constructed corpus") {
    import spark.implicits._
    // counts: a=8, b=1, c=1 (total 10). Strictly-before coverage:
    // a: 0 < 9 (in), b: 8 < 9 (in — the boundary token that crosses
    // the bar is IN), c: 9 < 9 false (out).
    val docs = Seq((1L, (Seq.fill(8)("a") ++ Seq("b", "c")).mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("toks", TextSim.tokens(col("text")))
    val out = TextQuality.vocabCoverageOf(docs, covPct = 90).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getBoolean(4)))).toMap
    assert(out("a") === ((1L, true)))
    assert(out("b") === ((2L, true)))
    assert(out("c") === ((3L, false)))
    // ties rank alphabetically: b before c at equal count
  }
}
