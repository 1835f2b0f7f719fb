package graft.query

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.{PlanNodes, SparkSuite, TestSpark}

/** Retention-cohort invariants beyond the DuckDB hash compare: cohorts
  * partition the user base, and retained counts re-derive from a
  * driver-side replay of the (user, day) activity set. */
class EventsSpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  test("events_retention: cohorts partition users; counts match a replay") {
    val out = Events.retention(spark, dir).collect()
    assert(out.nonEmpty)
    val activity = graft.core.Tables.load(spark, dir, "events")
      .select(col("user_id"),
        date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1)))
    val byUser = activity.groupBy(_._1).map { case (u, rows) =>
      u -> rows.map(_._2).sortBy(_.toString)
    }
    // every user is in exactly one cohort: sizes sum to the user count
    assert(out.map(_.getAs[Long]("cohort_size")).sum === byUser.size)
    out.foreach { r =>
      val cohortDay = r.getAs[java.time.LocalDateTime]("cohort_day")
      val users = byUser.filter(_._2.head == cohortDay).keySet
      assert(r.getAs[Long]("cohort_size") === users.size)
      def retained(k: Int) = users.count(u =>
        byUser(u).contains(cohortDay.plusDays(k)))
      assert(r.getAs[Long]("d1_retained") === retained(1))
      assert(r.getAs[Long]("d7_retained") === retained(7))
    }
    // the fixture must actually exercise retention, not just cohorts
    assert(out.map(_.getAs[Long]("d1_retained")).sum > 0)
    assert(out.map(_.getAs[Long]("d7_retained")).sum > 0)
  }

  test("retention plan: one event-grain shuffle, three exchanges total") {
    // the scaladoc's scale claim, CI-guarded: user_id hash agg (the only
    // event-grain exchange) + cohort_day rollup hash + the oracle-only
    // final range sort — a join-based phrasing would add a fourth
    val ex = PlanNodes.all(Events.retention(spark, dir))
      .collect { case e: ShuffleExchangeExec => e }
    assert(ex.size <= 3, s"${ex.size} shuffle exchanges:\n${ex.mkString("\n")}")
  }

  test("date-parts plan: scan-side only — no shuffle but the final sort") {
    val ex = PlanNodes.all(Events.dateParts(spark, dir))
      .collect { case e: ShuffleExchangeExec => e }
    assert(ex.size <= 1, s"${ex.size} shuffle exchanges:\n${ex.mkString("\n")}")
  }

  test("variant_funcs: typed extraction, schema inference, round-trip") {
    import org.apache.spark.sql.functions._
    val out = Events.variantExtract(spark, dir).cache()
    try {
      assert(out.filter(col("k_val").isNull).count() === 0,
        "every props row carries k")
      assert(out.filter(col("missing_val").isNotNull).count() === 0,
        "try_variant_get on an absent path must be null, not an error")
      // schema inference sees one uniform object shape on this fixture
      val v = graft.core.Tables.load(spark, dir, "events")
        .select(parse_json(col("props")).as("v"))
      val shapes = v.select(schema_of_variant(col("v")).as("s"))
        .distinct().collect().map(_.getString(0)).toSet
      assert(shapes === Set("OBJECT<k: BIGINT>"), s"got $shapes")
      // binary variant → json round-trips to the original (modulo the
      // fixture's one space after the colon)
      val bad = graft.core.Tables.load(spark, dir, "events")
        .select(col("props"), to_json(parse_json(col("props"))).as("rt"))
        .filter(col("rt") =!= regexp_replace(col("props"), ": ", ":"))
      assert(bad.count() === 0, "variant round-trip must preserve value")
    } finally out.unpersist()
  }

  test("variant_safe: try_parse_json NULLs on corrupt input; parse_json throws") {
    import org.apache.spark.sql.functions._
    val out = Events.variantSafe(spark, dir).cache()
    try {
      assert(out.filter(col("bad_parsed")).count() === 0,
        "truncated (unbalanced) JSON must parse to NULL on every row")
      assert(out.filter(col("k_val").isNull).count() === 0,
        "the good-parse lane must still extract k on every row")
    } finally out.unpersist()
    // Literal corrupt fixtures: the exact poison shapes the reference's
    // file splitter quarantines (truncated object, truncated array,
    // non-JSON prose) NULL under try_parse_json ...
    import spark.implicits._
    val fix = Seq(
      ("""{"k": 1}""", false), ("""{oops""", true),
      ("""[1, 2""", true), ("not json at all", true)).toDF("s", "corrupt")
    assert(fix.filter(
      try_parse_json(col("s")).isNull =!= col("corrupt")).count() === 0,
      "try_parse_json must NULL exactly on the corrupt rows")
    // ... while the throwing form aborts the batch on the same input —
    // the documented reason variant_safe uses try_parse_json
    intercept[Exception] {
      fix.select(parse_json(col("s"))).collect()
    }
  }
}
