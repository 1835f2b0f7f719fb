package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.core.Tables.{dec2, moneySum}

/** Event-time windowing (SURVEY.md §2 B17–B19): batch-equivalent forms of
  * the streaming operators, oracle-checkable in SQL. The true streaming
  * forms (watermark + window/session_window over a streaming source) are
  * [[graft.streaming.EventStreams]], exercised by StreamingEventsSpec —
  * the window SEMANTICS here and there are identical Spark built-ins.
  *
  * Scale: tumbling/sliding windows are plain hash aggregations on
  * (window, key) — partial agg map-side, one shuffle. Session windows
  * (gaps-and-islands) need per-user ordering: one shuffle on user_id, then
  * lag + running sum inside each partition; at 100 TB the user_id hash
  * partitioning bounds state per task.
  */
object Events {

  /** B17: 1-hour tumbling count/sum per event_type. */
  def tumbling(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        moneySum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))
      .orderBy("window_start", "event_type")

  /** B17b: 1-hour windows sliding every 30 minutes (each event lands in
    * exactly 2 windows). */
  def sliding(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"))
      .orderBy("window_start", "event_type")

  /** B18: session windows with a 30-minute inactivity gap, batch form via
    * gaps-and-islands: session boundary where the gap from the previous
    * event of the same user exceeds 30 min; session id = running count of
    * boundaries. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val runner = byUser.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    Tables.load(spark, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new_session",
        // interval comparison (not unix_micros): works for both TIMESTAMP
        // and TIMESTAMP_NTZ inputs; gap strictly > 30 min opens a session.
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("is_new_session")).over(runner))
      .groupBy("user_id", "session_id")
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        moneySum(col("value")).as("session_value"))
      .orderBy("user_id", "session_id")
  }

  /** Streaming-dedup batch twin: an at-least-once source re-delivers a
    * subset of events (every 5th, simulated deterministically); dedup on
    * the event key restores exactly-once counts. The oracle aggregates
    * the ORIGINAL table — hash-equality proves the re-delivered rows
    * were fully eliminated. Streaming form:
    * [[graft.streaming.EventStreams.dedup]]
    * (dropDuplicatesWithinWatermark — state bounded by the watermark
    * horizon instead of growing with the stream). */
  def streamDedup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val redelivered = ev.filter(col("event_id") % 5 === 0)
    ev.unionByName(redelivered)
      .dropDuplicates("event_id")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        moneySum(col("value")).as("total_value"))
      .orderBy("event_type")
  }

  /** Semi-structured extraction: pull a typed field out of the JSON
    * `props` column and aggregate on it — the "JSON payload riding
    * along in a string column" pattern every event pipeline has.
    * `get_json_object` is codegen'd path extraction on the raw string
    * (no full from_json materialization of a schema we mostly don't
    * need); at 100 TB, promote hot fields to real columns at ingest and
    * keep the raw JSON for the long tail (same decision as the products
    * `extras`/`raw` split, SURVEY.md §1.2). */
  def propsExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .withColumn("k",
        get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        count(when(col("k") > 50, 1)).as("n_high"))
      .orderBy("event_type")

  /** Ordered funnel: view → click → purchase, each stage's timestamp
    * the EARLIEST occurrence at-or-after the previous stage (the
    * classic product-analytics conversion funnel). Three per-stage
    * minimum aggregations chained by (user, time) joins — each stage's
    * frame is one hash agg keyed on user_id, no window over the full
    * event set, no ordering shuffle; at 100 TB every stage partitions
    * by user and the stage frames shrink monotonically. Output: one row
    * per stage with reached-user counts and the conversion rate from
    * the previous stage. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t_view"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") >= col("t_view"))
      .groupBy("user_id").agg(min(col("ts")).as("t_click"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") >= col("t_click"))
      .groupBy("user_id").agg(min(col("ts")).as("t_purchase"))
    val counts = v.agg(count(lit(1)).as("n")).withColumn("stage", lit("1_view"))
      .unionByName(c.agg(count(lit(1)).as("n")).withColumn("stage", lit("2_click")))
      .unionByName(p.agg(count(lit(1)).as("n")).withColumn("stage", lit("3_purchase")))
    val w = Window.orderBy("stage") // 3 rows: trivially single-partition
    counts
      .withColumn("conv_from_prev",
        round(col("n").cast("double") /
          coalesce(lag(col("n"), 1).over(w), col("n")), 6))
      .select("stage", "n", "conv_from_prev")
      .orderBy("stage")
  }

  /** D1/D7 retention cohorts — the product-analytics staple: users
    * grouped by their first active day; per cohort, how many returned
    * exactly 1 / 7 days later. Shape at scale: ONE event-grain shuffle
    * — groupBy(user_id) with a map-side-partial collect_set folds each
    * user's distinct active days into one array row, then cohort day
    * (array_min) and the D1/D7 membership tests (array_contains) are
    * per-row column algebra; the final rollup shuffles only user-grain
    * rows and groups by cohort day (cardinality = days observed, tiny).
    * A join-based phrasing (cohort ⋈ activity) would shuffle the
    * event-grain data TWICE: distinct() hash-partitions by
    * (user_id, day), which does not satisfy the join's user_id
    * clustering. The per-user array is bounded by days-observed (≤ a
    * few thousand for years of daily grain), so collect_set cannot
    * blow up a task row the way per-doc token arrays can. Day
    * arithmetic stays in timestamp_ntz (session tz UTC) to match the
    * dumped-parquet/oracle convention [[dailyByType]] documents. */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.load(spark, dir, "events")
      // a NULL user is no user: drop it here, matching the join-based
      // SQL phrasing (an equi-join on user_id never matches NULL) —
      // groupBy alone would keep a NULL-user cohort the oracle drops
      .filter(col("user_id").isNotNull)
      .select(col("user_id"),
        date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"))
      .groupBy("user_id")
      .agg(collect_set(col("day")).as("days"))
      .select(col("user_id"), col("days"),
        array_min(col("days")).as("cohort_day"))
    perUser
      .groupBy("cohort_day")
      .agg(count(lit(1)).as("cohort_size"),
        count(when(array_contains(col("days"),
          col("cohort_day") + expr("INTERVAL 1 DAY")), lit(1)))
          .as("d1_retained"),
        count(when(array_contains(col("days"),
          col("cohort_day") + expr("INTERVAL 7 DAY")), lit(1)))
          .as("d7_retained"))
      .orderBy("cohort_day")
  }

  /** Calendar-part extraction panel — the date dimension a warehouse
    * derives at scan time (year/month/day/hour/minute, ISO weekday,
    * month end, days since a fixed epoch). Pure per-row column algebra
    * on the scan, no shuffle (the total ORDER BY is oracle-only).
    * Cross-engine traps this key pins down: Spark's `dayofweek` is
    * Sunday=1 while DuckDB's is Sunday=0 — `weekday(ts) + 1` equals
    * DuckDB's `isodow` (Monday=1) on both; day arithmetic goes through
    * DATE casts so NTZ timestamps never shift. */
  def dateParts(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"),
        year(col("ts")).cast("long").as("y"),
        month(col("ts")).cast("long").as("mo"),
        dayofmonth(col("ts")).cast("long").as("d"),
        hour(col("ts")).cast("long").as("h"),
        minute(col("ts")).cast("long").as("mi"),
        (weekday(col("ts")) + lit(1)).cast("long").as("isodow"),
        last_day(col("ts")).as("month_end"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
          .cast("long").as("days_since"))
      .orderBy("event_id")

  /** Date-spine gap fill (resample): daily counts of high-value events
    * (value > 250) per type, with EVERY (day, type) cell present — days
    * with no qualifying events emit an explicit 0 instead of silently
    * vanishing, which is what a downstream time-series model needs. The
    * spine spans the FULL event range (bounds from the unfiltered table)
    * so gaps exist at every SF. Scale: the only fact-sized work is the
    * filtered daily aggregate; the spine is `sequence()` over a 1-row
    * bounds aggregate cross-joined with the tiny distinct-type set, and
    * the fill join is broadcast — no fact re-shuffle. */
  def gapfill(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val daily = ev.filter(col("value") > 250)
      .groupBy(col("ts").cast("date").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    // global bounds attached via an all-rows window over the PER-TYPE
    // bounds aggregate (one row per type), then sequence+explode emits
    // the (day, type) spine directly — no cross join, so the repo-wide
    // "no cartesian product" plan invariant holds even here
    val everything = Window.partitionBy(lit(1))
    val spine = ev
      .groupBy("event_type")
      .agg(min(col("ts").cast("date")).as("t_lo"),
        max(col("ts").cast("date")).as("t_hi"))
      .withColumn("lo", min(col("t_lo")).over(everything))
      .withColumn("hi", max(col("t_hi")).over(everything))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"))).as("day"))
    spine
      .join(broadcast(daily), Seq("day", "event_type"), "left")
      .na.fill(0L, Seq("n_events"))
      .orderBy("day", "event_type")
  }

  /** Event funnel-ish rollup: per event_type daily counts + distinct
    * users (mixes date_trunc, countDistinct). */
  def dailyByType(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      // date_trunc coerces TIMESTAMP_NTZ → TimestampType; cast back so the
      // dumped parquet stays naive like the DuckDB oracle (session tz is
      // UTC, so the round-trip is value-preserving).
      .groupBy(date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        moneySum(col("value")).as("total_value"))
      .orderBy("day", "event_type")

  /** Semi-structured extraction through the Spark 4 VARIANT type —
    * `parse_json` once into a binary variant, then typed `variant_get`
    * paths — the modern tier above [[propsExtract]]'s per-path string
    * parsing: at 100 TB the JSON text is decoded ONCE per row into a
    * compact binary form and every subsequent path access is a direct
    * offset read, not a re-parse (and a variant column in parquet is
    * shreddable). `try_variant_get` on an absent path pins the
    * null-on-missing contract (the throwing form would fail the row).
    * Typed-BIGINT outputs keep the differential oracle in integer
    * space. Scale: scan-side projection, zero shuffle. */
  def variantExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(col("event_id"), col("event_type"),
        parse_json(col("props")).as("v"))
      .select(col("event_id"), col("event_type"),
        variant_get(col("v"), "$.k", "bigint").as("k_val"),
        try_variant_get(col("v"), "$.missing", "bigint")
          .as("missing_val"))
      .orderBy("event_id")

  /** Poison-tolerant VARIANT parsing — the negative-path twin of
    * [[variantExtract]]. `try_parse_json` yields NULL on malformed
    * input where `parse_json` would abort the whole job: the
    * engine-level analog of the reference's poison routing
    * (`file_splitter.py:74-93` quarantines a malformed file instead of
    * failing the batch). The corrupt input is derived deterministically
    * by truncating the props object's last two characters (drops the
    * closing brace, so the result is always unbalanced → invalid), so
    * BOTH branches flow through the driver hash: `bad_parsed` is false
    * on every row (null-on-corrupt), `k_val` proves the good-parse lane
    * still extracts through the same plan. Choice of form: `parse_json`
    * (throwing) stays the right default for trusted upstream data where
    * a silent NULL would mask corruption; `try_parse_json` is the
    * quarantine-lane choice for raw crawl/user input. Scale: scan-side
    * projection, zero shuffle. */
  def variantSafe(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(col("event_id"),
        try_parse_json(
          expr("substring(props, 1, length(props) - 2)")).as("vbad"),
        try_parse_json(col("props")).as("vgood"))
      .select(col("event_id"),
        col("vbad").isNotNull.as("bad_parsed"),
        variant_get(col("vgood"), "$.k", "bigint").as("k_val"))
      .orderBy("event_id")

  /** Daily-count anomaly flags per event type: z-score of each day's
    * event count against the type's full-history mean/stddev. The
    * moments (Σn, Σn², count) are EXACT integer window sums; both
    * engines then run the identical double expression on them, so the
    * 6-dp rounding only absorbs ulp-level divergence (the agg_corr
    * pattern — built-in stddev would compare two different streaming
    * variance algorithms instead). The flag is derived from the ROUNDED
    * z so the boolean can never disagree across engines while the
    * rounded z agrees.
    *
    * Scale: one (type, day) hash agg with map-side combine reduces the
    * stream to ~types × days rows; the unbounded window then runs over
    * that already-tiny frame — the heavy input never reaches a window. */
  def anomalyDaily(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type")
    Tables.load(spark, dir, "events")
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("s", sum(col("n")).over(w))
      .withColumn("ss", sum(col("n") * col("n")).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("zscore", round(
        (col("n") - col("s").cast("double") / col("cnt")) /
          sqrt((col("ss") - (col("s") * col("s")).cast("double") / col("cnt"))
            / (col("cnt") - lit(1))), 6))
      .select(col("event_type"), col("day"), col("n"), col("zscore"),
        (abs(col("zscore")) > 2.0).as("is_anomaly"))
      .orderBy("event_type", "day")
  }
}
