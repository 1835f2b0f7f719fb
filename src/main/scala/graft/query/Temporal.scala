package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Temporal joins beyond Spark's built-ins (builder directive: compose
  * existing ops when semantics allow — this is preference (a), no custom
  * plan node needed).
  *
  * As-of joins are usually written as range joins (`l.ts >= r.ts` +
  * aggregation), which Spark plans as a broadcast-nested-loop or a
  * sort-merge over an inequality — O(n·m) per key at worst. The
  * union + ordered carry-forward form here is the scalable shape: tag
  * both sides, ONE hash shuffle on the key, one in-partition sort, and
  * a running `last(payload, ignoreNulls)` window — O((n+m) log(n+m))
  * per key, no pair explosion, same plan family as the engine's other
  * windowed operators. */
object Temporal {

  private val tagCol = "__graft_asof_tag"
  private val payloadCol = "__graft_asof_payload"

  /** For each `left` row, attach the payload of the LATEST `right` row
    * with `right.tsCol <= left.tsCol` for the same `keyCol` (null when
    * no such row). `payload(r)` builds a struct from the right side;
    * `right` must be unique per (key, ts) — pre-aggregate it otherwise
    * (ties at equal ts would be ambiguous in any as-of definition). */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payload: Column): DataFrame = {
    val r = right.select(col(keyCol), col(tsCol),
      payload.as(payloadCol)).withColumn(tagCol, lit(0))
    val l = left.withColumn(tagCol, lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort BEFORE left rows at equal ts → inclusive `<=`
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col(tagCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(payloadCol, last(col(payloadCol), ignoreNulls = true)
        .over(w))
      .filter(col(tagCol) === 1)
      .drop(tagCol)
  }

  /** Oracle-checked form: every `purchase` event paired with the user's
    * most recent prior-or-simultaneous `view` (DuckDB twin: native
    * ASOF LEFT JOIN — an independent implementation of the same
    * semantics). */
  def purchaseAsofView(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("value").as("purchase_value"))
    val views = events.filter(col("event_type") === "view")
      .groupBy("user_id", "ts")
      .agg(max(col("value")).as("view_value"))
    val joined = asofJoin(purchases, views, "user_id", "ts",
      payload = struct(col("ts").as("view_ts"),
        col("view_value").as("view_value")))
    joined.select(col("user_id"), col("event_id"), col("ts"),
        col("purchase_value"),
        col(s"$payloadCol.view_ts").as("view_ts"),
        col(s"$payloadCol.view_value").as("view_value"))
      .orderBy("user_id", "event_id")
  }

  /** FORWARD as-of: for each `left` row, the EARLIEST `right` row with
    * `right.tsCol >= left.tsCol` per key — the "next quote after the
    * trade" direction. Same union-carry machinery as [[asofJoin]],
    * mirrored: descending sort, right rows still first at equal ts so
    * `>=` stays inclusive. */
  def asofJoinForward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payload: Column): DataFrame = {
    val r = right.select(col(keyCol), col(tsCol),
      payload.as(payloadCol)).withColumn(tagCol, lit(0))
    val l = left.withColumn(tagCol, lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).desc, col(tagCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(payloadCol, last(col(payloadCol), ignoreNulls = true)
        .over(w))
      .filter(col(tagCol) === 1)
      .drop(tagCol)
  }

  /** join_asof_forward: every purchase paired with the user's earliest
    * following-or-simultaneous view (DuckDB twin: native ASOF with the
    * inequality flipped). */
  def purchaseAsofNextView(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("value").as("purchase_value"))
    val views = events.filter(col("event_type") === "view")
      .groupBy("user_id", "ts")
      .agg(max(col("value")).as("view_value"))
    val joined = asofJoinForward(purchases, views, "user_id", "ts",
      payload = struct(col("ts").as("view_ts"),
        col("view_value").as("view_value")))
    joined.select(col("user_id"), col("event_id"), col("ts"),
        col("purchase_value"),
        col(s"$payloadCol.view_ts").as("view_ts"),
        col(s"$payloadCol.view_value").as("view_value"))
      .orderBy("user_id", "event_id")
  }

  /** join_asof_tolerance: the backward as-of with pandas
    * `merge_asof(tolerance=...)` semantics — a match older than
    * `toleranceMin` minutes is DISCARDED (both payload columns null),
    * the staleness guard every feature-join pipeline needs. Same
    * single-shuffle plan; the tolerance is one scan-side conditional
    * after the carry-forward. */
  def purchaseAsofViewTolerance(spark: SparkSession, dir: String,
      toleranceMin: Int = 60): DataFrame = {
    val base = purchaseAsofView(spark, dir)
    // exact-microsecond gap: a seconds cast truncates and diverges
    // from the oracle at sub-second boundaries
    val fresh = col("view_ts").isNotNull &&
      unix_micros(col("ts").cast("timestamp")) -
        unix_micros(col("view_ts").cast("timestamp")) <=
        toleranceMin.toLong * 60L * 1000000L
    base.select(col("user_id"), col("event_id"), col("ts"),
        col("purchase_value"),
        when(fresh, col("view_ts")).as("view_ts"),
        when(fresh, col("view_value")).as("view_value"))
      .orderBy("user_id", "event_id")
  }

  /** Interval (time-range) join: per purchase, aggregate the same user's
    * views within the preceding 30 minutes.
    *
    * The naive form — equi-join on user + `BETWEEN` filter — explodes
    * into views-per-user × purchases-per-user pairs per key before
    * filtering; a hot user is quadratic. The scalable shape joins on
    * (user, 30-min time bucket): each purchase probes exactly 2 buckets
    * (its own and the previous — together they cover the full range for
    * a window equal to the bucket width), so the pair fan-out per key is
    * bounded by per-bucket density, and the exact range predicate
    * filters inside the bucket match. Streaming twin:
    * [[graft.streaming.EventStreams.intervalJoin]] (stream-stream join,
    * state bounded by the same range + watermark). Oracle: the naive
    * BETWEEN join in DuckDB — hash-checked equivalence of the two
    * formulations. */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("value").as("purchase_value"))
    val v = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("value").as("view_value"))
    intervalJoinBucketed(p, v, windowMinutes = 30)
      .orderBy("user_id", "event_id")
  }

  /** Core of [[intervalJoin]], reusable and property-testable: per left
    * row, count/max-aggregate right rows of the same user with
    * `view_ts` ∈ (ts − window, ts]. Bucket width = window width, so 2
    * probe buckets (own + previous) cover the whole range: for any t,
    * (t − w, t] spans at most the two width-w buckets containing t and
    * t − w. */
  private[query] def intervalJoinBucketed(p: DataFrame, v: DataFrame,
      windowMinutes: Int): DataFrame = {
    val bucketUs = windowMinutes * 60L * 1000000L
    def bucket(c: Column): Column =
      floor(unix_micros(c.cast("timestamp")) / bucketUs)
    val vb = v.withColumn("v_bk", bucket(col("view_ts")))
    val probes = p.withColumn("bk",
      explode(array(bucket(col("ts")), bucket(col("ts")) - 1)))
    val win = expr(s"INTERVAL $windowMinutes MINUTES")
    val matched = probes.join(vb,
        probes("user_id") === vb("v_user") && col("v_bk") === col("bk") &&
          col("view_ts") > col("ts") - win &&
          col("view_ts") <= col("ts"))
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_prior_views"),
        max(Tables.dec2(col("view_value"))).cast("double")
          .as("max_view_value"))
    p.join(matched, Seq("event_id"), "left")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("purchase_value"),
        coalesce(col("n_prior_views"), lit(0L)).as("n_prior_views"),
        col("max_view_value"))
  }
}
