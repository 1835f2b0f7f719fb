package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.heavy_hitters_sketch

/** Frequency-sketch operators. The first citizen is Misra–Gries heavy
  * hitters ([[graft.functions.MisraGriesItems]]): fixed-memory per
  * group, map-side combinable, with a DETERMINISTIC completeness
  * guarantee — any item whose true frequency f satisfies (k+1)·f > n
  * survives the sketch regardless of input order, partitioning, or
  * merge tree. That guarantee (and only it) is what the driver key
  * exposes: survivor sets below the bar are merge-order-dependent, so
  * the key outputs the EXACTLY-derived heavy hitters plus a `caught`
  * boolean that the sketch retained each one — deterministic TRUE by
  * the MG theorem, hash-compared against the oracle re-deriving the
  * same exact side with `caught` literal TRUE. */
object Sketches {

  /** The deterministic skewed stream the key runs on: per document, 64
    * items `z(64 div r)` for r = 1..64 — a fixed Zipf-ish ramp (item
    * z1 carries 32/64 of the stream, z2 11/64, … 15 distinct items),
    * so with k = 8 sketch slots exactly two items clear the
    * (k+1)·f > n bar at EVERY scale factor and the sketch is genuinely
    * lossy (15 distinct > 8 slots). Oracle-reproducible by
    * construction (pure integer algebra on doc count). */
  private def stream(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        explode(sequence(lit(1), lit(64))).as("r"))
      .select(expr("concat('z', cast(64 div r as string))").as("item"))

  /** Driver key: exact heavy hitters (9·c > n, pure integer compare —
    * no division-semantics risk) with the MG membership flag. The
    * sketch survivors are a model scalar (≤ k items) — collected like
    * the tfidf corpus count, then applied as a literal predicate. */
  def heavyHitters(spark: SparkSession, dir: String, k: Int = 8)
      : DataFrame = {
    val s = stream(spark, dir).cache()
    try {
      val survivors = s.agg(heavy_hitters_sketch(col("item"), k)
        .as("hh")).first().getSeq[String](0).toSet
      val exact = s.groupBy("item").agg(count(lit(1)).as("c"))
      val total = exact.agg(sum("c")).first().getLong(0)
      exact.filter(col("c") * (k + 1) > total)
        .select(col("item"), col("c").as("exact_cnt"),
          col("item").isInCollection(survivors).as("caught"))
        .orderBy("item")
    } finally s.unpersist()
  }

  /** Count-Min point-frequency bounds (Cormode–Muthukrishnan '05) via
    * Spark's BUILT-IN mergeable `count_min_sketch` aggregate — the
    * Spark-first complement to the custom MG aggregate: where MG
    * answers "which items are heavy", CM answers "how often did THIS
    * item occur" for any item, in w·d counters merged map-side by
    * matrix addition.
    *
    * The driver key exposes the guarantee, not the raw counters (which
    * are hash-layout-internal, like MG's sub-bar survivors): for every
    * distinct item of the fixed [[stream]], its EXACT count plus two
    * in-engine-checked bounds — `overcount_only` (est ≥ exact, a
    * deterministic CM property: counters only ever increase) and
    * `within_eps` (est ≤ exact + ⌈eps·n⌉, the CM error theorem, w.p.
    * ≥ confidence per item; deterministic on the fixture under the
    * fixed seed — at eps = 0.001 the 2000-column rows make collisions
    * among 15 items vanishingly rare, so the sketch is exact here).
    * Oracle re-derives the exact side with both flags literal TRUE.
    * The sketch is a model scalar (w·d longs, broadcast); the per-item
    * probes run EXECUTOR-side over the distributed exact-aggregate
    * rows — the item domain never collects to the driver, so the
    * bound-check path survives a high-cardinality domain at 100 TB
    * (SketchAuditSpec pins both the plan shape and the absence of a
    * data-grain collect). */
  def countMinBound(spark: SparkSession, dir: String,
      eps: Double = 0.001, conf: Double = 0.99, seed: Int = 7)
      : DataFrame = {
    val s = stream(spark, dir).cache()
    try {
      val bytes = s.agg(count_min_sketch(col("item"),
          lit(eps), lit(conf), lit(seed)).as("cm"))
        .first().getAs[Array[Byte]](0)
      // slack needs only the stream total — derived from the one-row
      // sketch already at the driver (a model scalar, like the MG
      // survivor set), never from per-item data
      val slack = math.ceil(eps *
        org.apache.spark.util.sketch.CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(bytes)).totalCount()).toLong
      // probe EXECUTOR-SIDE: the serialized sketch (w·d longs) rides a
      // broadcast and each partition deserializes it once, so the item
      // domain never funnels through the driver — at a high-cardinality
      // 100 TB domain the probe stays one distributed pass over the
      // exact-aggregate rows (the r14 audit's driver-collect fix)
      val bytesB = spark.sparkContext.broadcast(bytes)
      import spark.implicits._
      val probed = s.groupBy("item").agg(count(lit(1)).as("exact_cnt"))
        .as[(String, Long)]
        .mapPartitions { it =>
          val cm = org.apache.spark.util.sketch.CountMinSketch.readFrom(
            new java.io.ByteArrayInputStream(bytesB.value))
          it.map { case (item, cnt) => (item, cnt, cm.estimateCount(item)) }
        }
        .toDF("item", "exact_cnt", "est")
      probed
        .select(col("item"), col("exact_cnt"),
          (col("est") >= col("exact_cnt")).as("overcount_only"),
          (col("est") <= col("exact_cnt") + lit(slack)).as("within_eps"))
        .orderBy("item")
    } finally s.unpersist()
  }

  /** Mergeable distinct-count rollup via Spark's built-in Apache
    * DataSketches HLL aggregates (`hll_sketch_agg` / `hll_union_agg`) —
    * the third sketch citizen: MG answers "which items are heavy", CM
    * answers "how often did this item occur", HLL answers "how many
    * DISTINCT" in a fixed-size, union-mergeable register array.
    *
    * The operator computes per-(event_type, day) user sketches, then
    * rolls them up to per-type totals with `hll_union_agg` — the
    * re-aggregation pattern that matters at 100 TB: daily partials are
    * sketched ONCE at ingest grain and every coarser rollup (week,
    * month, all-time, cross-datacenter) is a union over kilobyte-sized
    * register arrays, never a second scan of raw rows. A plain
    * `count(DISTINCT)` rollup cannot reuse daily results (distinct is
    * not summable); the sketch union is.
    *
    * The driver key exposes the guarantee, not the register internals
    * (which are library-layout-specific, like MG's sub-bar survivors
    * and CM's counter matrix): per event_type, the EXACT distinct user
    * count, the number of daily sketches merged, and a `within_5pct`
    * flag that the union-of-dailies estimate lands within ±5% of exact
    * — deterministic on the fixture (the sketch is a pure function of
    * the value set; at lgK = 12 the relative error is ~1.6% RSE, and
    * the fixture's per-type cardinalities sit far inside the sparse-
    * exact regime). Oracle re-derives the exact side with the flag
    * literal TRUE — the agg_countmin_bound pattern. */
  def hllUnionBound(spark: SparkSession, dir: String,
      lgK: Int = 12): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"),
        col("user_id"))
    val daily = ev.groupBy("event_type", "day")
      .agg(hll_sketch_agg(col("user_id"), lgK).as("sk"))
    val rolled = daily.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"),
        count(lit(1)).cast("long").as("n_days"))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    exact.join(rolled, "event_type")
      .select(col("event_type"), col("exact_users"), col("n_days"),
        (abs(col("est") - col("exact_users")).cast("double") <=
          col("exact_users").cast("double") * 0.05).as("within_5pct"))
      .orderBy("event_type")
  }
}
