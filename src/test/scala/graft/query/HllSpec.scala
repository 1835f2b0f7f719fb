package graft.query

import org.apache.spark.sql.functions._

import graft.{SparkSuite, TestSpark}

/** Unit checks for the mergeable HLL distinct rollup beyond the DuckDB
  * hash-compare: exact-side tie-out, and the union-vs-direct register
  * equivalence that makes daily sketches REUSABLE for every coarser
  * rollup — at a cardinality far beyond the fixture's sparse regime. */
class HllSpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  test("hll union rollup ties out: exact users, day count, bound flag") {
    val ev = graft.core.Tables.load(spark, dir, "events")
    val want = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("u"),
        countDistinct(to_date(col("ts"))).as("d"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val out = Sketches.hllUnionBound(spark, dir).collect()
    assert(out.map(_.getString(0)).toSet === want.keySet)
    out.foreach { r =>
      val (u, d) = want(r.getString(0))
      assert(r.getLong(1) === u, s"${r.getString(0)} exact_users")
      assert(r.getLong(2) === d, s"${r.getString(0)} n_days")
      assert(r.getBoolean(3), s"${r.getString(0)} within_5pct")
    }
  }

  test("union of partial sketches == the single-shot sketch, and the ±5% bound holds at 200k distinct") {
    val n = 200000L
    val df = spark.range(n)
      .select(col("id").as("v"), (col("id") % 16).as("part"))
    val partials = df.groupBy("part")
      .agg(hll_sketch_agg(col("v"), 12).as("sk"))
    val merged = partials
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
      .first().getLong(0)
    val direct = df
      .agg(hll_sketch_estimate(hll_sketch_agg(col("v"), 12)).as("e"))
      .first().getLong(0)
    // same lgK: a union keeps the per-register max, which is exactly
    // what the direct sketch holds — merging daily partials loses
    // NOTHING vs sketching the raw union. This is the property that
    // lets a 100 TB pipeline sketch at ingest grain once.
    assert(merged === direct, s"union $merged != direct $direct")
    assert(math.abs(merged - n).toDouble <= 0.05 * n,
      s"estimate $merged off exact $n by more than 5%")
  }
}
