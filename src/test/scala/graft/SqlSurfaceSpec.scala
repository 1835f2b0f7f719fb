package graft

import graft.core.Tables

/** The SQL surface: oracle strings that are plain ANSI must run on
  * Spark's own SQL engine (views via Tables.registerAll) and agree with
  * the DataFrame forms — a third dialect cross-check next to DuckDB,
  * and proof the engine serves spark.sql users, not just the DataFrame
  * API. (DuckDB-specific keys — list functions, ASOF JOIN, quantile_cont,
  * time_bucket — are excluded; DuckDB alone covers those.) */
class SqlSurfaceSpec extends SparkSuite {

  private val portableKeys = Seq(
    "scan_filter_project", "q1_agg", "join_broadcast", "join_multi",
    "q5_multi_join_agg", "join_semi", "join_anti", "agg_distinct",
    "sort_limit", "set_union", "set_except", "set_intersect",
    "window_topk", "window_running", "join_bucketed", "join_skew_salted",
    "stream_dedup", "scan_zorder",
    // round-6 additions that are plain ANSI (BY NAME unions, isodow,
    // GROUPING(a,b) and list functions stay DuckDB-only; events_retention
    // is value-identical but its CAST(ts AS TIMESTAMP) lands on
    // TimestampType under spark.sql vs the NTZ DataFrame convention)
    "join_outer_left", "join_outer_full", "orders_with_exists",
    "customers_without_urgent", "parts_below_avg_qty",
    "window_rank_stats", "agg_conditional", "corpus_hist",
    "string_funcs")

  test("portable oracle SQL runs on spark.sql and matches the DataFrame form") {
    val dir = TestSpark.sfDir
    Tables.registerAll(spark, dir)
    portableKeys.foreach { key =>
      val viaSql = spark.sql(SparkEntry.oracleSql(key))
        .collect().map(_.toString).sorted.toSeq
      val viaDf = SparkEntry.queries(key)(spark, dir)
        .collect().map(_.toString).sorted.toSeq
      assert(viaSql === viaDf, s"$key: spark.sql != DataFrame form")
    }
  }
}
