package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.core.Tables.moneySum

/** Date-partitioned layout: the other half of the storage story next to
  * [[graft.query.Bucketed]]. Events written `partitionBy(day)` give
  * every day its own directory; a day-ranged query then PRUNES — the
  * scan never lists, opens, or reads any other day's files. At 100 TB
  * with years of events, a one-day query touches ~1/1000th of the
  * store. PartitionedSpec asserts the plan (PartitionFilters + one
  * partition read); the `events_pruned` oracle key hash-checks the
  * result against DuckDB aggregating the UNPARTITIONED table — layout
  * must never change answers.
  */
object Partitioned {

  // weak keys so the memo never pins closed SparkSessions; within one
  // session the partitioned copy is immutable-by-assumption (fixtures
  // are read-only — a mutable source would need a freshness check here)
  private val prepared =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Set[String]]()

  private def preparedSet(spark: SparkSession)
      : scala.collection.mutable.Set[String] = {
    val cur = prepared.get(spark)
    if (cur != null) cur
    else {
      val s = scala.collection.mutable.Set.empty[String]
      prepared.put(spark, s); s
    }
  }

  private def tag(dir: String): String =
    java.lang.Integer.toHexString(dir.hashCode)

  private def root(spark: SparkSession, dir: String): String =
    spark.conf.get("spark.sql.warehouse.dir")
      .stripSuffix("/") + s"/graft_events_by_day_${tag(dir)}"

  /** Write events partitioned by event-date (idempotent per
    * session+dir). Partition column granularity is the cardinal rule:
    * day-level ≈ thousands of dirs over years (healthy); never
    * partition by a high-cardinality key (user_id would be millions of
    * tiny dirs — that is what bucketing is for). */
  def ensurePartitioned(spark: SparkSession, dir: String): Unit =
    prepared.synchronized {
      if (!preparedSet(spark).contains(dir)) {
        Tables.load(spark, dir, "events")
          .withColumn("day", to_date(col("ts")))
          .write.mode("overwrite")
          .partitionBy("day")
          .parquet(root(spark, dir))
        preparedSet(spark) += dir
      }
    }

  /** The partitioned store as a DataFrame (partition col `day` is
    * directory-derived). */
  def eventsByDay(spark: SparkSession, dir: String): DataFrame = {
    ensurePartitioned(spark, dir)
    spark.read.parquet(root(spark, dir))
  }

  /** One-day rollup over the partitioned layout — the scan must show
    * `PartitionFilters: [day = …]` and touch exactly one directory.
    * The probed day is data-derived (min event date) so the query works
    * at every SF. */
  def eventsPruned(spark: SparkSession, dir: String): DataFrame = {
    val byDay = eventsByDay(spark, dir)
    val firstDay = Tables.load(spark, dir, "events")
      .agg(min(to_date(col("ts")))).collect()(0).getDate(0)
    byDay.filter(col("day") === lit(firstDay))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        moneySum(col("value")).as("total_value"))
      .orderBy("event_type")
  }
}
