package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ingest.{Tracker, Upsert}

/** Oracle-checkable forms of the reference's pipeline semantics (SURVEY.md
  * §2 A8/A9/A10 as B12/B19), driven from the deterministic test tables so
  * the DuckDB oracle can replay them in SQL.
  */
object PipelineOps {

  /** B12: two synthetic "weekly deliveries" carved out of `orders`
    * (delivery 1 = even orderkeys, delivery 2 = orderkeys % 3 == 0) merged
    * with the engine's real upsert operator — delivery 2 wins on key
    * collision, exactly the reference's last-writer-wins
    * (data_processor.py:106-110). */
  def upsertProducts(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    val d1 = orders.filter(col("o_orderkey") % 2 === 0)
      .withColumn("delivery", lit(1))
    val d2 = orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("delivery", lit(2))
    Upsert.merge(snapshot = d1, delta = d2, key = "o_orderkey")
      .orderBy("o_orderkey")
  }

  /** B19: the A9/A10 counter + status machine over `events` treated as
    * per-user ingest streams: an 'error' event is a failed record. */
  def statusRollup(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
      .withColumnRenamed("user_id", "file_id")
    val counters = events.groupBy("file_id").agg(
      count(lit(1)).as("total_records"),
      sum(when(col("event_type") =!= "error", 1L).otherwise(0L))
        .as("records_processed"),
      sum(when(col("event_type") === "error", 1L).otherwise(0L))
        .as("records_failed"))
    Tracker.withStatus(counters)
      .select("file_id", "total_records", "records_processed",
        "records_failed", "status")
      .orderBy("file_id")
  }
}
