package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Oracle-checked, SF-scaled drive of `dropDuplicatesWithinWatermark`
  * (EventStreams.dedup) — completes the streaming-state-machine set in
  * the driver gates (interval joins, transformWithState,
  * session_window, dedup).
  *
  * The at-least-once regime is simulated with the real table: the
  * ENTIRE events table is delivered twice — once in trigger #1 and
  * again (byte-identical re-delivery) in trigger #2. After trigger #1
  * the watermark sits at max(ts) − 1 h, so a re-delivered row is
  * absorbed by ONE of two mechanisms, both of which must work: rows
  * older than the watermark are dropped by the late-row filter, and
  * rows inside the final hour are dropped by the cross-batch dedup
  * state. Exactly-once restoration means the output is the original
  * table, which is the oracle: a plain projection of events. Output
  * rows don't need a sentinel flush (dedup emits survivors eagerly in
  * append mode). The restart drive (RestartRecoverySpec) isolates the
  * state path: a state-store loss across its checkpoint restart would
  * re-emit the inside-horizon duplicates.
  *
  * State at scale: one state row per event_id younger than the
  * watermark horizon — the bounded-state contract that plain
  * dropDuplicates on a stream lacks; hash-partitioned by key
  * (4-partition pin, the IntervalJoinDrive rationale). */
object DedupDrive {

  def dedup(spark: SparkSession, dir: String): DataFrame =
    DriveSupport.withWorkspace("graft-dedup") { ws =>
      val name = DriveSupport.sinkName("dedup_drive")
      val events = Tables.load(spark, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts").cast("timestamp").as("ts"), col("value"))
      val eDir = ws.resolve("events").toString
      events.coalesce(1).write.parquet(eDir)

      DriveSupport.withStreamConfs(spark) {
        val stream = spark.readStream.schema(events.schema).parquet(eDir)
        val q = EventStreams.dedup(stream)
          .writeStream.format("memory").queryName(name)
          .option("checkpointLocation", ws.resolve("ckpt").toString)
          .outputMode("append").start()
        DriveSupport.draining(q) {
          q.processAllAvailable()
          // trigger #2: the full re-delivery — every row a duplicate the
          // cross-batch state must drop
          events.coalesce(1).write.mode("append").parquet(eDir)
          q.processAllAvailable()
          DriveSupport.pin(spark, spark.table(name))
            .withColumn("ts", col("ts").cast("timestamp_ntz"))
            .orderBy("event_id")
        }
      }
    }
}
