package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Oracle-checked, SF-scaled drive of the CUSTOM flatMapGroupsWithState
  * session tracker (EventStreams.sessionTracker) — with this, THREE
  * independent session implementations pin to ONE oracle: the batch
  * gaps-and-islands form (`stream_session`), the native session_window
  * state machine (`stream_session_window`), and this hand-written state
  * machine, which must all agree row-for-row on the real events table
  * (no logout events exist there, so every close is a gap/timeout close
  * — the semantics the three share).
  *
  * Determinism: the tracker accumulates `value` sequentially in event-
  * time order inside its state record, which would differ from the
  * oracle's exact-decimal sum at ulp level — so the drive stages value
  * as WHOLE CENTS (integer-valued doubles add exactly in any order) and
  * divides once at the end: `cents / 100.0` is the correctly-rounded
  * double of the exact decimal total, bit-identical to the oracle's
  * `CAST(SUM(DECIMAL) AS DOUBLE)`. Timestamps flow at full µs precision
  * through the tracker's micros state clock (the r7 precision fix this
  * drive exists to gate). Sentinel rows (user -1) advance the watermark
  * twice so every open session's event-time timeout fires, then are
  * filtered out.
  *
  * State at scale: one fixed-size record per active user, hash-
  * partitioned, watermark-evicted (4-partition pin, PERF.md r7). */
object TrackerDrive {

  def sessions(spark: SparkSession, dir: String): DataFrame =
    DriveSupport.withWorkspace("graft-tracker") { ws =>
      val name = DriveSupport.sinkName("tracker_drive")
      val events = Tables.load(spark, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("ts").cast("timestamp").as("ts"),
          round(col("value") * 100, 0).as("value"))
      // immutable staging (events + up-front sentinel), once per
      // session — see DriveSupport.stagedOnce
      val eDir = DriveSupport.stagedOnce(spark, s"tracker|$dir") { sws =>
        val d = sws.resolve("events").toString
        events.coalesce(1).write.parquet(d)
        // timeout-firing sentinel staged up front (r17, the
        // IntervalJoinDrive pattern): batch #1 runs every user's
        // machine over its full event set at the watermark floor, the
        // commit advances the watermark, and the no-data batch fires
        // the event-time timeouts that close the real sessions — one
        // data batch, no mid-drive append
        val maxTs = events.agg(max(col("ts"))).head().getAs[Any](0)
        spark.range(1)
          .select(lit(-1L).as("user_id"), lit("view").as("event_type"),
            (lit(maxTs).cast("timestamp") + expr("INTERVAL 366 days"))
              .as("ts"),
            lit(0.0).as("value"))
          .write.mode("append").parquet(d)
        d
      }

      DriveSupport.withStreamConfs(spark) {
        import spark.implicits._
        val stream = spark.readStream.schema(events.schema).parquet(eDir)
          .as[EventStreams.UserEvent]
        val q = EventStreams.sessionTracker(stream)
          .writeStream.format("memory").queryName(name)
          .option("checkpointLocation", ws.resolve("ckpt").toString)
          .outputMode("append").start()
        DriveSupport.draining(q) {
          q.processAllAvailable()
          val byUser = Window.partitionBy("user_id")
            .orderBy(col("session_start").asc)
          DriveSupport.pin(spark,
              spark.table(name).filter(col("user_id") =!= -1L))
            .withColumn("session_id",
              row_number().over(byUser).cast("long"))
            .select(col("user_id"), col("session_id"),
              col("session_start").cast("timestamp_ntz")
                .as("session_start"),
              col("session_end").cast("timestamp_ntz").as("session_end"),
              col("n_events"),
              (col("session_value") / 100.0).as("session_value"))
            .orderBy("user_id", "session_id")
        }
      }
    }
}
