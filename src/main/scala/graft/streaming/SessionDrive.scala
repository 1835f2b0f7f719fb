package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.core.Tables.moneySum

/** Oracle-checked, SF-scaled drive of the native `session_window`
  * streaming operator — the third streaming state machine to graduate
  * to both driver gates (after the interval joins and
  * transformWithState): the whole events table flows through the
  * session-merging state store and the emitted sessions are
  * hash-compared against the SAME gaps-and-islands DuckDB oracle the
  * batch `stream_session` key uses.
  *
  * Parity notes. (1) The session aggregation list mirrors the batch
  * form (min/max event ts, count, exact-decimal money sum) so the
  * output is the batch key's schema — `session_window.start/end`
  * (last-event + gap) are window bookkeeping, not the oracle's
  * session_end. (2) `session_id` (the per-user 1..k running index) is
  * assigned after the drain by ordering each user's closed sessions by
  * start time — a window over the pinned, already-tiny session rows.
  * (3) The fixture has NO exact-30-minute same-user gaps at any SF —
  * CI-gated by StreamDriveSpec's fixture-precondition test, so a
  * regenerated fixture fails with a pointed message — hence the
  * strict-vs-inclusive boundary difference between gaps-and-islands
  * (`gap > 30min` opens) and session_window (merge while `next < end`)
  * cannot bite. (4) Append mode only emits
  * watermark-closed sessions, so a far-future sentinel row is nudged
  * through twice (watermark lags one micro-batch) and filtered out.
  *
  * State at scale: session state is per (user, open-session), merged
  * by the native operator and evicted at watermark passage — bounded
  * by active users, hash-partitioned. The drive times exactly that
  * merge/evict path at the benched SF (4-partition pin, the
  * IntervalJoinDrive rationale).
  */
object SessionDrive {

  def sessions(spark: SparkSession, dir: String): DataFrame =
    DriveSupport.withWorkspace("graft-session") { ws =>
      val name = DriveSupport.sinkName("session_drive")
      val events = Tables.load(spark, dir, "events")
        .select(col("user_id"),
          col("ts").cast("timestamp").as("ts"), col("value"))
      val eDir = ws.resolve("events").toString
      events.coalesce(1).write.parquet(eDir)

      DriveSupport.withStreamConfs(spark) {
        val stream = spark.readStream.schema(events.schema).parquet(eDir)
        val q = stream.withWatermark("ts", "1 hour")
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(min(col("ts")).as("session_start"),
            max(col("ts")).as("session_end"),
            count(lit(1)).as("n_events"),
            moneySum(col("value")).as("session_value"))
          .select(col("user_id"), col("session_start"), col("session_end"),
            col("n_events"), col("session_value"))
          .writeStream.format("memory").queryName(name)
          .option("checkpointLocation", ws.resolve("ckpt").toString)
          .outputMode("append").start()
        DriveSupport.draining(q) {
          q.processAllAvailable()
          val maxTs = events.agg(max(col("ts"))).head().getAs[Any](0)
          Seq("366 days", "367 days").foreach { shift =>
            spark.range(1)
              .select(lit(-1L).as("user_id"),
                (lit(maxTs).cast("timestamp") + expr(s"INTERVAL $shift"))
                  .as("ts"),
                lit(0.0).as("value"))
              .write.mode("append").parquet(eDir)
            q.processAllAvailable()
          }
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
              col("n_events"), col("session_value"))
            .orderBy("user_id", "session_id")
        }
      }
    }
}
