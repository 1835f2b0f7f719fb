package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Oracle-checked, SF-scaled drive of the custom bounded-heap top-k
  * aggregate ([[graft.functions.TopKPairs]]) running INSIDE streaming
  * window state (EventStreams.windowedTopK) — the aggregate's
  * serialize/deserialize/merge path persists through the state store
  * on every trigger here, a strictly harder exercise than the one
  * shuffle the batch `window_topk_agg` key gives it. Hash-compared
  * against a plain DuckDB hour-window row_number oracle (value DESC,
  * event_id ASC — the aggregate's exact tiebreak), so any corruption
  * in the buffer codec or merge order shows up as a hash mismatch at
  * the driver, not just a spec failure.
  *
  * Mechanics: events staged once through the file source (trigger #1
  * holds all real rows), 1-hour tumbling windows, append mode — a
  * window's top-k emits only when the watermark closes it, so a
  * far-future sentinel row is nudged through twice and filtered out
  * (`event_id = -1` can never rank: every real value is positive, the
  * sentinel value is negative, and its window is filtered anyway).
  *
  * State at scale: one k-bounded buffer per (window) group — fixed
  * memory per group, partial aggregation map-side, watermark-evicted;
  * 4-partition pin per the PERF.md r7 rationale. */
object TopKDrive {

  def topk(spark: SparkSession, dir: String): DataFrame =
    DriveSupport.withWorkspace("graft-topk") { ws =>
      val name = DriveSupport.sinkName("topk_drive")
      val events = Tables.load(spark, dir, "events")
        .select(col("event_id"),
          col("ts").cast("timestamp").as("ts"), col("value"))
      // immutable staging (events + up-front sentinel), once per
      // session — see DriveSupport.stagedOnce
      val eDir = DriveSupport.stagedOnce(spark, s"topk|$dir") { sws =>
        val d = sws.resolve("events").toString
        events.coalesce(1).write.parquet(d)
        // window-closing sentinel staged up front (r17, the
        // IntervalJoinDrive pattern): batch #1 sees everything at the
        // watermark floor, the no-data batch emits the closed windows
        // — one data batch, no mid-drive append
        val maxTs = events.agg(max(col("ts"))).head().getAs[Any](0)
        spark.range(1)
          .select(lit(-1L).as("event_id"),
            (lit(maxTs).cast("timestamp") + expr("INTERVAL 366 days"))
              .as("ts"),
            lit(-1.0).as("value"))
          .write.mode("append").parquet(d)
        d
      }

      // ~720 hourly-window groups: same ObjectHashAggregate fallback as
      // HeavyHitterDrive — keep the k-bounded buffers in the hash regime
      DriveSupport.withHashAggHeadroom(spark) {
      DriveSupport.withStreamConfs(spark) {
        val stream = spark.readStream.schema(events.schema).parquet(eDir)
        val q = EventStreams.windowedTopK(stream)
          .writeStream.format("memory").queryName(name)
          .option("checkpointLocation", ws.resolve("ckpt").toString)
          .outputMode("append").start()
        DriveSupport.draining(q) {
          q.processAllAvailable()
          DriveSupport.pin(spark,
              spark.table(name).filter(col("event_id") =!= -1L))
            .select(
              col("window_start").cast("timestamp_ntz").as("window_start"),
              col("rn"), col("event_id"), col("value"))
            .orderBy("window_start", "rn")
        }
      }
      }
    }
}
