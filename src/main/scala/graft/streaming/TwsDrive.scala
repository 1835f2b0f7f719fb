package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Oracle-checked, SF-scaled drive of the `transformWithState`
  * running-totals operator (EventStreams.runningTotals) — gives the
  * RocksDB stateful-processing-V2 path a presence in BOTH driver
  * gates, which it otherwise lacks entirely: a provider or state
  * regression currently only surfaces as a spec failure, never as a
  * number or a hash.
  *
  * Mechanics: the events table is staged once through the parquet file
  * source (one file → one micro-batch), grouped per user through the
  * RocksDB-backed ValueState processor, drained into a memory sink in
  * update mode. With a single input batch the sink holds exactly one
  * final record per user — the complete running totals — so the result
  * is hash-comparable to a plain GROUP BY oracle.
  *
  * Determinism: the processor accumulates a Double in per-user state,
  * and the in-batch iterator order is not fixed, so raw 2-dp values
  * would drift at ulp level across runs/engines. The drive therefore
  * stages `value` as WHOLE CENTS in a double (`round(value*100)`):
  * integer-valued doubles add exactly in any order up to 2^53, making
  * the state total bit-deterministic; the output exposes it as a
  * bigint `total_cents`. The `spark.sql.shuffle.partitions` pin and
  * the RocksDB provider conf are captured and restored around the
  * query (the IntervalJoinDrive pattern).
  */
object TwsDrive {

  def totals(spark: SparkSession, dir: String): DataFrame =
    DriveSupport.withWorkspace("graft-tws") { ws =>
      val name = DriveSupport.sinkName("tws_drive")
      val events = Tables.load(spark, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("ts").cast("timestamp").as("ts"),
          round(col("value") * 100, 0).as("value"))
      // immutable staging, once per session — see
      // DriveSupport.stagedOnce
      val eDir = DriveSupport.stagedOnce(spark, s"tws|$dir") { sws =>
        val d = sws.resolve("events").toString
        events.coalesce(1).write.parquet(d)
        d
      }

      DriveSupport.withStreamConfs(spark, provider = Some(
        "org.apache.spark.sql.execution.streaming." +
          "state.RocksDBStateStoreProvider")) {
        import spark.implicits._
        val stream = spark.readStream.schema(events.schema).parquet(eDir)
          .as[EventStreams.UserEvent]
        val q = EventStreams.runningTotals(stream).writeStream
          .format("memory").queryName(name)
          .option("checkpointLocation", ws.resolve("ckpt").toString)
          .outputMode("update").start()
        DriveSupport.draining(q) {
          q.processAllAvailable()
          DriveSupport.pin(spark, spark.table(name)
              .select(col("user_id"), col("n_events"),
                col("total").cast("long").as("total_cents")))
            .orderBy("user_id")
        }
      }
    }
}
