package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

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
      // immutable staging (events + up-front sentinel), once per
      // session — see DriveSupport.stagedOnce
      val eDir = DriveSupport.stagedOnce(spark, s"session|$dir") { sws =>
        val d = sws.resolve("events").toString
        events.coalesce(1).write.parquet(d)
        // session-closing sentinel staged up front (r17, the
        // IntervalJoinDrive pattern): batch #1 sees everything at the
        // watermark floor, the no-data batch emits the closed
        // sessions — one data batch, no mid-drive append
        val maxTs = events.agg(max(col("ts"))).head().getAs[Any](0)
        spark.range(1)
          .select(lit(-1L).as("user_id"),
            (lit(maxTs).cast("timestamp") + expr("INTERVAL 366 days"))
              .as("ts"),
            lit(0.0).as("value"))
          .write.mode("append").parquet(d)
        d
      }

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

  /** The same session_window drive, but STOPPED and RESTARTED from its
    * checkpoint mid-stream — the RestartRecoverySpec recovery property
    * promoted to a driver-checkable oracle key: the union of both
    * incarnations' append emissions must still hash-match the identical
    * gaps-and-islands oracle the uninterrupted drive uses.
    *
    * The restart cut is data-derived for anti-vacuity (the spec's
    * sessionCut): the predecessor timestamp of some event that
    * CONTINUES a session — the session's head lands in incarnation #1,
    * its tail in incarnation #2, so a lost state store emits that
    * session split (two rows) or not at all, never the oracle's one
    * row. The memory sink refuses checkpoint recovery, so emissions
    * drain through foreachBatch into a driver-side buffer via
    * DriveSupport.bufferBatch — the cumulative MaxPinRows guard, same
    * cap discipline as DriveSupport.pin. */
  def sessionsRestart(spark: SparkSession, dir: String): DataFrame =
    DriveSupport.withWorkspace("graft-session-restart") { ws =>
      val events = Tables.load(spark, dir, "events")
        .select(col("user_id"),
          col("ts").cast("timestamp").as("ts"), col("value"))

      // cut = latest prev-ts of a session-continuing event (strictly
      // later, gap <= 30 min): state provably straddles the stop
      val byTs = Window.partitionBy("user_id").orderBy("ts")
      val cutRows = events
        .withColumn("prev", lag(col("ts"), 1).over(byTs))
        .filter(col("prev").isNotNull && col("ts") > col("prev") &&
          col("ts") <= col("prev") + expr("INTERVAL 30 MINUTES"))
        .orderBy(desc("prev")).select(col("prev")).limit(1).collect()
      require(cutRows.nonEmpty, "fixture precondition: need a " +
        "multi-event session to straddle the restart — regenerated " +
        "events table?")
      val cut = cutRows(0).getTimestamp(0)

      DriveSupport.withStreamConfs(spark) {
        val eDir = ws.resolve("events").toString
        events.filter(col("ts") <= lit(cut)).coalesce(1).write.parquet(eDir)
        val out = spark.readStream.schema(events.schema).parquet(eDir)
          .withWatermark("ts", "1 hour")
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(min(col("ts")).as("session_start"),
            max(col("ts")).as("session_end"),
            count(lit(1)).as("n_events"),
            moneySum(col("value")).as("session_value"))
          .select(col("user_id"), col("session_start"), col("session_end"),
            col("n_events"), col("session_value"))
        val buf = new ConcurrentLinkedQueue[Row]
        val ckpt = ws.resolve("ckpt").toString
        def incarnation(deliver: StreamingQuery => Unit): Unit = {
          val q = out.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch { (b: Dataset[Row], _: Long) =>
              DriveSupport.bufferBatch(buf, b)
            }.start()
          try deliver(q) finally q.stop()
        }
        incarnation(_.processAllAvailable())
        // the tail AND the session-closing sentinel are staged before
        // incarnation #2 starts (r17, the IntervalJoinDrive pattern):
        // its single batch replays state from the checkpoint, absorbs
        // both files at the recovered watermark (which real tail rows
        // beat by construction — the cut is 30 min behind them), and
        // the no-data batch emits every closed session
        val maxTs = events.agg(max(col("ts"))).head().getTimestamp(0)
        events.filter(col("ts") > lit(cut)).coalesce(1)
          .write.mode("append").parquet(eDir)
        spark.range(1).select(lit(-1L).as("user_id"),
            (lit(maxTs) + expr("INTERVAL 366 days")).as("ts"),
            lit(0.0).as("value"))
          .write.mode("append").parquet(eDir)
        incarnation(_.processAllAvailable())
        val byUser = Window.partitionBy("user_id")
          .orderBy(col("session_start").asc)
        // buf is already driver-side: createDataFrame yields a
        // session-owned LocalRelation, no pin needed
        spark.createDataFrame(new java.util.ArrayList[Row](buf), out.schema)
          .filter(col("user_id") =!= -1L)
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
