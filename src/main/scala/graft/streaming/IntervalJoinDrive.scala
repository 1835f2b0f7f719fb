package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Oracle-checked, SF-scaled drive of the three stream-stream interval
  * joins (EventStreams.intervalJoin / LeftOuter / FullOuter) — the
  * piece that makes them visible to BOTH driver gates: the result is
  * hash-compared against a DuckDB interval-join oracle, and the drive's
  * wall-clock lands in BENCH_r*.json so a state-store regression shows
  * up as a number instead of a hung spec.
  *
  * Mechanics: purchases and views are staged from the REAL events table
  * into a throwaway landing dir, streamed back through the parquet file
  * source, joined with watermarks on both sides, and drained through a
  * memory sink. All real data arrives in trigger #1 (one staged file per
  * side), so no row is ever late against the watermark and the inner
  * output is exactly the batch join of the same inputs. For the outer
  * forms the null-extensions are held in state until the OTHER side's
  * watermark clears their join range, so the drive appends a far-future
  * sentinel row to each side and triggers twice more (the watermark
  * advances one micro-batch behind the data — same nudge-twice pattern
  * as EventStreamsSpec); sentinel rows (event_id = -1) are filtered out
  * of the returned frame. Net: the streaming output is bit-identical to
  * the batch/DuckDB oracle on every row of the real data.
  *
  * The final collect is the memory-sink read-back of a bounded result
  * (the interval join of the SF fixture) — the same driver-side
  * materialization the sink itself performs; not a data-path collect.
  *
  * State at scale: both sides watermarked + time-bounded join condition
  * ⇒ each side's state is evicted once the other side's watermark
  * passes its range — bounded state on unbounded input, per-user-hash
  * partitioned. The drive measures exactly that path (RocksDB/HDFS
  * store build, probe, watermark eviction) at the benched SF.
  */
object IntervalJoinDrive {

  /** Drive one join form ("inner" | "left" | "full") over `dir`'s
    * events table; returns the sentinel-free joined result with a
    * total order. */
  def run(spark: SparkSession, dir: String, mode: String): DataFrame =
    DriveSupport.withWorkspace("graft-ivj") { ws =>
      val name = DriveSupport.sinkName(s"ivj_drive_$mode")
      val events = Tables.load(spark, dir, "events")
      // watermarks require ltz TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP
      // _TYPE on ntz); stage as ltz and cast back on the way out — the
      // session tz is UTC, so the ntz→ltz→ntz round-trip is identity
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          col("ts").cast("timestamp").as("ts"), col("value"))
      val views = events.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("event_id"),
          col("ts").cast("timestamp").as("view_ts"), col("value"))
      val pDir = ws.resolve("purchases").toString
      val vDir = ws.resolve("views").toString
      // one file per side → all real rows land in trigger #1 (no row is
      // late against the not-yet-advanced watermark)
      purchases.coalesce(1).write.parquet(pDir)
      views.coalesce(1).write.parquet(vDir)

      val pStream = spark.readStream.schema(purchases.schema).parquet(pDir)
      val vStream = spark.readStream.schema(views.schema).parquet(vDir)
      val joined = mode match {
        case "inner" => EventStreams.intervalJoin(pStream, vStream,
          keyed = true)
        case "left" => EventStreams.intervalJoinLeftOuter(pStream, vStream,
          keyed = true)
        case "full" => EventStreams.intervalJoinFullOuter(pStream, vStream,
          keyed = true)
      }
      // 4-partition state pin: one state-store instance per partition
      // per side PER MICRO-BATCH dwarfs the join at fixture size
      // (PERF.md r7); production sizes the knob to the cluster.
      DriveSupport.withStreamConfs(spark) {
        val q = joined.writeStream.format("memory").queryName(name)
          .option("checkpointLocation", ws.resolve("ckpt").toString)
          .outputMode("append").start()
        DriveSupport.draining(q) {
          q.processAllAvailable()
          if (mode != "inner") {
            // ONE sentinel advances both watermarks past every real
            // row's join range; the engine's no-data micro-batch then
            // flushes the held null-extensions (r15: second sentinel
            // pass dropped, oracle-identical)
            val maxTs = events.agg(max(col("ts"))).head().getAs[Any](0)
            Seq("366 days").foreach { shift =>
              val sentinel = spark.range(1)
                .select(lit(-1L).as("user_id"), lit(-1L).as("event_id"),
                  (lit(maxTs).cast("timestamp") +
                    expr(s"INTERVAL $shift")).as("ts"),
                  lit(0.0).as("value"))
              sentinel.write.mode("append").parquet(pDir)
              sentinel.toDF("v_user", "event_id", "view_ts", "value")
                .write.mode("append").parquet(vDir)
              q.processAllAvailable()
            }
          }
          val raw = spark.table(name)
            .filter((col("purchase_id").isNull || col("purchase_id") =!= -1L)
              && (col("view_id").isNull || col("view_id") =!= -1L))
          DriveSupport.pin(spark, raw)
            .withColumn("ts", col("ts").cast("timestamp_ntz"))
            .withColumn("view_ts", col("view_ts").cast("timestamp_ntz"))
            .orderBy(asc("purchase_id"), asc("view_id"))
        }
      }
    }

  def inner(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, "inner")
  def left(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, "left")
  def full(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, "full")
}
