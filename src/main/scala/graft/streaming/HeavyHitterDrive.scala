package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Oracle-checked drive of the Misra–Gries sketch
  * ([[graft.functions.MisraGriesItems]]) running INSIDE streaming
  * window state — the sketch's serialize/deserialize/merge path
  * persists through the state store on EVERY trigger (the
  * [[TopKDrive]] exercise, applied to the frequency sketch): each
  * micro-batch updates the k-bounded buffer, append mode emits the
  * survivors when the watermark closes the window.
  *
  * What the key asserts is ONLY the order-free MG theorem, per window:
  * every item with (k+1)·f > n_window is in that window's survivor
  * set. The output rows are the EXACTLY-derived per-window heavy
  * hitters (deterministic batch algebra over the same events) plus the
  * `caught` membership flag — the oracle re-derives the exact side and
  * pins `caught` to literal TRUE, so a corruption anywhere in the
  * sketch's state-store codec or merge flips the hash.
  *
  * Item stream: every event fans out to the 32-item ramp
  * `z(32 div r), r = 1..32` (the batch `agg_heavy_hitters` fixture's
  * shape at the event grain, halved — 10 distinct items per event
  * still exceed the k = 8 slots) — so EVERY nonempty window is
  * genuinely lossy and exactly z1 (16/32) and z2 (6/32) clear the
  * per-window (k+1)·f > n bar, regardless of how many events the
  * window holds. State at scale: one ≤ k-entry buffer per window —
  * fixed memory, watermark-evicted. */
object HeavyHitterDrive {

  private val itemsExpr =
    "transform(sequence(1, 32), r -> concat('z', cast(32 div r as string)))"

  def heavy(spark: SparkSession, dir: String, k: Int = 8): DataFrame =
    DriveSupport.withWorkspace("graft-hh") { ws =>
      val name = DriveSupport.sinkName("hh_drive")
      val events = Tables.load(spark, dir, "events")
        .select(col("event_id"), col("ts").cast("timestamp").as("ts"))
      // immutable staging (events + up-front sentinel), once per
      // session — see DriveSupport.stagedOnce
      val eDir = DriveSupport.stagedOnce(spark, s"hh|$dir") { sws =>
        val d = sws.resolve("events").toString
        // staged as EIGHT files, not one: the file source maps one
        // small file to one input partition, so a single-file staging
        // would run the 32× explode + sketch partial aggregation —
        // this drive's dominant cost — on ONE task. All files still
        // land in trigger #1 (no maxFilesPerTrigger), so the one-batch
        // drive semantics are untouched; the MG output exposes only
        // the order-free membership guarantee, so partial-aggregation
        // parallelism cannot move it
        events.repartition(8).write.parquet(d)
        // the window-closing sentinel rides the INITIAL staging (r17,
        // the IntervalJoinDrive pattern): batch #1 sees every row at
        // the watermark floor (nothing late), its commit advances the
        // watermark past every real window, and the engine's no-data
        // micro-batch emits them — one data batch instead of two, no
        // mid-drive append. The sentinel's far-future window stays
        // open in state and is dropped by the inner join below — the
        // `events` frame predates the staging
        val maxTs = events.agg(max(col("ts"))).head().getAs[Any](0)
        spark.range(1)
          .select(lit(-1L).as("event_id"),
            (lit(maxTs).cast("timestamp") + expr("INTERVAL 366 days"))
              .as("ts"))
          .write.mode("append").parquet(d)
        d
      }

      // ~720 hourly-window groups per task: without the headroom the
      // ObjectHashAggregate fallback was SORTING the 3.2M exploded rows
      // by window before aggregating (measured: ~0.7 s of the drive)
      DriveSupport.withHashAggHeadroom(spark) {
      DriveSupport.withStreamConfs(spark) {
        val stream = spark.readStream.schema(events.schema).parquet(eDir)
        val q = stream
          .select(col("ts"), explode(expr(itemsExpr)).as("item"))
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour"))
          .agg(graft.functions.heavy_hitters_sketch(col("item"), k)
            .as("hh"))
          .select(col("window.start").as("window_start"), col("hh"))
          .writeStream.format("memory").queryName(name)
          .option("checkpointLocation", ws.resolve("ckpt").toString)
          .outputMode("append").start()
        DriveSupport.draining(q) {
          q.processAllAvailable()
          val survivors = DriveSupport.pin(spark, spark.table(name))
          // fanOut: the exact side re-derives the 32× ramp explode from
          // the one-split events table — single-task otherwise (r20
          // profile: 1.8 s of the drive in that one stage)
          val exact = Tables.fanOut(events)
            .select(date_trunc("hour", col("ts")).as("window_start"),
              explode(expr(itemsExpr)).as("item"))
            .groupBy("window_start", "item").agg(count(lit(1)).as("c"))
          val totals = exact.groupBy("window_start").agg(sum("c").as("n"))
          exact.join(totals, "window_start")
            .filter(col("c") * (k + 1) > col("n"))
            .join(survivors, Seq("window_start"))
            .select(
              col("window_start").cast("timestamp_ntz").as("window_start"),
              col("item"), col("c").as("exact_cnt"),
              array_contains(col("hh"), col("item")).as("caught"))
            .orderBy("window_start", "item")
        }
      }
      }
    }
}
