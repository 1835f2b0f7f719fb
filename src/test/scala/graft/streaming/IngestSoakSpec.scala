package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Schemas.Status

/** Reference-cadence soak: the reference's stated real workload is a
  * weekly delivery of ~50,000 products (reference README.md:10,19-20);
  * the e2e fixtures elsewhere are tiny. One 50k-record JSON-array
  * delivery runs through the full checkpointed pipeline (split,
  * validate, upsert, counters, status), then a second 50k delivery
  * overlapping half of it proves field-level `$set` merge at that size
  * — 25k updates that must retain the first delivery's extras plus 25k
  * inserts. Wall-clock for both triggers is printed and recorded in
  * PERF.md. */
class IngestSoakSpec extends SparkSuite {

  import spark.implicits._

  private def record(i: Int, suffix: String = "", extras: Boolean = true)
      : String = {
    val core = f""""code":"$i%07d","product_name":"Product $i$suffix""""
    if (extras) s"""{$core,"brands":"Brand${i % 97}","quantity":"$i g"}"""
    else s"{$core}"
  }

  private def delivery(ids: Range, suffix: String = "",
      extras: Boolean = true): String =
    ids.map(record(_, suffix, extras)).mkString("[", ",", "]")

  test("50k-product weekly delivery, then a 50k overlapping $set merge") {
    withTmpDir { ws =>
      val landing = Files.createDirectories(ws.resolve("landing"))
      val cfg = IngestStream.Config(
        landingDir = landing.toString,
        warehouseDir = ws.resolve("wh").toString,
        checkpointDir = ws.resolve("ckpt").toString)

      // ---- week 1: 50,000 fresh products ------------------------------
      Files.writeString(landing.resolve("w1_products.json"),
        delivery(1 to 50000))
      val t0 = System.nanoTime()
      IngestStream.runAvailable(spark, cfg)
      val week1Sec = (System.nanoTime() - t0) / 1e9

      val snap1 = IngestStream.productsStore(cfg).read(spark).get
      assert(snap1.count() === 50000L)
      val ctl1 = IngestStream.controlStore(cfg).read(spark).get
        .filter(col("file_id") === "w1_products.json")
        .select("status", "total_records", "records_processed",
          "records_failed").head()
      assert(ctl1.getString(0) === Status.Processed)
      assert((ctl1.getLong(1), ctl1.getLong(2), ctl1.getLong(3))
        === ((50000L, 50000L, 0L)))

      // ---- week 2: 25k updates (no extras fields -> $set must retain
      // week 1's) + 25k inserts -----------------------------------------
      Files.writeString(landing.resolve("w2_products.json"),
        delivery(1 to 25000, suffix = " v2", extras = false).dropRight(1) +
          "," + delivery(50001 to 75000).drop(1))
      val t1 = System.nanoTime()
      IngestStream.runAvailable(spark, cfg)
      val week2Sec = (System.nanoTime() - t1) / 1e9

      val snap2 = IngestStream.productsStore(cfg).read(spark).get.cache()
      try {
        assert(snap2.count() === 75000L)
        // updated records carry week 2's name AND week 1's extras ($set)
        val updated = snap2.filter(col("code") === "0012345").head()
        assert(updated.getAs[String]("product_name") === "Product 12345 v2")
        assert(updated.getAs[Map[String, String]]("extras")
          .get("brands").contains(s"Brand${12345 % 97}"))
        assert(updated.getAs[String]("file_id") === "w2_products.json")
        // untouched and inserted records intact
        assert(snap2.filter(col("code") === "0030000")
          .head().getAs[String]("product_name") === "Product 30000")
        assert(snap2.filter(col("code") === "0060000")
          .head().getAs[String]("product_name") === "Product 60000")
        // aggregate merge accounting: every v2 name exactly once
        assert(snap2.filter(col("product_name").endsWith(" v2")).count()
          === 25000L)
      } finally snap2.unpersist()

      val ctl2 = IngestStream.controlStore(cfg).read(spark).get
        .filter(col("file_id") === "w2_products.json")
        .select("status", "total_records", "records_processed",
          "records_failed").head()
      assert(ctl2.getString(0) === Status.Processed)
      assert((ctl2.getLong(1), ctl2.getLong(2), ctl2.getLong(3))
        === ((50000L, 50000L, 0L)))

      info(f"week1 (50k insert): $week1Sec%.1f s; " +
        f"week2 (25k update + 25k insert): $week2Sec%.1f s")
      println(f"INGEST_SOAK week1=$week1Sec%.1fs week2=$week2Sec%.1fs")
    }
  }
}
