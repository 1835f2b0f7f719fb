package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Schemas.Status

/** Reference-cadence soak: the reference's stated real workload is a
  * weekly delivery of ~50,000 products (reference README.md:10,19-20);
  * the e2e fixtures elsewhere are tiny. One n-record JSON-array
  * delivery runs through the full checkpointed pipeline (split,
  * validate, upsert, counters, status), then a second n-record delivery
  * overlapping half of it proves field-level `$set` merge at that size
  * — n/2 updates that must retain the first delivery's extras plus n/2
  * inserts. Wall-clock for both triggers is printed and recorded in
  * PERF.md.
  *
  * `SPARK_GRAFT_SOAK_SCALE` multiplies the delivery size (default 1 →
  * 50k, the reference's cadence; 10 → 500k, the scaling probe whose
  * measurements PERF.md's soak table records — run manually, not in
  * CI, so the suite stays fast). All check codes derive from n. */
class IngestSoakSpec extends SparkSuite {

  private val scale =
    sys.env.getOrElse("SPARK_GRAFT_SOAK_SCALE", "1").toInt
  private val n = 50000 * scale

  private def code(i: Int): String = f"$i%07d"

  private def record(i: Int, suffix: String = "", extras: Boolean = true)
      : String = {
    val core = f""""code":"${code(i)}","product_name":"Product $i$suffix""""
    if (extras) s"""{$core,"brands":"Brand${i % 97}","quantity":"$i g"}"""
    else s"{$core}"
  }

  private def delivery(ids: Range, suffix: String = "",
      extras: Boolean = true): String =
    ids.map(record(_, suffix, extras)).mkString("[", ",", "]")

  test(s"${n / 1000}k-product weekly delivery, then an overlapping " +
      "$set merge at the same size") {
    withTmpDir { ws =>
      val landing = Files.createDirectories(ws.resolve("landing"))
      val cfg = IngestStream.Config(
        landingDir = landing.toString,
        warehouseDir = ws.resolve("wh").toString,
        checkpointDir = ws.resolve("ckpt").toString)

      // ---- week 1: n fresh products -----------------------------------
      Files.writeString(landing.resolve("w1_products.json"),
        delivery(1 to n))
      val t0 = System.nanoTime()
      IngestStream.runAvailable(spark, cfg)
      val week1Sec = (System.nanoTime() - t0) / 1e9

      val snap1 = IngestStream.productsStore(cfg).read(spark).get
      assert(snap1.count() === n.toLong)
      val ctl1 = IngestStream.controlStore(cfg).read(spark).get
        .filter(col("file_id") === "w1_products.json")
        .select("status", "total_records", "records_processed",
          "records_failed").head()
      assert(ctl1.getString(0) === Status.Processed)
      assert((ctl1.getLong(1), ctl1.getLong(2), ctl1.getLong(3))
        === ((n.toLong, n.toLong, 0L)))

      // ---- week 2: n/2 updates (no extras fields -> $set must retain
      // week 1's) + n/2 inserts -----------------------------------------
      Files.writeString(landing.resolve("w2_products.json"),
        delivery(1 to n / 2, suffix = " v2", extras = false).dropRight(1) +
          "," + delivery(n + 1 to n + n / 2).drop(1))
      val t1 = System.nanoTime()
      IngestStream.runAvailable(spark, cfg)
      val week2Sec = (System.nanoTime() - t1) / 1e9

      // probe codes derived from n: one updated (inside 1..n/2), one
      // untouched (n/2+1..n), one inserted (n+1..n+n/2)
      val (iUpd, iKeep, iIns) = (n / 4, 3 * n / 4, n + n / 4)
      val snap2 = IngestStream.productsStore(cfg).read(spark).get.cache()
      try {
        assert(snap2.count() === (n + n / 2).toLong)
        // updated records carry week 2's name AND week 1's extras ($set)
        val updated = snap2.filter(col("code") === code(iUpd)).head()
        assert(updated.getAs[String]("product_name") === s"Product $iUpd v2")
        assert(updated.getAs[Map[String, String]]("extras")
          .get("brands").contains(s"Brand${iUpd % 97}"))
        assert(updated.getAs[String]("file_id") === "w2_products.json")
        // untouched and inserted records intact
        assert(snap2.filter(col("code") === code(iKeep))
          .head().getAs[String]("product_name") === s"Product $iKeep")
        assert(snap2.filter(col("code") === code(iIns))
          .head().getAs[String]("product_name") === s"Product $iIns")
        // aggregate merge accounting: every v2 name exactly once
        assert(snap2.filter(col("product_name").endsWith(" v2")).count()
          === (n / 2).toLong)
      } finally snap2.unpersist()

      val ctl2 = IngestStream.controlStore(cfg).read(spark).get
        .filter(col("file_id") === "w2_products.json")
        .select("status", "total_records", "records_processed",
          "records_failed").head()
      assert(ctl2.getString(0) === Status.Processed)
      assert((ctl2.getLong(1), ctl2.getLong(2), ctl2.getLong(3))
        === ((n.toLong, n.toLong, 0L)))

      info(f"week1 ($n insert): $week1Sec%.1f s; " +
        f"week2 (${n / 2} update + ${n / 2} insert): $week2Sec%.1f s")
      println(f"INGEST_SOAK n=$n week1=$week1Sec%.1fs week2=$week2Sec%.1fs")
    }
  }
}
