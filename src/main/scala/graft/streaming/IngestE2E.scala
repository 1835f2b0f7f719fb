package graft.streaming

import java.nio.file.{Files, Paths}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked end-to-end run of the Structured Streaming ingest
  * pipeline (the reference's one real user journey, SURVEY.md §3.1:
  * upload → split → process → upsert → status): two JSON-array delivery
  * files plus one poison file are dropped in a landing dir, the stream
  * drains them (Trigger.AvailableNow), and the resulting products
  * snapshot / control table are returned. Every nondeterministic column
  * (paths, timestamps) is projected away, so the DuckDB oracle is a
  * literal VALUES table of the exactly-known final state.
  *
  * The fixture exercises: open-schema merge (files with different key
  * sets), `_id` drop (A5), provenance stamps (A6), validation failure
  * counting (A7 — one record lacks `code`), `$set` field retention (A8 —
  * delivery 2 updates product 0001 WITHOUT a `brands` field; the merged
  * row must keep delivery 1's value), whole-file poison quarantine (A17)
  * and the terminal status machine (A10).
  */
object IngestE2E {

  private val week1 =
    """[
      |  {"code": "0001", "product_name": "Oat Milk", "brands": "Acme"},
      |  {"code": "0002", "product_name": "Rye Bread", "_id": "drop-me"},
      |  {"product_name": "no code so counted failed"},
      |  {"code": "0003", "product_name": "Green Tea", "quantity": "500 g"}
      |]""".stripMargin

  private val week2 =
    """[
      |  {"code": "0001", "product_name": "Oat Milk Deluxe"},
      |  {"code": "0004", "product_name": "Dark Chocolate", "brands": "Choco"}
      |]""".stripMargin

  private val poison = """[{"code": "9999", "product_name": "truncated"""

  /** Run the pipeline in a throwaway workspace — TWO sequential
    * triggers (week-1 delivery + poison, then week 2), so the products
    * store retains a pre-/post-delivery version pair. Returns
    * (products, control, diff) materialized locally (tiny fixture) so
    * the workspace can be deleted before the caller writes results.
    * The diff is [[graft.ingest.SnapshotDiff]] over the store's
    * retained versions — the audit the bounded retention window exists
    * for: week 2 must read as exactly {0001 changed, 0004 added, rest
    * unchanged}. */
  def run(spark: SparkSession): (DataFrame, DataFrame, DataFrame) = {
    val ws = Files.createDirectories(Paths.get(
      "/root/repo/target/graft-e2e/" + java.util.UUID.randomUUID()))
    try {
      val landing = Files.createDirectories(ws.resolve("landing"))
      val cfg = IngestStream.Config(
        landingDir = landing.toString,
        warehouseDir = ws.resolve("warehouse").toString,
        checkpointDir = ws.resolve("checkpoint").toString)
      Files.writeString(landing.resolve("d1_week1.json"), week1)
      Files.writeString(landing.resolve("d3_poison.json"), poison)
      IngestStream.runAvailable(spark, cfg)
      Files.writeString(landing.resolve("d2_week2.json"), week2)
      IngestStream.runAvailable(spark, cfg)

      val store = IngestStream.productsStore(cfg)
      val products = store.read(spark).get
        .select(col("code"), col("product_name"),
          element_at(col("extras"), "brands").as("brands"),
          element_at(col("extras"), "quantity").as("quantity"),
          col("file_id").as("src_file"))
        .orderBy("code")
      val control = IngestStream.controlStore(cfg).read(spark).get
        .select("file_id", "status", "total_records", "records_processed",
          "records_failed")
        .orderBy("file_id")
      val versions = store.versions(spark)
      val diffed = graft.ingest.SnapshotDiff.diff(
          store.readAt(spark, versions(versions.size - 2)).get,
          store.readAt(spark, versions.last).get,
          key = "code", compare = Seq("product_name", "file_id"))
        .orderBy("code")

      // materialize (capped) before deleting the workspace the plans
      // read from — DriveSupport.pin's MaxPinRows guard, like every
      // other drive result
      def pin(df: DataFrame): DataFrame = DriveSupport.pin(spark, df)
      (pin(products), pin(control), pin(diffed))
    } finally {
      Files.walk(ws).sorted(Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => Files.deleteIfExists(p))
    }
  }

  // one pipeline run serves all three query keys within a session (Verify
  // and Bench call them back-to-back); tests wanting a fresh run call run().
  @volatile private var cached
      : Option[(SparkSession, (DataFrame, DataFrame, DataFrame))] = None

  private def memo(spark: SparkSession): (DataFrame, DataFrame, DataFrame) =
    synchronized {
      cached match {
        case Some((s, r)) if s eq spark => r
        case _ =>
          val r = run(spark); cached = Some((spark, r)); r
      }
    }

  def products(spark: SparkSession, dir: String): DataFrame =
    memo(spark)._1

  def control(spark: SparkSession, dir: String): DataFrame =
    memo(spark)._2

  def diff(spark: SparkSession, dir: String): DataFrame =
    memo(spark)._3
}
