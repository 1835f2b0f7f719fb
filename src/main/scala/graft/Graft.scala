package graft

import java.io.InputStream

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ingest.Upload
import graft.query.Finders
import graft.streaming.IngestStream

/** The reference's user-facing API as one object — a user of
  * pcustic/data-pipeline-challenge maps each HTTP endpoint to one
  * method here (reference routes at app/api/main.py:59-184):
  *
  *   POST /upload                         → [[Graft.upload]]
  *   (async queue pipeline)               → [[Graft.processAvailable]]
  *     or [[Graft.startStream]] for a long-running continuous pipeline
  *   GET /upload/status/{file_id}         → [[Graft.uploadStatus]]
  *   GET /product/find/code/{code}        → [[Graft.findByCode]]
  *   GET /product/find/name/partial/{t}   → [[Graft.findPartial]]
  *   GET /product/find/name/exact/{t}     → [[Graft.findExact]]
  *
  * "404" semantics are an empty DataFrame (the HTTP layer, which the
  * reference implements in FastAPI, is out of engine scope by design —
  * SURVEY.md §2 A1). All reads serve from the last committed snapshot
  * (manifest-pointer atomicity), so a reader never observes a partial
  * upsert — the property MongoDB gave the reference for free.
  */
class Graft(spark: SparkSession, cfg: IngestStream.Config) {

  /** Land a delivery (1 MiB chunked, atomic visibility); returns the
    * file_id used by [[uploadStatus]] — the reference returns the same
    * identifier in its `status_url`. */
  def upload(originalName: String, in: InputStream): String =
    Upload.land(cfg.landingDir, originalName, in).getFileName.toString

  def uploadString(originalName: String, body: String): String =
    Upload.landString(cfg.landingDir, originalName, body)
      .getFileName.toString

  /** Drain everything currently landed through the checkpointed
    * pipeline (the batch twin of the reference's always-on workers). */
  def processAvailable(): Unit = IngestStream.runAvailable(spark, cfg)

  /** Continuous form: returns the running StreamingQuery. */
  def startStream(): org.apache.spark.sql.streaming.StreamingQuery =
    IngestStream.start(spark, cfg)

  // schemaful empties: pre-first-ingest lookups must return the "404"
  // empty DataFrame, not fail column resolution on a 0-column frame
  private def products: DataFrame =
    IngestStream.productsStore(cfg).read(spark)
      .getOrElse(IngestStream.emptyProducts(spark))
  private def control: DataFrame =
    IngestStream.controlStore(cfg).read(spark)
      .getOrElse(IngestStream.emptyControl(spark))

  def uploadStatus(fileId: String): DataFrame =
    Finders.statusLookup(control, fileId)

  def findByCode(code: String): DataFrame =
    products.filter(org.apache.spark.sql.functions.col("code") === code)

  /** `regex = false` (default) treats the term literally — what most
    * callers mean. `regex = true` reproduces the reference's EXACT
    * endpoint semantics: the term is wrapped `.*term.*` case-insensitive
    * with metacharacters interpreted (app/api/main.py:157-160), so a
    * ported query like `b.lt` keeps matching bolt AND belt. */
  def findPartial(term: String, limit: Int = 20,
      regex: Boolean = false): DataFrame =
    if (regex) Finders.searchRegex(products, "product_name", term,
      "code", limit)
    else Finders.searchPartial(products, "product_name", term, "code",
      limit)

  def findExact(term: String): DataFrame =
    Finders.searchExact(products, "product_name", term, "code")
}
