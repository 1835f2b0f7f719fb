package graft.core

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Canonical schemas for the ingest pipeline (SURVEY.md §1).
  *
  * The reference's product record is open-schema JSON with a declared core
  * (`code` required, `product_name` nullable — reference app/models.py:7-16,
  * Config.extra="allow" at models.py:15-16). We map that to a fixed core
  * StructType plus an `extras` string map and the retained raw JSON
  * (decision (b)+(c) in SURVEY.md §1.2) so weekly deliveries with
  * heterogeneous keys merge without schema drift.
  */
object Schemas {

  /** Columns the engine owns; everything else in an incoming record is
    * folded into `extras`. */
  val productCoreFields: Seq[String] = Seq("code", "product_name")

  /** Reserved/external identifiers dropped on ingest (reference
    * app/processing/data_processor.py:84-88). */
  val droppedFields: Seq[String] = Seq("id", "_id")

  val productSchema: StructType = StructType(Seq(
    StructField("code", StringType, nullable = false),
    StructField("product_name", StringType, nullable = true),
    StructField("extras", MapType(StringType, StringType), nullable = true),
    StructField("raw", StringType, nullable = true),
    StructField("file_id", StringType, nullable = true),
    StructField("last_modified_at_company", TimestampType, nullable = true)))

  /** 5-state ingest-job status machine (reference app/models.py:27-32). */
  object Status {
    val Uploaded = "uploaded"
    val Processing = "processing"
    val Failed = "failed"
    val Processed = "processed"
    val ProcessedWithErrors = "processed_with_errors"
    val all: Seq[String] =
      Seq(Uploaded, Processing, Failed, Processed, ProcessedWithErrors)
  }
}

/** Control record: one row per ingest job (reference app/models.py:35-47). */
case class UploadedFile(
    file_id: String,
    filename: String,
    location: String,
    content_type: String,
    uploaded_at: Timestamp,
    status: String,
    total_records: Long,
    records_processed: Long,
    records_failed: Long)
