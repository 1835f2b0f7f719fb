package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Schemas.Status

/** Per-file progress counters + status derivation (SURVEY.md §2 A4/A9/A10).
  *
  * The reference needs atomic `$inc` because many workers race on one Mongo
  * document (app/processing/data_processor.py:115-124). In Spark the
  * counters are a deterministic aggregation — no shared mutable state, no
  * race: `groupBy(file_id).agg(...)` with map-side partial aggregation.
  * Status transitions (app/models.py:27-32, data_processor.py:126-141,
  * file_splitter.py:62-96): uploaded → processing → {failed |
  * processed | processed_with_errors}.
  */
object Tracker {

  /** Aggregate per-file counters from a prepared record set: total,
    * processed (valid), failed (invalid). */
  def counters(prepared: DataFrame): DataFrame =
    prepared.groupBy("file_id").agg(
      count(lit(1)).as("total_records"),
      sum(when(Ingest.isValid, 1L).otherwise(0L)).as("records_processed"),
      sum(when(Ingest.isValid, 0L).otherwise(1L)).as("records_failed"))

  /** Terminal/derived status from counters — the exact 5-state machine. */
  def deriveStatus(total: Column, processed: Column, failed: Column): Column =
    when(processed + failed < total, Status.Processing)
      .when(failed > 0, Status.ProcessedWithErrors)
      .otherwise(Status.Processed)

  /** Counters → control-table rows with derived status. */
  def withStatus(counters: DataFrame): DataFrame =
    counters.withColumn("status",
      deriveStatus(col("total_records"), col("records_processed"),
        col("records_failed")))
}
