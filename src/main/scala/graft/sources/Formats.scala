package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink format dispatch (SURVEY.md §7's `sources/` layer).
  *
  * Engine policy per format:
  *  - `parquet` — the canonical store: columnar, predicate pushdown +
  *    column pruning, µs timestamps (session-configured in
  *    [[graft.core.Tables]]). Everything durable lands here.
  *  - `orc` — the alternative columnar container (same pushdown class);
  *    provided for interchange with ORC-based warehouses.
  *  - `json` — interchange + the ingest landing format. JSONL
  *    (`multiLine=false`, default) is SPLITTABLE — one large file still
  *    parallelizes across tasks; a multiLine JSON array is one task per
  *    file, acceptable only because deliveries are many small files
  *    (see [[graft.ingest.Ingest]]).
  *  - `csv` — interchange only, ALWAYS with an explicit schema: schema
  *    inference is a second full pass over the data (a non-starter at
  *    100 TB) and type-lossy. Header on, so files are self-describing
  *    for humans even though the engine never trusts it.
  *
  * Avro is intentionally absent: the spark-avro datasource jar is not
  * on this classpath (only avro-core), so `.format("avro")` would fail
  * at runtime.
  */
object Formats {

  val supported: Seq[String] = Seq("parquet", "orc", "json", "csv")

  private def require2(format: String): Unit =
    require(supported.contains(format),
      s"unsupported format '$format' (supported: ${supported.mkString(", ")})")

  /** CSV dialect pinned for LOSSLESSNESS and RFC-4180: explicit null
    * sentinel (bare CSV cannot distinguish null from empty string),
    * doubled-quote escaping (Spark's backslash default mangles standard
    * CSV), and multiLine reads (embedded newlines survive). multiLine makes a csv file
    * non-splittable — correctness over parallelism; bulk data belongs
    * in parquet anyway (csv is interchange). */
  private val csvNull = "\\N"

  def write(df: DataFrame, path: String, format: String): Unit = {
    require2(format)
    val w = df.write.mode("overwrite").format(format)
    (if (format == "csv")
       w.option("header", "true").option("nullValue", csvNull)
         .option("escape", "\"")
         .option("ignoreLeadingWhiteSpace", "false")
         .option("ignoreTrailingWhiteSpace", "false")
     else w).save(path)
  }

  /** Read `path` as `format`. `schema` is REQUIRED for csv and json
    * (inference would scan the data twice and guess types); columnar
    * formats carry their own. */
  def read(spark: SparkSession, path: String, format: String,
      schema: Option[StructType] = None): DataFrame = {
    require2(format)
    require(schema.isDefined || format == "parquet" || format == "orc",
      s"$format requires an explicit schema (inference double-scans)")
    val base: DataFrameReader = spark.read.format(format)
    val withSchema = schema.fold(base)(base.schema)
    (if (format == "csv")
       withSchema.option("header", "true").option("nullValue", csvNull)
         .option("escape", "\"")
         .option("multiLine", "true")
         .option("ignoreLeadingWhiteSpace", "false")
         .option("ignoreTrailingWhiteSpace", "false")
     else withSchema).load(path)
  }
}
