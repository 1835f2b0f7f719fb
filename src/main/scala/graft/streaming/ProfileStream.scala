package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types._

import graft.core.Tables

/** Streaming column profiler — the ONLINE form of
  * `graft.query.Profile`: per-(delivery, column) row/null/distinct
  * counts and typed extrema maintained as state while deliveries
  * stream in, so the drift flags the batch key derives
  * delivery-over-delivery are available the moment a delivery lands
  * instead of after a batch re-profile. Tenth streaming machine;
  * gated against the SAME DuckDB oracle as `profile_drift` (the
  * streamed profiles, run through the identical flag algebra, must
  * reproduce the batch output bit-for-bit).
  *
  * State design (transformWithState, the arbitrary-state V2 API —
  * RocksDB-backed like [[TwsDrive]]): one key per (delivery,
  * col_idx) holding
  *  - a ValueState (n, nn, n_distinct, updates) — O(1) counters; the
  *    distinct count is maintained INCREMENTALLY on map insertion, so
  *    no emission ever iterates the map;
  *  - a ValueState (min, max) over the column's rendered values,
  *    compared in the column's own order (numeric columns by value,
  *    dates/strings lexicographically — ISO dates order identically);
  *  - a MapState over the distinct values seen. Each map entry is its
  *    OWN state-store row, so state is cardinality-linear and
  *    store-partitioned — the [[MinhashStream]] shape, not one fat
  *    cell per key. At 100 TB the exact map swaps for an HLL partial
  *    (the `agg_hll_union_bound` sketch) with the same plan; the
  *    drive keeps it exact because the gate is exact.
  *
  * Exactly-once: the file source's checkpointed offsets make delivery
  * replay a no-op after restart (ProfileStreamSpec kills and resumes
  * mid-stream); `updates` counts state commits per key so the drive
  * can take the LAST emission per key from an update-mode sink.
  */
object ProfileStream {

  /** One reshaped cell: a single column's value in a single row of a
    * delivery. `value` is the rendered (string) form — null for SQL
    * NULL; `numeric` fixes the comparison mode for extrema. */
  case class ProfileCell(delivery: Long, col_idx: Int, col_name: String,
    value: String, numeric: Boolean)

  /** One profile emission (update mode: the last one per key wins). */
  case class ProfileUpd(delivery: Long, col_name: String, n_rows: Long,
    n_nulls: Long, n_distinct: Long, min_val: String, max_val: String,
    updates: Long)

  def machine(cells: Dataset[ProfileCell]): Dataset[ProfileUpd] = {
    val spark = cells.sparkSession
    import spark.implicits._
    cells.groupByKey(c => (c.delivery, c.col_idx))
      .transformWithState(new ColumnProfileProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  private class ColumnProfileProcessor
      extends StatefulProcessor[(Long, Int), ProfileCell, ProfileUpd] {
    @transient private var counts: ValueState[(Long, Long, Long, Long)] = _
    @transient private var extrema: ValueState[(String, String)] = _
    @transient private var seen: MapState[String, Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getValueState[(Long, Long, Long, Long)]("counts",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)
      extrema = getHandle.getValueState[(String, String)]("extrema",
        Encoders.tuple(Encoders.STRING, Encoders.STRING), TTLConfig.NONE)
      seen = getHandle.getMapState[String, Boolean]("seen",
        Encoders.STRING, Encoders.scalaBoolean, TTLConfig.NONE)
    }

    private def lt(a: String, b: String, numeric: Boolean): Boolean =
      if (numeric) a.toDouble < b.toDouble else a < b

    override def handleInputRows(key: (Long, Int),
        rows: Iterator[ProfileCell],
        timers: TimerValues): Iterator[ProfileUpd] = {
      var (n, nn, nd, upd) =
        if (counts.exists()) counts.get() else (0L, 0L, 0L, 0L)
      var (mn, mx) =
        if (extrema.exists()) extrema.get() else (null: String, null: String)
      var name: String = null
      // in-batch memo: the store pays one containsKey(+update) per
      // DISTINCT value per trigger, not per cell — for low-cardinality
      // columns (status, priority) that is the difference between 3
      // RocksDB ops and one per row
      val inBatch = new scala.collection.mutable.HashSet[String]
      rows.foreach { c =>
        name = c.col_name
        n += 1
        if (c.value != null) {
          nn += 1
          if (inBatch.add(c.value) && !seen.containsKey(c.value)) {
            seen.updateValue(c.value, true)
            nd += 1
          }
          if (mn == null || lt(c.value, mn, c.numeric)) mn = c.value
          if (mx == null || lt(mx, c.value, c.numeric)) mx = c.value
        }
      }
      upd += 1
      counts.update((n, nn, nd, upd))
      if (mn != null) extrema.update((mn, mx))
      Iterator.single(
        ProfileUpd(key._1, name, n, n - nn, nd, mn, mx, upd))
    }
  }

  // ------------------------------------------------------------- drive

  private[graft] def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  /** Reshape a typed frame into profile cells: one row per (input row,
    * column), value rendered exactly as the batch profiler renders its
    * extrema (shared `Profile.render` — one definition). */
  private[graft] def cellsOf(t: DataFrame, delivery: org.apache.spark.sql.Column)
      : DataFrame = {
    val cellCols = t.schema.fields.zipWithIndex.map { case (f, i) =>
      struct(lit(i).as("col_idx"), lit(f.name).as("col_name"),
        graft.query.Profile.render(col(f.name), f.dataType).as("value"),
        lit(isNumeric(f.dataType)).as("numeric"))
    }
    t.select(delivery.as("delivery"), explode(array(cellCols.toSeq: _*)).as("c"))
      .select(col("delivery"), col("c.*"))
  }

  /** The `stream_profile_drift` key: stream the orders table one
    * delivery (year) per micro-batch through [[machine]], take each
    * key's final profile, apply the SAME drift-flag algebra as the
    * batch key — compared against the identical oracle SQL. */
  /** Stage the reshaped delivery cells once per (session, dir) — the
    * reshape and the staged files are immutable, so only the STREAM
    * belongs in the measured path ([[DriveSupport.stagedOnce]]).
    * Staging does every delivery in ONE pass: repartition on the
    * delivery key + partitionBy puts each delivery's cells in its own
    * directory file (a per-delivery filter+coalesce loop re-ran the
    * reshape per delivery and wrote single-threaded — measured 4.2 s
    * of the drive's then-7.5 s); the file source recovers `delivery`
    * from the directory names. */
  private def stagedCells(spark: SparkSession, dir: String)
      : (String, org.apache.spark.sql.types.StructType) =
    DriveSupport.stagedOnce(spark, s"profstream|$dir") { ws =>
      val t = Tables.load(spark, dir, "orders")
      val cells = cellsOf(t, year(col("o_orderdate")).cast("long"))
      val inDir = ws.resolve("cells").toString
      cells.repartition(col("delivery"))
        .write.partitionBy("delivery").parquet(inDir)
      (inDir, cells.schema)
    }

  def drift(spark: SparkSession, dir: String): DataFrame =
    DriveSupport.withWorkspace("graft-profstream") { ws =>
      val t = Tables.load(spark, dir, "orders")
      val (inDir, cellSchema) = stagedCells(spark, dir)
      val numericByName = t.schema.fields.map(f =>
        f.name -> isNumeric(f.dataType)).toMap

      // full session parallelism for the state shuffle (the 4-partition
      // drive pin exists for machines whose EMISSIONS depend on batch
      // grouping; profile state is key-local and partition-independent)
      // and all deliveries in one trigger — one state commit, the
      // TwsDrive precedent. Per-delivery triggering and restart are the
      // SPEC's business (ProfileStreamSpec drives maxFilesPerTrigger=1
      // across a kill/resume); the gate key proves the semantics.
      DriveSupport.withStreamConfs(spark,
        partitions = spark.sparkContext.defaultParallelism.toString,
        provider = Some(
          "org.apache.spark.sql.execution.streaming." +
            "state.RocksDBStateStoreProvider")) {
        import spark.implicits._
        val stream = spark.readStream.schema(cellSchema)
          .parquet(inDir)
          .as[ProfileCell]
        val name = DriveSupport.sinkName("profile_stream")
        val q = machine(stream).toDF().writeStream
          .format("memory").queryName(name)
          .option("checkpointLocation", ws.resolve("ckpt").toString)
          .outputMode("update").start()
        DriveSupport.draining(q) {
          q.processAllAvailable()
          DriveSupport.pin(spark,
            driftFlags(finalProfiles(spark.table(name)), numericByName))
            .orderBy("delivery", "col_name")
        }
      }
    }

  /** Last emission per (delivery, col_name) from an update-mode sink. */
  private[graft] def finalProfiles(sink: DataFrame): DataFrame =
    sink.groupBy("delivery", "col_name")
      .agg(max_by(
        struct(col("n_rows"), col("n_nulls"), col("n_distinct"),
          col("min_val"), col("max_val")),
        col("updates")).as("p"))
      .select(col("delivery"), col("col_name"), col("p.*"))

  /** The drift-flag algebra over long-format per-delivery profiles —
    * same rules, thresholds and first-delivery semantics as
    * `Profile.profileDriftOf`, with the column's comparison mode
    * deciding how the historical range envelope is ordered. */
  private[graft] def driftFlags(profiles: DataFrame,
      numericByName: Map[String, Boolean]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("col_name").orderBy("delivery")
    val hist = w.rowsBetween(Window.unboundedPreceding, -1)
    val numeric = numericByName.foldLeft(lit(false)) { case (acc, (k, v)) =>
      when(col("col_name") === k, lit(v)).otherwise(acc)
    }
    val n = col("n_rows"); val ln = lag("n_rows", 1).over(w)
    val nulls = col("n_nulls"); val lNulls = lag("n_nulls", 1).over(w)
    val nd = col("n_distinct"); val lnd = lag("n_distinct", 1).over(w)
    val mnD = col("min_val").cast("double")
    val mxD = col("max_val").cast("double")
    val pmnN = min(when(col("numeric"), mnD)).over(hist)
    val pmxN = max(when(col("numeric"), mxD)).over(hist)
    val pmnS = min(when(!col("numeric"), col("min_val"))).over(hist)
    val pmxS = max(when(!col("numeric"), col("max_val"))).over(hist)
    profiles
      .withColumn("numeric", numeric)
      .withColumn("null_shift", when(ln.isNull, lit(false))
        .otherwise(abs(nulls * ln - lNulls * n) * 20 > n * ln))
      .withColumn("range_escape",
        when(col("numeric"),
          when(pmnN.isNull, lit(false))
            .otherwise(mnD < pmnN || mxD > pmxN))
          .otherwise(when(pmnS.isNull, lit(false))
            .otherwise(col("min_val") < pmnS || col("max_val") > pmxS)))
      .withColumn("card_jump", when(lnd.isNull, lit(false))
        .otherwise(nd > lnd * 2 || nd * 2 < lnd))
      .select("delivery", "col_name", "n_rows", "n_nulls", "n_distinct",
        "min_val", "max_val", "null_shift", "range_escape", "card_jump")
  }
}
