package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.MapType

/** Keyed upsert — the reference's core operator (SURVEY.md §2 A8):
  * `UpdateOne({code}, {$set: doc}, upsert=True)` per record, last writer
  * wins (app/processing/data_processor.py:95-113).
  *
  * Spark has no mutable store, so upsert is a set-based merge: one shuffle
  * of `delta ∪ snapshot` hash-partitioned by key, `row_number` per key,
  * keep the winner. At 100 TB the snapshot side would be bucketed by key so
  * the merge is a co-partitioned window with no snapshot shuffle; deltas
  * (weekly 50k-record deliveries) are tiny relative to the snapshot and
  * shuffle cheaply.
  *
  * Two flavors:
  *  - [[merge]]: whole-row last-writer-wins (classic dedup-merge);
  *  - [[mergeFields]]: field-level `$set` parity — a field ABSENT (null) in
  *    the winning delta record keeps its old snapshot value
  *    (data_processor.py:103-110 sets only the new doc's fields). This is
  *    the subtle reference semantic SURVEY.md §7 calls out.
  */
object Upsert {

  private val precedenceCol = "__graft_precedence"
  private val rankCol = "__graft_rn"

  /** Whole-row last-writer-wins merge of `delta` into `snapshot` on `key`,
    * ordering winners by `version` (descending) then delta-over-snapshot.
    * Schemas may differ — union is by name with missing columns null. */
  def merge(snapshot: DataFrame, delta: DataFrame, key: String,
      version: Seq[Column] = Nil): DataFrame = {
    val tagged = delta.withColumn(precedenceCol, lit(1))
      .unionByName(snapshot.withColumn(precedenceCol, lit(0)),
        allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(precedenceCol).desc +: version.map(_.desc): _*)
    tagged.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) === 1)
      .drop(precedenceCol, rankCol)
  }

  /** Field-level `$set` merge. For keys present in both sides the winning
    * delta row contributes its non-null fields and inherits the rest from
    * the snapshot; `extras` maps are merged key-wise with delta keys
    * winning; `mergeWholly` columns (provenance stamps) always come from
    * the winner. Within the delta, the last record per key (by `version`)
    * wins first — matching sequential per-record upserts in one batch. */
  def mergeFields(snapshot: DataFrame, delta: DataFrame, key: String,
      version: Seq[Column] = Nil,
      mergeWholly: Set[String] = Set("file_id", "last_modified_at_company"))
      : DataFrame = {
    // 1. collapse the delta itself to one winner per key
    val dw = Window.partitionBy(col(key)).orderBy(
      (if (version.nonEmpty) version.map(_.desc)
       else Seq(monotonically_increasing_id().desc)): _*)
    val deltaOne = delta.withColumn(rankCol, row_number().over(dw))
      .filter(col(rankCol) === 1).drop(rankCol)

    // 2. full outer join against the snapshot, per-field coalesce
    val s = snapshot.alias("s")
    val d = deltaOne.alias("d")
    val allCols = (snapshot.columns ++ deltaOne.columns).distinct
    val sCols = snapshot.columns.toSet
    val dCols = deltaOne.columns.toSet

    def side(a: String, c: String): Column = col(s"$a.$c")
    val isMap = (c: String) =>
      (snapshot.schema.fields ++ deltaOne.schema.fields)
        .find(_.name == c).exists(_.dataType.isInstanceOf[MapType])

    val merged = allCols.map {
      case c if c == key =>
        coalesce(side("d", c), side("s", c)).as(c)
      case c if !dCols.contains(c) => side("s", c).as(c)
      case c if !sCols.contains(c) => side("d", c).as(c)
      case c if mergeWholly.contains(c) =>
        when(side("d", key).isNotNull, side("d", c))
          .otherwise(side("s", c)).as(c)
      case c if isMap(c) =>
        // $set on map fields: delta keys overwrite, other old keys survive
        when(side("d", key).isNull, side("s", c))
          .when(side("s", c).isNull, side("d", c))
          .when(side("d", c).isNull, side("s", c))
          .otherwise(map_concat(
            map_filter(side("s", c), (k, _) =>
              !map_contains_key(side("d", c), k)),
            side("d", c))).as(c)
      case c =>
        when(side("d", key).isNull, side("s", c))
          .otherwise(coalesce(side("d", c), side("s", c))).as(c)
    }
    d.join(s, side("d", key) === side("s", key), "full_outer")
      .select(merged: _*)
  }
}

/** Atomic snapshot table: write-temp-then-rename so readers never observe a
  * partial upsert — the property MongoDB gave the reference for free.
  * Idempotent under replay (Structured Streaming at-least-once + this =
  * effective exactly-once, SURVEY.md §2 A15). */
class SnapshotStore(val path: String) {
  def exists(spark: SparkSession): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def read(spark: SparkSession): Option[DataFrame] =
    if (exists(spark)) Some(spark.read.parquet(path)) else None

  /** Atomically replace the snapshot with `df`. */
  def overwrite(df: DataFrame): Unit = {
    val spark = df.sparkSession
    val tmp = new Path(path + ".tmp-" + java.util.UUID.randomUUID())
    val dst = new Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    df.write.mode("overwrite").parquet(tmp.toString)
    val old = new Path(path + ".old-" + java.util.UUID.randomUUID())
    if (fs.exists(dst)) fs.rename(dst, old)
    fs.rename(tmp, dst)
    if (fs.exists(old)) fs.delete(old, true)
  }
}
