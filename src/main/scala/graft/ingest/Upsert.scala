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
    // final content-hash tiebreak: deterministic under any partitioning
    val tiebreak = md5(to_json(struct(
      tagged.columns.filterNot(_ == precedenceCol).map(col).toIndexedSeq: _*)))
    val w = Window.partitionBy(col(key))
      .orderBy((col(precedenceCol).desc +: version.map(_.desc)) :+
        tiebreak.desc: _*)
    tagged.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) === 1)
      .drop(precedenceCol, rankCol)
  }

  /** Field-level `$set` merge. For keys present in both sides the
    * collapsed delta row contributes its non-null fields and inherits the
    * rest from the snapshot; `extras` maps are merged key-wise with delta
    * keys winning; `mergeWholly` columns (provenance stamps) always come
    * from the latest delta record. The within-delta collapse is ALSO
    * field-level — the reference applies each record's `$set`
    * sequentially (data_processor.py:103-110), so two same-key records in
    * one batch compose: each field takes its last non-null value in
    * `version` order, and map fields merge version-ascending. Callers
    * that care about arrival order MUST pass `version` (the streaming
    * path stamps file names); without one the order is still
    * DETERMINISTIC — a content hash of the row — but arbitrary; never
    * dependent on partition layout (a `monotonically_increasing_id`
    * tiebreak would be). */
  def mergeFields(snapshot: DataFrame, delta: DataFrame, key: String,
      version: Seq[Column] = Nil,
      mergeWholly: Set[String] = Set("file_id", "last_modified_at_company"))
      : DataFrame = {
    // 1. collapse the delta to one row per key, field-level: group by key
    //    and per field take the last non-null value in version order
    //    (maps: fold version-ascending with later keys overwriting).
    //    collect_list per key is bounded by same-key records per batch —
    //    a handful in any real delivery stream.
    val contentTiebreak =
      md5(to_json(struct(delta.columns.map(col).toIndexedSeq: _*)))
    val vCol = struct(version :+ contentTiebreak: _*)
    val dataCols = delta.columns.filterNot(_ == key)
    val collapsed = dataCols.map { c =>
      // array_sort with a comparator on v only — sort_array would demand
      // the whole struct be orderable, which map-typed fields are not
      val sorted = array_sort(
        collect_list(struct(vCol.as("v"), col(c).as("x"))),
        (l, r) => when(l.getField("v") < r.getField("v"), -1)
          .when(l.getField("v") > r.getField("v"), 1).otherwise(0))
      delta.schema(c).dataType match {
        case mt: MapType =>
          aggregate(sorted, lit(null).cast(mt), (acc, e) => {
            val m = e.getField("x")
            when(m.isNull, acc).when(acc.isNull, m)
              .otherwise(map_concat(
                map_filter(acc, (k, _) => !map_contains_key(m, k)), m))
          }).as(c)
        case _ =>
          // get() (not element_at): null, not an ANSI error, when every
          // value for the field is null and the filtered array is empty
          get(filter(reverse(sorted), e => e.getField("x").isNotNull),
            lit(0)).getField("x").as(c)
      }
    }
    val deltaOne = delta.groupBy(col(key)).agg(collapsed.head,
      collapsed.tail: _*)

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

/** Atomic snapshot table via a manifest-pointer swap (the Iceberg/Delta-
  * style public pattern) — readers never observe a partial upsert, the
  * property MongoDB gave the reference for free, and there is NO window in
  * which no snapshot is referenced (a rename(dst→old);rename(tmp→dst)
  * two-step has one).
  *
  * Layout under `path`:
  *   MANIFEST-<seq>   one-line pointer file naming the live version dir
  *   v-<seq>-<uuid>/  immutable parquet version dirs
  *
  * Commit = rename of a fully-written tmp manifest to a NEW
  * `MANIFEST-<seq>` name (rename-to-fresh-name is atomic on HDFS and
  * local FS). Readers resolve max-seq manifest → version dir. The
  * previous version is retained through one commit (in-flight readers
  * finish against it); older versions and manifests are GC'd.
  * Idempotent under replay (Structured Streaming at-least-once + this =
  * effective exactly-once, SURVEY.md §2 A15). */
class SnapshotStore(val path: String) {

  private val manifestRe = "MANIFEST-(\\d+)".r

  private def fs(spark: SparkSession) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (seq, versionDirName) pairs of committed manifests, ascending. */
  private def manifests(spark: SparkSession): Seq[(Long, String)] = {
    val f = fs(spark)
    val root = new Path(path)
    if (!f.exists(root)) return Nil
    f.listStatus(root).toIndexedSeq.flatMap { st =>
      st.getPath.getName match {
        case manifestRe(seq) =>
          val in = f.open(st.getPath)
          try {
            val body = new String(
              org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
            if (body.nonEmpty) Some(seq.toLong -> body) else None
          } finally in.close()
        case _ => None
      }
    }.sortBy(_._1)
  }

  def exists(spark: SparkSession): Boolean = manifests(spark).nonEmpty

  def read(spark: SparkSession): Option[DataFrame] =
    manifests(spark).lastOption.map { case (_, v) =>
      spark.read.parquet(s"$path/$v")
    }

  /** Atomically publish `df` as the new live snapshot. */
  def overwrite(df: DataFrame): Unit = {
    val spark = df.sparkSession
    val f = fs(spark)
    val committed = manifests(spark)
    val seq = committed.lastOption.map(_._1 + 1).getOrElse(0L)
    val version = s"v-$seq-${java.util.UUID.randomUUID()}"
    df.write.mode("overwrite").parquet(s"$path/$version")
    val tmp = new Path(s"$path/.manifest-tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(version.getBytes("UTF-8")) finally out.close()
    if (!f.rename(tmp, new Path(s"$path/MANIFEST-$seq")))
      throw new java.io.IOException(
        s"snapshot commit lost race for $path/MANIFEST-$seq")
    // GC: keep this and the previous version; drop everything older.
    val keep = (committed.takeRight(1).map(_._2) :+ version).toSet
    committed.dropRight(1).foreach { case (s, _) =>
      f.delete(new Path(s"$path/MANIFEST-$s"), false)
    }
    f.listStatus(new Path(path)).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("v-") && !keep.contains(n)) f.delete(st.getPath, true)
    }
  }
}
