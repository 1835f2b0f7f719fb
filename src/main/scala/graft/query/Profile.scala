package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Table profiling — the "what is in this delivery" pass every
  * large-scale ingest runs before curation decides anything: per-column
  * null counts, exact distinct cardinality, typed min/max, and mean
  * rendered width, computed for ALL columns in ONE scan.
  *
  * Scale shape: a single global aggregation. The multi-column
  * `count(DISTINCT ...)` set plans as one Expand (one input row fans to
  * one row per distinct-aggregate, each keyed by its own column value)
  * feeding a two-phase hash aggregate — partial per partition, merged
  * once; min/max/count ride the same pass as non-distinct partials. No
  * per-column jobs, no second scan, no driver loop over columns: the
  * profile of a 100 TB table is one shuffle whose width is the distinct
  * VALUE sets, not the row count. (When exact cardinalities stop being
  * worth that shuffle, [[Sketches.hllUnionBound]] is the mergeable-
  * sketch path — same question, fixed-size partials.) The final
  * unpivot-to-rows touches a single 1-row frame — model-scalar cheap.
  *
  * Determinism: counts are exact integers; min/max are typed (numeric/
  * timestamp order, NOT string order) and rendered AFTER aggregation —
  * timestamps through an explicit UTC format, everything else through
  * the shortest-roundtrip cast both engines share on the fixture's
  * value ranges; mean width is an exact integer sum over an exact count,
  * rounded to 6 per the repo-wide ratio convention. */
object Profile {

  /** Post-aggregation rendering of a typed min/max to its cross-engine
    * string form. Timestamps get an explicit second-grain UTC format
    * (`strftime('%Y-%m-%d %H:%M:%S')` on the oracle side); other types
    * use the plain cast. */
  private def render(c: Column, dt: DataType): Column = dt match {
    case TimestampType | TimestampNTZType =>
      date_format(c, "yyyy-MM-dd HH:mm:ss")
    case _ => c.cast("string")
  }

  /** Driver key: profile every column of `orders` (int64 keys, strings,
    * a double, a timestamp — all the fixture's scalar shapes). Output
    * grain: one row per column, sorted by column name. */
  def profileTable(spark: SparkSession, dir: String,
      table: String = "orders"): DataFrame =
    profileOf(Tables.load(spark, dir, table))

  /** [[profileTable]]'s core over any frame of scalar columns (the
    * fixture carries no nulls; ProfileSpec drives the null-counting
    * and null-ignoring min/max paths on a constructed frame). */
  def profileOf(t: DataFrame): DataFrame = {
    val fields = t.schema.fields.toSeq
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(c).as(s"${f.name}__nn"),
        countDistinct(c).as(s"${f.name}__nd"),
        render(min(c), f.dataType).as(s"${f.name}__mn"),
        render(max(c), f.dataType).as(s"${f.name}__mx"),
        round(sum(length(render(c, f.dataType))).cast("double") /
          count(c), 6).as(s"${f.name}__al"))
    }
    val one = t.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = fields.map { f =>
      struct(lit(f.name).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"${f.name}__nn")).as("n_nulls"),
        col(s"${f.name}__nd").as("n_distinct"),
        col(s"${f.name}__mn").as("min_val"),
        col(s"${f.name}__mx").as("max_val"),
        col(s"${f.name}__al").as("avg_len"))
    }
    one.select(explode(array(rows: _*)).as("p"))
      .select("p.*")
      .orderBy("col_name")
  }
}
