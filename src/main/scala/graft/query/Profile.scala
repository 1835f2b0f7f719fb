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

  /** The profile maintained INCREMENTALLY — the weekly-delivery regime
    * applied to table statistics: each delivery computes a kilobyte
    * PARTIAL profile (counts, typed min/max, width sums, and an HLL
    * sketch per column), and the whole-table profile is a MERGE of the
    * partials — no re-scan of old deliveries, ever. Every merged stat
    * is exact by algebra (counts/sums add, min/max compose) except
    * distinct cardinality, which is NOT mergeable exactly — that is
    * precisely what the mergeable HLL sketch is for (the
    * [[Sketches.hllUnionBound]] union property: merging partials loses
    * nothing vs sketching the union).
    *
    * The driver key slices `orders` into 5 synthetic deliveries
    * (`o_orderkey % 5`), merges their partials, and emits the
    * [[profileTable]] row grain PLUS the exact distinct count (the
    * full-scan verification side, the countMinBound pattern) and a
    * `distinct_est_ok` flag that the union-sketch estimate lands
    * within ±5% of exact — deterministic (sketches are pure functions
    * of the value sets). The oracle re-derives every exact column from
    * the full table — so any merge-algebra bug (a min that averaged, a
    * count that maxed) diverges the hash, and the flag pins the sketch
    * path. Sketches run over the RENDERED value (injective on the
    * fixture's ranges — shortest-roundtrip doubles, second-grain
    * timestamps with no sub-second values) so one codec serves every
    * column type.
    *
    * Scale shape: partials are per-delivery single-row aggregates
    * (map-side combinable); the merge touches |deliveries| rows of
    * kilobyte sketches. At 100 TB the partials persist with each
    * delivery (the SnapshotStore cadence) and a profile refresh is a
    * metadata-sized merge job. */
  def profileMerge(spark: SparkSession, dir: String,
      table: String = "orders", slices: Int = 5): DataFrame = {
    val t = Tables.load(spark, dir, table)
    profileMergeOf(t, pmod(col(t.schema.fieldNames.head), lit(slices)))
  }

  /** [[profileMerge]]'s core: partial profiles per `slice` value,
    * merged, with the full-scan exact-distinct verification side. */
  def profileMergeOf(t: DataFrame, slice: Column): DataFrame = {
    val fields = t.schema.fields.toSeq
    val partialAggs = fields.flatMap { f =>
      val c = col(f.name)
      val s = render(c, f.dataType)
      Seq(
        count(c).as(s"${f.name}__nn"),
        min(c).as(s"${f.name}__mn"),
        max(c).as(s"${f.name}__mx"),
        sum(length(s)).as(s"${f.name}__ls"),
        hll_sketch_agg(s, 12).as(s"${f.name}__sk"))
    }
    val partials = t.groupBy(slice.as("__slice"))
      .agg(count(lit(1)).as("__n"), partialAggs: _*)
    val mergeAggs = fields.flatMap { f =>
      Seq(
        sum(col(s"${f.name}__nn")).as(s"${f.name}__nn"),
        render(min(col(s"${f.name}__mn")), f.dataType).as(s"${f.name}__mn"),
        render(max(col(s"${f.name}__mx")), f.dataType).as(s"${f.name}__mx"),
        sum(col(s"${f.name}__ls")).as(s"${f.name}__ls"),
        hll_sketch_estimate(hll_union_agg(col(s"${f.name}__sk")))
          .as(s"${f.name}__de"))
    }
    val merged = partials
      .agg(sum(col("__n")).as("__n"), mergeAggs: _*)
      .withColumn("__k", lit(1))
    // the full-scan exact-distinct side (verification, not maintenance)
    val exact = t
      .agg(countDistinct(col(fields.head.name)).as(s"${fields.head.name}__nd"),
        fields.tail.map(f =>
          countDistinct(col(f.name)).as(s"${f.name}__nd")): _*)
      .withColumn("__k", lit(1))
    val joined = merged.join(broadcast(exact), "__k")
    val rows = fields.map { f =>
      struct(lit(f.name).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"${f.name}__nn")).as("n_nulls"),
        col(s"${f.name}__nd").as("n_distinct"),
        col(s"${f.name}__mn").as("min_val"),
        col(s"${f.name}__mx").as("max_val"),
        round(col(s"${f.name}__ls").cast("double") /
          col(s"${f.name}__nn"), 6).as("avg_len"),
        (abs(col(s"${f.name}__de") - col(s"${f.name}__nd"))
          .cast("double") <=
          col(s"${f.name}__nd").cast("double") * 0.05)
          .as("distinct_est_ok"))
    }
    joined.select(explode(array(rows: _*)).as("p"))
      .select("p.*")
      .orderBy("col_name")
  }
}
