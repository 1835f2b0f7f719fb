package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.heavy_hitters_sketch

/** Frequency-sketch operators. The first citizen is Misra–Gries heavy
  * hitters ([[graft.functions.MisraGriesItems]]): fixed-memory per
  * group, map-side combinable, with a DETERMINISTIC completeness
  * guarantee — any item whose true frequency f satisfies (k+1)·f > n
  * survives the sketch regardless of input order, partitioning, or
  * merge tree. That guarantee (and only it) is what the driver key
  * exposes: survivor sets below the bar are merge-order-dependent, so
  * the key outputs the EXACTLY-derived heavy hitters plus a `caught`
  * boolean that the sketch retained each one — deterministic TRUE by
  * the MG theorem, hash-compared against the oracle re-deriving the
  * same exact side with `caught` literal TRUE. */
object Sketches {

  /** The deterministic skewed stream the key runs on: per document, 64
    * items `z(64 div r)` for r = 1..64 — a fixed Zipf-ish ramp (item
    * z1 carries 32/64 of the stream, z2 11/64, … 15 distinct items),
    * so with k = 8 sketch slots exactly two items clear the
    * (k+1)·f > n bar at EVERY scale factor and the sketch is genuinely
    * lossy (15 distinct > 8 slots). Oracle-reproducible by
    * construction (pure integer algebra on doc count). */
  private def stream(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        explode(sequence(lit(1), lit(64))).as("r"))
      .select(expr("concat('z', cast(64 div r as string))").as("item"))

  /** Driver key: exact heavy hitters (9·c > n, pure integer compare —
    * no division-semantics risk) with the MG membership flag. The
    * sketch survivors are a model scalar (≤ k items) — collected like
    * the tfidf corpus count, then applied as a literal predicate. */
  def heavyHitters(spark: SparkSession, dir: String, k: Int = 8)
      : DataFrame = {
    val s = stream(spark, dir).cache()
    try {
      val survivors = s.agg(heavy_hitters_sketch(col("item"), k)
        .as("hh")).first().getSeq[String](0).toSet
      val exact = s.groupBy("item").agg(count(lit(1)).as("c"))
      val total = exact.agg(sum("c")).first().getLong(0)
      exact.filter(col("c") * (k + 1) > total)
        .select(col("item"), col("c").as("exact_cnt"),
          col("item").isInCollection(survivors).as("caught"))
        .orderBy("item")
    } finally s.unpersist()
  }
}
