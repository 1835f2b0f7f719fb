package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{bloom_filter_agg, bloom_might_contain}

/** Semi-join reduction through an EXPLICIT bloom runtime filter
  * (Bloom '70; the semi-join reducer of distributed query processing,
  * e.g. Bernstein & Chiu '81) — the 100 TB join pattern for a dim side
  * that is too big to broadcast but whose FILTERED key set is small:
  * build a bloom filter over the filtered dim keys in one pass (a few
  * MB model scalar at any corpus size — bits ∝ filtered keys, not
  * corpus), then drop non-matching fact rows AT THE SCAN, before they
  * ever reach the join shuffle. With an 18%-selective dim filter the
  * fact side ships ~18% of its rows (+fpp) instead of 100%.
  *
  * Spark's optimizer does this itself (InjectRuntimeFilter) when its
  * trigger conditions hold — creation-side size, shuffle-join shape,
  * selective-filter detection; this operator is the EXPLICIT form for
  * when they don't (or when the pipeline author knows the selectivity
  * the optimizer can't prove), built from the same Catalyst pieces
  * (BloomFilterAggregate / BloomFilterMightContain over xxhash64 —
  * [[graft.functions.bloom_filter_agg]]).
  *
  * Correctness is UNCONDITIONAL: bloom filters have no false
  * negatives, and false positives only pass extra rows into the exact
  * equijoin that follows, which drops them — so the result is
  * row-identical to the plain join (the oracle runs the plain join;
  * BloomJoinSpec additionally pins the reduction itself: probe-side
  * rows strictly between the exact-match count and the full scan). */
object BloomJoin {

  /** The filtered dim side and the bloom-reduced fact side, exposed
    * for the spec's reduction measurement. */
  private[query] def reduced(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val urgent = Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    // two model-scalar passes over the FILTERED dim side only: its
    // cardinality (sizes the filter to the intended fpp), then the
    // serialized filter itself
    val n = math.max(urgent.count(), 1L)
    val bytes = urgent
      .select(bloom_filter_agg(col("o_orderkey"), n).as("bf"))
      .head().getAs[Array[Byte]](0)
    val probe = Tables.load(spark, dir, "lineitem")
      .filter(bloom_might_contain(lit(bytes), col("l_orderkey")))
    (urgent, probe)
  }

  /** Revenue rollup over the urgent-order lineitems, the fact scan
    * pre-reduced by the bloom filter. Result == the plain join's. */
  def joinBloomReduced(spark: SparkSession, dir: String): DataFrame = {
    val (urgent, probe) = reduced(spark, dir)
    probe.join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_lineitems"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"))
      .orderBy("l_returnflag")
  }
}
