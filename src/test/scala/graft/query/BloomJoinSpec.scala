package graft.query

import org.apache.spark.sql.functions._

import graft.{SparkSuite, TestSpark}

/** Explicit bloom semi-join reduction (join_bloom_reduced): the
  * correctness claim is unconditional equality with the plain join
  * (no false negatives; the exact join drops false positives), and
  * the PERFORMANCE claim is that the filter genuinely reduces the
  * probe side — both pinned here with anti-vacuity guards. */
class BloomJoinSpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  test("reduced join result equals the plain join") {
    val got = BloomJoin.joinBloomReduced(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val li = graft.core.Tables.load(spark, dir, "lineitem")
    val o = graft.core.Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val want = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_lineitems"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(want.nonEmpty, "vacuous: no urgent-order lineitems in fixture")
    assert(got === want)
  }

  test("the filter reduces the probe side; never below the match set") {
    val (urgent, probe) = BloomJoin.reduced(spark, dir)
    val li = graft.core.Tables.load(spark, dir, "lineitem")
    val full = li.count()
    val probed = probe.count()
    val matched = li.join(urgent,
      col("l_orderkey") === col("o_orderkey"), "leftsemi").count()
    assert(matched > 0, "vacuous: no matching fact rows")
    // no false negatives: every matching row survives the filter
    assert(probed >= matched,
      s"bloom dropped matching rows: probed=$probed matched=$matched")
    // and the reduction is real — the ~18%-selective dim filter must
    // cut the fact scan well below full (fpp 3% default gives margin)
    assert(probed < full * 2 / 3,
      s"bloom filtered nothing: probed=$probed of $full")
    // exact containment, not just counts
    val lost = li.join(urgent,
        col("l_orderkey") === col("o_orderkey"), "leftsemi")
      .exceptAll(probe.select(li.columns.map(col).toIndexedSeq: _*))
      .count()
    assert(lost === 0L, s"$lost matching rows lost by the bloom filter")
  }

  test("plan shape: might_contain filters the fact scan BELOW the join") {
    // the operator's claim is WHERE the rows are dropped — at the
    // scan, before any join/exchange. Find the Filter carrying
    // might_contain over the fact side and assert no join sits under
    // it (AQE-aware traversal; a filter that migrated above the join
    // would pass the result-equality test while shipping 100% of the
    // fact rows)
    val plan = BloomJoin.joinBloomReduced(spark, dir)
      .queryExecution.executedPlan
    val nodes = graft.PlanNodes.all(plan)
    val factFilters = nodes.filter(n =>
      n.nodeName == "Filter" &&
        n.toString.contains("might_contain") &&
        n.toString.contains("l_orderkey"))
    assert(factFilters.nonEmpty, "no might_contain filter on the fact side")
    val joinsBelow = factFilters.flatMap(f =>
      graft.PlanNodes.all(f).filter(n =>
        n.nodeName.toLowerCase.contains("join")))
    assert(joinsBelow.isEmpty,
      "the bloom filter sits above a join — rows shuffle before dropping")
  }
}
