package graft.query

import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, LeftAnti, LeftOuter, LeftSemi}
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.functions._

import graft.{PlanNodes, SparkSuite, TestSpark}

/** Outer-join and correlated-subquery keys beyond the DuckDB hash
  * compare: null-extension semantics, output-key uniqueness, the join
  * strategy the physical plan actually picked, and the viaSql helper's
  * concurrency + catalog-hygiene contract. */
class OuterJoinSpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  private def joinTypes(df: org.apache.spark.sql.DataFrame) =
    PlanNodes.all(df).collect { case j: BaseJoinExec => j.joinType }

  test("join_outer_left: every order survives; null extension is real") {
    val out = Relational.joinOuterLeft(spark, dir)
    val nOrders = graft.core.Tables.load(spark, dir, "orders").count()
    assert(out.count() === nOrders,
      "left outer must preserve every left row")
    val nullExtended = out.filter(col("returned_qty").isNull &&
      col("n_returned_items").isNull).count()
    val matched = out.filter(col("returned_qty").isNotNull).count()
    assert(nullExtended > 0, "fixture must contain orders with no returns")
    assert(matched > 0, "fixture must contain orders with returns")
    assert(nullExtended + matched === nOrders,
      "measures must be null-extended together (both or neither)")
    // one row per order: the build side is pre-aggregated to the key
    assert(out.select("o_orderkey").distinct().count() === nOrders)
  }

  test("join_outer_left: plan joins LeftOuter on the aggregated side") {
    val types = joinTypes(Relational.joinOuterLeft(spark, dir))
    assert(types.contains(LeftOuter), s"expected LeftOuter, got $types")
  }

  test("join_outer_full: key set is the union; each side null-extends") {
    val out = Relational.joinOuterFull(spark, dir).cache()
    try {
      val orders = graft.core.Tables.load(spark, dir, "orders")
      def keys(p: String) = orders
        .filter(col("o_orderpriority") === p)
        .select(col("o_custkey")).distinct()
      val expected = keys("1-URGENT").union(keys("5-LOW"))
        .distinct().count()
      assert(out.count() === expected, "full outer key set must be the union")
      assert(out.select("custkey").distinct().count() === expected)
      val onlyUrgent = out.filter(col("n_low").isNull).count()
      val onlyLow = out.filter(col("n_urgent").isNull).count()
      val both = out.filter(col("n_low").isNotNull &&
        col("n_urgent").isNotNull).count()
      assert(onlyUrgent > 0 && onlyLow > 0 && both > 0,
        s"fixture must exercise all three regions: " +
          s"u-only=$onlyUrgent l-only=$onlyLow both=$both")
      // coalesced key never null
      assert(out.filter(col("custkey").isNull).count() === 0)
    } finally out.unpersist()
  }

  test("join_outer_full: plan joins FullOuter (no broadcast possible)") {
    val types = joinTypes(Relational.joinOuterFull(spark, dir))
    assert(types.contains(FullOuter), s"expected FullOuter, got $types")
  }

  test("orders_with_exists: EXISTS decorrelates to a left semi join") {
    val df = Relational.ordersWithExists(spark, dir)
    val types = joinTypes(df)
    assert(types.contains(LeftSemi),
      s"EXISTS must decorrelate to LeftSemi, got $types")
    // and the semantics: matches the explicit semi-join form
    val orders = graft.core.Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
    val returned = graft.core.Tables.load(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
    val manual = orders.join(returned,
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val out = df.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.sameElements(manual))
  }

  test("parts_below_avg_qty: scalar subquery decorrelates to an aggregate join") {
    val df = Relational.partsBelowAvgQty(spark, dir)
    // the correlated subquery must be GONE from the physical plan —
    // rewritten to a per-partkey aggregate joined back, never a
    // per-row re-scan
    val plan = df.queryExecution.executedPlan
    assert(!plan.toString.contains("Subquery"),
      "scalar subquery survived into the physical plan")
    val types = joinTypes(df)
    assert(types.count(t => t == LeftOuter || t == Inner) >= 2,
      s"expected the decorrelated agg join + the part join, got $types")
    // semantics vs the manual decorrelated form
    val li = graft.core.Tables.load(spark, dir, "lineitem")
    val avgQ = li.groupBy(col("l_partkey").as("pk"))
      .agg((avg("l_quantity") * 0.2).as("thr"))
    val manual = li.join(avgQ, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("thr"))
      .join(graft.core.Tables.load(spark, dir, "part"),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val out = df.collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out === manual)
  }

  test("customers_without_urgent: NOT EXISTS decorrelates to LeftAnti") {
    val df = Relational.customersWithoutUrgent(spark, dir)
    val types = joinTypes(df)
    assert(types.contains(LeftAnti),
      s"NOT EXISTS must decorrelate to LeftAnti, got $types")
    val manual = graft.core.Tables.load(spark, dir, "customer")
      .join(graft.core.Tables.load(spark, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(df.select("c_custkey").collect().map(_.getLong(0)).toSet
      === manual)
    assert(manual.nonEmpty, "fixture must contain urgent-free customers")
  }

  test("viaSql: concurrent rollup + grouping sets on one session") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // sequential baselines first
    val rollupRef = Relational.aggRollup(spark, dir).collect().toSeq
    val gsRef = Relational.aggGroupingSets(spark, dir).collect().toSeq
    // then hammer both concurrently on the SAME session: the old
    // fixed-name temp views made one query read the other's view
    // definition mid-flight
    val futures = (1 to 4).map { i =>
      Future {
        if (i % 2 == 0) ("rollup", Relational.aggRollup(spark, dir).collect().toSeq)
        else ("gs", Relational.aggGroupingSets(spark, dir).collect().toSeq)
      }
    }
    val results = Await.result(Future.sequence(futures), 120.seconds)
    results.foreach {
      case ("rollup", rows) => assert(rows === rollupRef)
      case (_, rows) => assert(rows === gsRef)
    }
  }

  test("viaSql: drops its temp views even when the build fails") {
    def graftViews() = spark.catalog.listTables()
      .filter(col("name").startsWith("graft_")).count()
    assert(graftViews() === 0, "precondition: clean catalog")
    intercept[Exception] {
      Relational.viaSql(spark, dir, "customer", "nation") { _ =>
        "SELECT syntax error FROM nowhere !!!"
      }
    }
    assert(graftViews() === 0, "views must be dropped on failure")
    // and when a LATER table fails to load, the earlier view still drops
    intercept[Exception] {
      Relational.viaSql(spark, dir, "customer", "no_such_table") { v =>
        s"SELECT * FROM ${v("customer")}"
      }
    }
    assert(graftViews() === 0, "partially-created views must be dropped")
  }
}
