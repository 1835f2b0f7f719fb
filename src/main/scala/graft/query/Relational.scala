package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.core.Tables.{dec2, moneyAvg, moneySum}

/** Relational operator surface (SURVEY.md §2 B1–B11): scans, joins,
  * aggregations, windows, sorts, set ops over the TPC-H-ish test tables.
  *
  * Scale notes (100 TB design intent, verified via .explain on local[32]):
  *  - dimension joins (customer/nation/region/part) are explicitly
  *    broadcast — at production scale these stay far below the broadcast
  *    threshold while the fact tables (lineitem/orders) never shuffle for
  *    the join;
  *  - fact-fact joins (orders⋈lineitem) rely on sort-merge + AQE;
  *  - all aggregates are partial-then-final hash aggregations (map-side
  *    combine) by construction — groupBy on low-cardinality keys;
  *  - every query ends in a TOTAL order (unique tiebreaker) purely for the
  *    differential oracle; the ordering is a TakeOrderedAndProject or a
  *    final sort on already-reduced data, not a bottleneck at scale.
  */
object Relational {

  /** Run SQL against uniquely-named temp views of the given tables.
    *
    * View names carry a per-call uuid so two concurrent queries on one
    * SparkSession can never race on a shared view definition (the old
    * fixed `graft_customer` names made aggRollup/aggGroupingSets
    * session-global mutations). Spark analyzes the statement EAGERLY
    * inside `spark.sql`, so the views are safe to drop before the
    * returned DataFrame ever executes. CLASSIC-SPARK CONSTRAINT: under
    * Spark Connect analysis is lazy — the views would be gone before
    * resolution; porting this helper there means forcing analysis
    * (touch `df.queryExecution.analyzed`) before the finally runs. */
  private[query] def viaSql(spark: SparkSession, dir: String,
      tables: String*)(build: Map[String, String] => String): DataFrame = {
    val suffix = java.util.UUID.randomUUID().toString.replace("-", "")
    val names = tables.map(t => t -> s"graft_${t}_$suffix").toMap
    // view creation sits INSIDE the try: if a later table fails to load,
    // the finally still drops the views that were already registered
    // (dropTempView on a never-created name is a no-op, not an error)
    try {
      names.foreach { case (t, v) =>
        Tables.load(spark, dir, t).createOrReplaceTempView(v)
      }
      spark.sql(build(names))
    } finally names.values.foreach(spark.catalog.dropTempView)
  }

  /** B1: predicate + projection; both must reach the parquet scan
    * (PushedFilters / ReadSchema). */
  def scanFilterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_quantity") > 45 && col("l_discount") <= 0.03)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity",
        "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** B5: TPC-H Q1-style aggregate over lineitem. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        moneyAvg(col("l_quantity")).as("avg_qty"),
        moneyAvg(col("l_extendedprice")).as("avg_price"),
        moneyAvg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** B2: fact ⋈ broadcast dimension. */
  def joinBroadcast(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val customer = Tables.load(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    orders.join(broadcast(customer),
        orders("o_custkey") === customer("c_custkey"))
      .select("o_orderkey", "c_custkey", "c_name", "o_totalprice",
        "o_orderdate")
      .orderBy("o_orderkey")
  }

  /** B3: multi-way dim chain customer⋈nation⋈region, rolled up. */
  def joinMulti(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer")
    val nation = Tables.load(spark, dir, "nation")
    val region = Tables.load(spark, dir, "region")
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_customers"),
        moneySum(col("c_acctbal")).as("total_acctbal"))
      .orderBy("r_name", "n_name")
  }

  /** TPC-H Q5-flavored headline: lineitem⋈orders⋈customer⋈nation⋈region,
    * revenue per nation. Fact-fact join shuffles on orderkey; all dims
    * broadcast. */
  def q5MultiJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val orders = Tables.load(spark, dir, "orders")
    val customer = Tables.load(spark, dir, "customer")
    val nation = Tables.load(spark, dir, "nation")
    val region = Tables.load(spark, dir, "region")
    li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy("r_name", "n_name")
  }

  /** TPC-H Q3 shape (shipping-priority top-N): segment-filtered
    * customers ⋈ open orders ⋈ not-yet-shipped lineitems, revenue per
    * order, top 10. The segment/date predicates sit on the base scans
    * (pushed to parquet); the customer side is explicitly broadcast
    * (dimension-sized after its filter) so only lineitem⋈orders pays a
    * shuffle; the top-10 over (revenue, date, orderkey) executes as
    * TakeOrderedAndProject — ≤10 rows per task reach the driver, no
    * global sort materializes. Ties carry a full tiebreak so the LIMIT
    * is deterministic for the differential oracle. */
  def q3TopOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val orders = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1995-03-15"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val items = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1995-03-15"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    items.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(
        sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  /** B4a: customers that have at least one order (left semi). */
  def joinSemi(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer")
    val orders = Tables.load(spark, dir, "orders")
    customer.join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** LEFT OUTER join — every order, null-extended with its returned-item
    * rollup (lineitems with l_returnflag = 'R'). The most common
    * relational op after inner join; the aggregate-then-outer-join shape
    * is the standard "fact with optional satellite rollup" pattern. The
    * build side is pre-aggregated to one row per orderkey, so the output
    * stays one row per order (o_orderkey is unique in orders — a total
    * ORDER BY). Orders with no returns prove the null extension. At
    * scale: both sides shuffle once on orderkey (sort-merge); the
    * aggregation is partial map-side first. */
  def joinOuterLeft(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val returns = Tables.load(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .groupBy("l_orderkey")
      .agg(moneySum(col("l_quantity")).as("returned_qty"),
        count(lit(1)).as("n_returned_items"))
    orders.join(returns, orders("o_orderkey") === returns("l_orderkey"),
        "left")
      .select("o_orderkey", "o_orderstatus", "o_totalprice",
        "returned_qty", "n_returned_items")
      .orderBy("o_orderkey")
  }

  /** FULL OUTER join — per-customer urgent-order panel ⋈ low-priority
    * panel, keyed on custkey: customers appear whether they have only
    * urgent orders (right side null), only low (left side null), or
    * both. Both inputs are grouped to one row per key, so
    * coalesce(ck_u, ck_l) is unique — a total ORDER BY. Full outer
    * cannot broadcast either side (both must null-extend), so the plan
    * is a single sort-merge shuffle on the key — exactly what it should
    * be at 100 TB. */
  def joinOuterFull(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    def panel(priority: String, ck: String, n: String, spend: String) =
      orders.filter(col("o_orderpriority") === priority)
        .groupBy(col("o_custkey").as(ck))
        .agg(count(lit(1)).as(n),
          moneySum(col("o_totalprice")).as(spend))
    val urgent = panel("1-URGENT", "ck_u", "n_urgent", "urgent_spend")
    val low = panel("5-LOW", "ck_l", "n_low", "low_spend")
    urgent.join(low, col("ck_u") === col("ck_l"), "full_outer")
      .select(coalesce(col("ck_u"), col("ck_l")).as("custkey"),
        col("n_urgent"), col("urgent_spend"), col("n_low"),
        col("low_spend"))
      .orderBy("custkey")
  }

  /** Correlated EXISTS subquery (TPC-H Q4 shape): orders in a one-year
    * window having at least one returned lineitem, counted by priority.
    * Expressed as SQL EXISTS — the planner path a SQL user actually
    * takes — which Catalyst decorrelates into a left semi join
    * (RewritePredicateSubquery); OuterJoinSpec asserts the physical plan
    * really is a semi join, not a per-row subquery. The oracle twin is
    * the same statement. */
  def ordersWithExists(spark: SparkSession, dir: String): DataFrame =
    viaSql(spark, dir, "orders", "lineitem") { v =>
      s"""SELECT o_orderpriority, count(*) AS n_orders
         |FROM ${v("orders")} o
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |  AND EXISTS (SELECT 1 FROM ${v("lineitem")} l
         |    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority
         |""".stripMargin
    }

  /** Correlated SCALAR subquery (TPC-H Q17 shape): lineitems whose
    * quantity falls below 20 % of their own part's average quantity,
    * rolled up per brand — the "small orders" demand question. Catalyst
    * decorrelates the per-row subquery into ONE per-partkey aggregate
    * left-outer-joined back to lineitem (RewriteCorrelatedScalarSubquery)
    * — a single extra shuffle at scale, never a per-row re-scan;
    * OuterJoinSpec asserts the join is there and no subquery survives
    * in the physical plan. Cross-engine determinism: quantities are
    * integral, so sum/count/avg are EXACT doubles on both engines and
    * the 0.2·avg comparison cannot flip on summation order. */
  def partsBelowAvgQty(spark: SparkSession, dir: String): DataFrame =
    viaSql(spark, dir, "lineitem", "part") { v =>
      s"""SELECT p_brand, count(*) AS n_small,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         |    AS small_revenue
         |FROM ${v("lineitem")} l
         |JOIN ${v("part")} p ON l.l_partkey = p.p_partkey
         |WHERE l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
         |  FROM ${v("lineitem")} l2 WHERE l2.l_partkey = l.l_partkey)
         |GROUP BY p_brand
         |ORDER BY p_brand
         |""".stripMargin
    }

  /** NOT EXISTS anti-join — customers with no urgent orders. The
    * null-tolerant planner path SQL users take for "absence" queries:
    * decorrelates to a plain LeftAnti (asserted in OuterJoinSpec),
    * unlike [[joinAnti]]'s NOT IN, which must plan a null-aware anti
    * join (different, more expensive operator when the subquery column
    * is nullable). One shuffle per side at scale. */
  def customersWithoutUrgent(spark: SparkSession, dir: String): DataFrame =
    viaSql(spark, dir, "customer", "orders") { v =>
      s"""SELECT c_custkey, c_name, c_mktsegment
         |FROM ${v("customer")} c
         |WHERE NOT EXISTS (SELECT 1 FROM ${v("orders")} o
         |  WHERE o.o_custkey = c.c_custkey
         |    AND o.o_orderpriority = '1-URGENT')
         |ORDER BY c_custkey
         |""".stripMargin
    }

  /** B4b: customers with no orders (left anti). */
  def joinAnti(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer")
    val orders = Tables.load(spark, dir, "orders")
    customer.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** Exact interpolated percentiles per group (the oracle-checkable
    * form; at 100 TB the same query swaps `percentile` for
    * `approx_percentile` — t-digest-style sketch, one pass, mergeable —
    * and gives up the hash-exact oracle for an ε bound). */
  def aggPercentile(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5D)"), 6).as("p50"),
        round(expr("percentile(value, 0.9D)"), 6).as("p90"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  /** The 100 TB percentile: [[aggPercentile]]'s exact form must sort
    * every group member; this swap runs Spark's native
    * Greenwald–Khanna-style sketch (`approx_percentile`) — fixed
    * memory per group, mergeable map-side partials, relative error
    * bounded by `accuracy`. Rows-only at the driver gate (sketch
    * internals are engine-specific — DuckDB's approx_quantile uses a
    * different sketch); ApproxSpec bounds the error against the exact
    * percentiles instead. */
  def aggPercentileApprox(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy("event_type")
      .agg(
        expr("approx_percentile(value, 0.5D, 10000)").as("p50_approx"),
        expr("approx_percentile(value, 0.9D, 10000)").as("p90_approx"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  /** B6: distinct counting. */
  def aggDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"),
        moneySum(col("o_totalprice")).as("total_price"))
      .orderBy("o_orderpriority")

  /** B7: ROLLUP over (nation, segment). NULL grouping rows sort first in
    * both engines (Spark default asc = NULLS FIRST; oracle SQL says it
    * explicitly). Expressed via spark.sql: the DataFrame rollup-over-join
    * form trips a DetectAmbiguousSelfJoin false positive in Spark 4.1
    * (Expand duplicates dataset-id-tagged attributes). */
  def aggRollup(spark: SparkSession, dir: String): DataFrame =
    viaSql(spark, dir, "customer", "nation") { v =>
      s"""SELECT /*+ BROADCAST(${v("nation")}) */ n_name, c_mktsegment,
         |  count(*) AS n_customers,
         |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
         |    AS total_acctbal
         |FROM ${v("customer")} JOIN ${v("nation")}
         |  ON c_nationkey = n_nationkey
         |GROUP BY ROLLUP(n_name, c_mktsegment)
         |ORDER BY n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST
         |""".stripMargin
    }

  /** B7 sibling: explicit GROUPING SETS — the general form ROLLUP/CUBE
    * specialize. Two independent one-dimension panels (per-nation, per-
    * segment) plus the grand total in ONE pass over the join: Expand
    * replicates each input row once per set, then a single hash
    * aggregation — at 100 TB this beats three separate scans+aggs by 3×
    * on input volume. Same spark.sql form as [[aggRollup]] (the
    * DataFrame rollup-over-join form trips DetectAmbiguousSelfJoin in
    * Spark 4.1). */
  def aggGroupingSets(spark: SparkSession, dir: String): DataFrame =
    viaSql(spark, dir, "customer", "nation") { v =>
      s"""SELECT /*+ BROADCAST(${v("nation")}) */ n_name, c_mktsegment,
         |  count(*) AS n_customers,
         |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
         |    AS total_acctbal
         |FROM ${v("customer")} JOIN ${v("nation")}
         |  ON c_nationkey = n_nationkey
         |GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
         |ORDER BY n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST
         |""".stripMargin
    }

  /** NTILE window: quartile of each order's price within its priority
    * class. The frame-free ranking window shape: one hash shuffle on the
    * partition key, per-partition sort, no cross-partition state. The
    * ORDER BY carries a unique tiebreaker (o_orderkey) so tile edges are
    * deterministic across engines and partitionings. */
  def windowNtile(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.load(spark, dir, "orders")
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .select("o_orderpriority", "o_orderkey", "o_totalprice", "quartile")
      .orderBy("o_orderpriority", "o_orderkey")
  }

  /** Distribution-position window functions — percent_rank, cume_dist,
    * dense_rank over a per-priority price order (unique tiebreak ⇒
    * every rank deterministic, so percent_rank/cume_dist are exactly
    * (rank−1)/(n−1) and rank/n on identical integers in both engines —
    * rounded anyway, the standard parity surface). Same scale class as
    * [[windowNtile]]: one partition shuffle + per-partition sort. */
  def windowRankStats(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        dense_rank().over(w).cast("long").as("drank"))
      .orderBy("o_orderkey")
  }

  /** ROLLUP with explicit grouping flags — `grouping_id()` is how a
    * report distinguishes a real NULL group key from a subtotal row,
    * the part of grouping-set semantics [[aggRollup]] leaves implicit.
    * Spark's bitmask convention (detail=0, subtotal over the trailing
    * key=1, grand total=3) matches DuckDB's GROUPING(a, b) exactly —
    * this key pins that. Same one-aggregate Expand shape as rollup. */
  def aggGroupingId(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .rollup("o_orderpriority", "o_orderstatus")
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"),
        moneySum(col("o_totalprice")).as("rev"))
      // gid tiebreak: a genuine-NULL status detail row (gid=0) and the
      // priority subtotal (gid=1) share (priority, NULL) sort keys —
      // without gid their relative order is engine-dependent
      .orderBy(col("o_orderpriority").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first, col("gid").asc)

  /** Schema-drift union — `unionByName(allowMissingColumns = true)`,
    * the operator behind merging deliveries whose schemas evolved
    * (the reference's heterogeneous-JSON world): columns align by
    * NAME, not position, and a column absent from one side
    * null-extends. Pure map-side concatenation — no shuffle (the
    * total order is oracle-only). */
  def setUnionByName(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
    // different column ORDER and a missing column on purpose
    val low = orders.filter(col("o_orderpriority") === "5-LOW")
      .select("o_orderpriority", "o_orderkey")
    urgent.unionByName(low, allowMissingColumns = true)
      .orderBy("o_orderkey")
  }

  /** Scalar string-function panel over part names — the everyday
    * transform surface (case fold, translate, pad, token split,
    * substring, concat, reverse, length), all codegen'd built-ins
    * evaluated scan-side in one projection. Pins cross-engine string
    * semantics (1-based substring, separator-dropping concat_ws,
    * delimiter-splitting split_part) on ASCII fixture data. */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "part")
      .select(col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        translate(col("p_name"), "aeiou", "AEIOU").as("name_tr"),
        lpad(col("p_brand"), 12, "*").as("brand_pad"),
        split_part(col("p_type"), lit(" "), lit(1)).as("type_head"),
        substring(col("p_name"), 1, 8).as("name_sub"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        reverse(col("p_name")).as("name_rev"),
        length(col("p_name")).cast("long").as("name_len"))
      .orderBy("p_partkey")

  /** Map-typed column panel: construction (map_from_arrays), lookup
    * (element_at), interrogation (size / map_keys / map_values) and
    * merge (map_concat) — the surface a pipeline uses for typed
    * key→value metadata columns. Everything projects to SCALARS for
    * the differential oracle (map-typed output would pin the compare
    * to pandas dict hashing; DuckDB's `m['k']` also yields a LIST, so
    * scalar projection is the only stable parity surface). Both
    * engines preserve map insertion order for literal construction,
    * which the keys/vals CSV columns pin. Scale: pure scan-side column
    * algebra, zero shuffle before the oracle ordering. */
  def mapFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "part")
      .withColumn("m", map_from_arrays(
        array(lit("brand"), lit("type")),
        array(col("p_brand"), col("p_type"))))
      .select(col("p_partkey"),
        element_at(col("m"), "brand").as("brand_val"),
        size(col("m")).cast("long").as("m_size"),
        concat_ws(",", map_keys(col("m"))).as("keys_csv"),
        concat_ws(",", map_values(col("m"))).as("vals_csv"),
        element_at(
          map_concat(col("m"),
            map(lit("size"), col("p_size").cast("string"))),
          "size").as("size_val"))
      .orderBy("p_partkey")

  /** Regexp-function panel: extract / extract_all / count / like /
    * replace, all in the RE2-common regex subset (the pii_redact
    * portability rule) so both engines compile the identical automaton.
    * `first_num` deliberately never matches on this fixture — it pins
    * the empty-string-on-no-match contract (both engines return ''
    * rather than NULL). Spark's regexp_replace is global by default;
    * DuckDB needs the explicit 'g' flag — the twin carries it. Scale:
    * codegen'd scan-side projection, zero shuffle. */
  def regexpFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "part")
      .select(col("p_partkey"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        regexp_extract(col("p_name"), "(\\d+)", 1).as("first_num"),
        concat_ws(",", regexp_extract_all(col("p_name"),
          lit("([aeiou]+)"), lit(1))).as("vowel_runs"),
        regexp_count(col("p_name"), lit("[aeiou]")).cast("long")
          .as("n_vowels"),
        col("p_name").rlike("^[a-z]").as("starts_lower"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("masked"))
      .orderBy("p_partkey")

  /** Error-safe (`try_*`) function panel — NULL-on-error semantics a
    * pipeline needs to survive dirty data without ANSI aborts:
    * try_divide (NULL on /0), try_cast (NULL on malformed), try_add
    * (NULL on bigint overflow), try_element_at (NULL out of bounds),
    * try_to_timestamp (NULL on unparseable). The DuckDB twin spells
    * the same contracts via TRY_CAST / NULLIF / native NULL list
    * indexing / an explicit CASE for the overflow row (DuckDB has no
    * try_add — the CASE documents the exact semantics being pinned).
    * Division runs on DOUBLES: the 2-dp inputs are exact in double and
    * IEEE division is correctly rounded, so both engines produce the
    * identical bits — a DECIMAL/DECIMAL quotient would instead hit
    * each engine's own result-scale rule. Scale: scan-side, zero
    * shuffle. */
  def tryFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        try_divide(col("l_extendedprice").cast("double"),
          col("l_discount").cast("double")).as("price_per_disc"),
        try_divide(col("l_partkey"), col("l_orderkey") % 3)
          .as("part_per_mod"),
        col("l_returnflag").try_cast("bigint").as("flag_num"),
        try_add(lit(Long.MaxValue), col("l_orderkey")).as("overflowed"),
        try_element_at(array(col("l_returnflag"), col("l_linestatus")),
          lit(5)).as("fifth_elem"),
        // Spark's try_to_timestamp yields session-tz TIMESTAMP (ltz);
        // the oracle's TRY_CAST is ntz — cast so the parquet logical
        // types agree (same trap as last_day/add_months below).
        try_to_timestamp(col("l_returnflag")).cast("timestamp_ntz")
          .as("flag_ts"),
        // Success path: '1995-01-{05..35}' — parses for linenumber 1-6,
        // day 35 (linenumber 7) is invalid → NULL. Exercises BOTH the
        // populated and the null branch so a wrong parse or wrong type
        // can't hide behind an all-NULL column.
        try_to_timestamp(concat(lit("1995-01-"),
          lpad((col("l_linenumber") * 5).cast("string"), 2, "0")))
          .cast("timestamp_ntz").as("good_ts"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Date/interval arithmetic panel: day-interval shift, day diff from
    * an anchor, month-end, end-of-month-clamped add_months, and
    * year-month formatting — pinning the calendar conventions the two
    * engines share (boundary-count datediff on midnight timestamps,
    * clamped month addition). Outputs are timestamps/integers/strings
    * — no floats, exact compare. Scale: scan-side projection. */
  def dateArithFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_date"),
        datediff(col("o_orderdate"), lit("1995-01-01")).cast("long")
          .as("days_since_epoch95"),
        last_day(col("o_orderdate")).cast("timestamp_ntz")
          .as("month_end"),
        add_months(col("o_orderdate"), 3).cast("timestamp_ntz")
          .as("plus3m"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      .orderBy("o_orderkey")

  /** Conditional aggregation — SQL's `FILTER (WHERE …)` clause, the
    * idiom behind every one-pass KPI panel ("count all, count bulk,
    * revenue under discount, max F-status quantity — per flag").
    * Spark has no FILTER syntax on Column aggregates; the equivalent
    * is aggregating over `when(pred, x)` (aggregates skip nulls), and
    * it compiles to the same single partial+final hash aggregate as
    * the unconditional panel — one scan, one shuffle, no per-predicate
    * passes. `max(when(…))` is used for the F-only statistic instead
    * of a sum/count division so a group with zero F rows yields NULL
    * rather than an ANSI divide-by-zero. */
  def aggConditional(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_all"),
        count(when(col("l_quantity") > 25, lit(1))).as("n_bulk"),
        moneySum(when(col("l_discount") > 0.05, col("l_extendedprice")))
          .as("rev_disc"),
        max(when(col("l_linestatus") === "F", col("l_quantity")))
          .as("max_qty_f"))
      .orderBy("l_returnflag")

  /** B7 sibling: CUBE over (returnflag, linestatus). */
  def aggCube(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_items"),
        moneySum(col("l_quantity")).as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"),
        asc_nulls_first("l_linestatus"))

  /** Pivot: per-priority order counts as columns, one row per segment.
    * (Spark pivot ≡ oracle's manual CASE sums.) */
  def aggPivot(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val customer = Tables.load(spark, dir, "customer")
    orders.join(broadcast(customer),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .pivot("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW"))
      .agg(count(lit(1)))
      .withColumnsRenamed(Map(
        "1-URGENT" -> "n_urgent", "2-HIGH" -> "n_high",
        "3-MEDIUM" -> "n_medium", "4-NOT SPECIFIED" -> "n_notspec",
        "5-LOW" -> "n_low"))
      .na.fill(0L)
      .orderBy("c_mktsegment")
  }

  /** B8: top-3 orders per customer by totalprice (dense per-key top-k —
    * a single hash-partitioned window, no global sort). */
  def windowTopk(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.load(spark, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn")
  }

  /** B9: running revenue per customer in orderdate order. */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(spark, dir, "orders")
      .withColumn("running_total",
        sum(dec2(col("o_totalprice"))).over(w).cast("double"))
      .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice",
        "running_total")
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  /** Lag window: days since the customer's previous order. */
  def windowLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.load(spark, dir, "orders")
      .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
      .withColumn("days_since_prev",
        datediff(col("o_orderdate"), col("prev_date")).cast("long"))
      .select("o_custkey", "o_orderkey", "o_orderdate", "days_since_prev")
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  /** B10: global top-k (TakeOrderedAndProject — no full sort at scale). */
  def sortLimit(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
      .limit(50)

  /** B11a: set union — BUILDING-segment customers ∪ customers with an
    * urgent order (distinct keys). */
  def setUnion(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer")
    val orders = Tables.load(spark, dir, "orders")
    val building = customer.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("custkey"))
    building.union(urgent).distinct().orderBy("custkey")
  }

  /** B11b: set except — BUILDING customers with no urgent order. */
  def setExcept(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer")
    val orders = Tables.load(spark, dir, "orders")
    val building = customer.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("custkey"))
    building.except(urgent).orderBy("custkey")
  }

  /** Aggregate counterpart of the window top-k (B8): same result, very
    * different 100 TB plan. The window form shuffles EVERY order row to
    * its customer's partition and sorts the whole group; this form runs
    * the custom bounded-heap aggregate [[graft.functions.TopKPairs]]
    * partially map-side, so each task ships ≤ k pairs per customer into
    * the shuffle. Same oracle SQL as window_topk — result equivalence is
    * hash-proven. */
  def windowTopkAgg(spark: SparkSession, dir: String, k: Int = 3)
      : DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(graft.functions.top_k(col("o_totalprice"), col("o_orderkey"), k)
        .as("top"))
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("i", "p")))
      .select(col("o_custkey"), (col("i") + 1).cast("long").as("rn"),
        col("p.id").as("o_orderkey"), col("p.score").as("o_totalprice"))
      .orderBy("o_custkey", "rn")

  /** Sketch counterpart of [[aggDistinct]]: HyperLogLog++ approximate
    * distinct counts. countDistinct is the 100 TB pain point — it
    * shuffles every distinct (group, key) pair before counting; the
    * sketch aggregates in fixed memory per group, merges map-side, and
    * ships only the sketch bytes. Rows-only oracle (HLL internals are
    * engine-specific); ApproxSpec bounds the error vs the exact count
    * (rsd default 5%). */
  def aggApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy("o_orderpriority")
      // rsd 2% (~1.6 KiB sketch/group) — still fixed-memory, and keeps
      // per-group error within ApproxSpec's 5% bound at ~2.5 sigma
      .agg(approx_count_distinct(col("o_custkey"), 0.02)
          .as("n_customers_approx"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  /** Hot-key sketch for adaptive salting: a seeded sample's per-key
    * histogram, thresholded at the sampled equivalent of `hotThreshold`
    * rows. Detection is best-effort BY DESIGN — a missed hot key only
    * costs skew (the unsalted behavior), never correctness, and the
    * result is provably identical either way. At 100 TB this is the
    * standard pre-pass: one 2% scan with map-side partial counts, vs
    * paying a blanket ×salt explode on every row of the build side. */
  def detectHotKeys(df: DataFrame, keyCol: String, hotThreshold: Long,
      fraction: Double = 0.02): DataFrame =
    df.sample(withReplacement = false, fraction, seed = 7L)
      .groupBy(keyCol).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= math.max(1L, math.round(hotThreshold * fraction)))
      .select(col(keyCol).as("__hot_key"))

  /** Inner equi-join with salting applied ONLY to detected hot keys:
    * non-hot rows join on (key, 0) exactly as a plain join; hot probe
    * rows derive a deterministic salt from `saltSource` (content-derived,
    * NOT rand(), so replays and retries stay idempotent) and the build
    * side replicates hot keys ×`salt` so every (key, salt) pair still
    * meets its match. The broadcast hot-key tag costs nothing when the
    * hot set is empty; the old unconditional form paid the ×salt build
    * explode even on perfectly uniform data. */
  def skewSaltedJoin(probe: DataFrame, probeKey: String,
      saltSource: org.apache.spark.sql.Column, build: DataFrame,
      buildKey: String, salt: Int, hot: DataFrame): DataFrame = {
    val probeT = probe
      .join(broadcast(hot), probe(probeKey) === hot("__hot_key"), "left")
      // coalesce: a NULL saltSource must still land in a live bucket
      // (bucket 0), or the inner join would silently drop the row and
      // break the equals-the-plain-join contract
      .withColumn("__salt", when(col("__hot_key").isNotNull,
        coalesce(pmod(saltSource, lit(salt)), lit(0))).otherwise(lit(0)))
      .drop("__hot_key")
    val buildT = build
      .join(broadcast(hot), build(buildKey) === hot("__hot_key"), "left")
      .withColumn("__salt", explode(sequence(lit(0),
        when(col("__hot_key").isNotNull, lit(salt - 1)).otherwise(lit(0)))))
      .drop("__hot_key")
    probeT.join(buildT, probeT(probeKey) === buildT(buildKey) &&
        probeT("__salt") === buildT("__salt"))
      .drop("__salt")
  }

  /** Skew-salted fact-fact join: the manual remedy for a hot join key
    * (one giant customer / one boilerplate document) that AQE's skew
    * split can't always reach (e.g. when the skewed side feeds an
    * aggregation). Salting is ADAPTIVE — [[detectHotKeys]] sketches the
    * probe side first and only detected hot keys pay the salt spread
    * (SkewSpec covers both regimes). Result is provably identical to
    * the unsalted join — the oracle runs the PLAIN join, so the
    * equivalence is hash-checked on the (uniform) fixture. */
  def joinSkewSalted(spark: SparkSession, dir: String, salt: Int = 8,
      hotThreshold: Long = 1000000L): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val hot = detectHotKeys(li, "l_orderkey", hotThreshold)
    // l_linenumber is 1-based (1..7): shift so salt bucket 0 is live
    skewSaltedJoin(li, "l_orderkey", col("l_linenumber") - 1,
        ord, "o_orderkey", salt, hot)
      .groupBy("o_orderpriority")
      .agg(
        sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy("o_orderpriority")
  }

  /** Range-frame window: trailing-30-day spend per customer. RANGE (not
    * ROWS) — all peer rows within the value interval join the frame, so
    * same-day orders are handled identically in both engines. Ordering
    * key is epoch-days (a long), keeping the frame arithmetic integral. */
  def windowRange(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("order_day"))
      .rangeBetween(-30, Window.currentRow)
    Tables.load(spark, dir, "orders")
      .withColumn("order_day",
        unix_date(col("o_orderdate").cast("date")).cast("long"))
      .withColumn("trailing_30d_spend",
        sum(dec2(col("o_totalprice"))).over(w).cast("double"))
      .withColumn("trailing_30d_orders", count(lit(1)).over(w))
      .select("o_custkey", "o_orderkey", "o_orderdate",
        "trailing_30d_spend", "trailing_30d_orders")
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  /** B11c: set intersect — BUILDING customers that did place an urgent
    * order. */
  def setIntersect(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer")
    val orders = Tables.load(spark, dir, "orders")
    val building = customer.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("custkey"))
    building.intersect(urgent).orderBy("custkey")
  }

  /** B11d: multiset EXCEPT ALL — partkeys of returned line items minus,
    * occurrence-for-occurrence, those on finished lines. Distinct set ops
    * collapse the bag; ALL semantics keep max(0, m−n) copies per value —
    * a different planner path entirely (Spark rewrites to a count-diff
    * aggregate + Generate/ReplicateRows, NOT a distinct). Scale: one hash
    * aggregate on the value, no row-level anti join. */
  def setExceptAll(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val returned = li.filter(col("l_returnflag") === "R")
      .select(col("l_partkey").as("partkey"))
    val finished = li.filter(col("l_linestatus") === "F")
      .select(col("l_partkey").as("partkey"))
    returned.exceptAll(finished).orderBy("partkey")
  }

  /** B11e: multiset INTERSECT ALL — min(m, n) copies per partkey common
    * to both bags. Same ReplicateRows planner path as [[setExceptAll]]. */
  def setIntersectAll(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val returned = li.filter(col("l_returnflag") === "R")
      .select(col("l_partkey").as("partkey"))
    val finished = li.filter(col("l_linestatus") === "F")
      .select(col("l_partkey").as("partkey"))
    returned.intersectAll(finished).orderBy("partkey")
  }

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): a derived
    * priority key where '3-MEDIUM' maps to NULL, joined back to a
    * distinct-key dimension. A plain equi-join silently DROPS the null
    * group (~20 % of orders here); the null-safe operator matches
    * NULL <=> NULL, so the '(unprioritized)' row survives with its full
    * count — that row existing is the semantic under test. Scale: the
    * dimension is distinct-collapsed and broadcast; the fact side never
    * shuffles. */
  def joinNullsafe(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val keyed = orders.select(
      nullif(col("o_orderpriority"), lit("3-MEDIUM")).as("pri"),
      col("o_totalprice"))
    val dim = orders
      .select(nullif(col("o_orderpriority"), lit("3-MEDIUM")).as("dpri"))
      .distinct()
      .withColumn("label", coalesce(col("dpri"), lit("(unprioritized)")))
    keyed.join(broadcast(dim), keyed("pri") <=> dim("dpri"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_orders"),
        moneySum(col("o_totalprice")).as("total"))
      .orderBy("label")
  }

  /** max_by/min_by: the argmax aggregate — "which order was the most /
    * least expensive per priority" — without a window. The ordering key
    * is a (price, orderkey) struct so ties are deterministic (lexical
    * struct comparison == the oracle's two-key ORDER BY). Scale: this is
    * THE swap for rank-1 window queries — a plain hash aggregate with
    * map-side partials instead of shuffling and fully sorting every
    * group. */
  def aggMinmaxBy(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        max_by(col("o_orderkey"),
          struct(col("o_totalprice"), col("o_orderkey"))).as("top_orderkey"),
        max(col("o_totalprice")).as("top_price"),
        min_by(col("o_orderkey"),
          struct(col("o_totalprice"), col("o_orderkey")))
          .as("bottom_orderkey"),
        min(col("o_totalprice")).as("bottom_price"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  /** first/last/nth_value over an explicit full frame: each customer's
    * first, latest, and second order. The frame must be UNBOUNDED
    * PRECEDING..UNBOUNDED FOLLOWING explicitly — last_value over the
    * default frame (..CURRENT ROW) is the classic silent-wrong-answer,
    * returning the current row instead of the partition's last. One row
    * per customer via a post-window distinct on already-constant
    * columns. Scale: one shuffle on the partition key, same as any
    * window; the tiebroken ordering makes every value deterministic. */
  def windowFirstLast(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.load(spark, dir, "orders")
      .select(col("o_custkey"),
        first(col("o_orderkey")).over(w).as("first_orderkey"),
        last(col("o_orderkey")).over(w).as("last_orderkey"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_orderkey"))
      .distinct()
      .orderBy("o_custkey")
  }

  /** Deterministic mode (most frequent value) per group — built-in
    * `mode()` breaks ties arbitrarily, so this runs the scalable
    * two-level form instead: count per (group, value), then argmax by
    * (count, value) with the value itself as tiebreak. Scale: two hash
    * aggregates with map-side partials; nothing sorts a whole group,
    * which is what the naive "order by count desc limit 1 per group"
    * does. */
  def aggMode(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")
      .groupBy("c_mktsegment", "c_nationkey")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("c_mktsegment")
      .agg(
        max_by(col("c_nationkey"), struct(col("cnt"), col("c_nationkey")))
          .as("modal_nationkey"),
        max(struct(col("cnt"), col("c_nationkey"))).getField("cnt")
          .as("modal_count"),
        sum(col("cnt")).as("n_customers"))
      .orderBy("c_mktsegment")

  /** Pearson correlation from EXACT decimal moment sums. Built-in
    * `corr()` accumulates doubles in partition order — not reproducible
    * across engines (or even across runs with different partitioning).
    * Here the five moments are exact DECIMAL sums (deterministic in any
    * order), cast to double once, and combined with one fixed-shape
    * arithmetic expression — bit-identical in Spark and DuckDB, so the
    * key is hash-checkable. Scale: still one partial-then-final hash
    * aggregate; the determinism costs nothing. */
  def aggCorr(spark: SparkSession, dir: String): DataFrame = {
    val q = dec2(col("l_quantity"))
    val p = dec2(col("l_extendedprice"))
    val moments = Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(q).cast("double").as("sx"),
        sum(p).cast("double").as("sy"),
        sum(q * p).cast("double").as("sxy"),
        sum(q * q).cast("double").as("sxx"),
        sum(p * p).cast("double").as("syy"))
    // round(…, 9): the moment sums are bit-identical, but the combining
    // arithmetic can differ by 1 ULP across engines (C++ FMA contraction
    // the JVM never emits) — 9 decimals is ~1e9 ULPs of headroom
    moments.select(
        col("l_returnflag"),
        col("n").cast("long").as("n_rows"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
            sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 9)
          .as("corr_qty_price"))
      .orderBy("l_returnflag")
  }
}
