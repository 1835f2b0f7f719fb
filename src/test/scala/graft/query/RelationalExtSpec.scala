package graft.query

import org.apache.spark.sql.execution.ExpandExec
import org.apache.spark.sql.functions._

import graft.{PlanNodes, SparkSuite, TestSpark}

/** Behavior contracts for the round-6 extension keys beyond the DuckDB
  * hash compare: multiset set-op arithmetic, null-safe join group
  * preservation, argmax/window agreement, gap-fill completeness, melt
  * plan shape, and explode-with-position losslessness. */
class RelationalExtSpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  test("set_except_all keeps max(0, m-n) copies per value") {
    val li = graft.core.Tables.load(spark, dir, "lineitem")
    val m = li.filter(col("l_returnflag") === "R")
      .groupBy(col("l_partkey").as("partkey"))
      .agg(count(lit(1)).as("m"))
    val n = li.filter(col("l_linestatus") === "F")
      .groupBy(col("l_partkey").as("partkey"))
      .agg(count(lit(1)).as("n"))
    val expected = m.join(n, Seq("partkey"), "left")
      .select(greatest(coalesce(col("m"), lit(0L)) -
        coalesce(col("n"), lit(0L)), lit(0L)).as("k"))
      .agg(sum(col("k"))).collect()(0).getLong(0)
    assert(Relational.setExceptAll(spark, dir).count() === expected)
  }

  test("set_intersect_all keeps min(m, n) copies per value") {
    val li = graft.core.Tables.load(spark, dir, "lineitem")
    val m = li.filter(col("l_returnflag") === "R")
      .groupBy(col("l_partkey").as("partkey"))
      .agg(count(lit(1)).as("m"))
    val n = li.filter(col("l_linestatus") === "F")
      .groupBy(col("l_partkey").as("partkey"))
      .agg(count(lit(1)).as("n"))
    val expected = m.join(n, Seq("partkey"))
      .select(least(col("m"), col("n")).as("k"))
      .agg(sum(col("k"))).collect()(0).getLong(0)
    assert(Relational.setIntersectAll(spark, dir).count() === expected)
  }

  test("join_nullsafe preserves the NULL key group a plain join drops") {
    val out = Relational.joinNullsafe(spark, dir).cache()
    try {
      val orders = graft.core.Tables.load(spark, dir, "orders")
      val nMedium = orders
        .filter(col("o_orderpriority") === "3-MEDIUM").count()
      assert(nMedium > 0, "fixture must contain 3-MEDIUM orders")
      val nullGroup = out.filter(col("label") === "(unprioritized)")
        .collect()
      assert(nullGroup.length === 1, "NULL <=> NULL must match")
      assert(nullGroup(0).getAs[Long]("n_orders") === nMedium,
        "the null group must carry its FULL count")
      // sanity: the operator partitions ALL orders (nothing dropped)
      val total = out.agg(sum(col("n_orders"))).collect()(0).getLong(0)
      assert(total === orders.count())
    } finally out.unpersist()
  }

  test("agg_minmax_by: argmax key's own row carries the max price") {
    val out = Relational.aggMinmaxBy(spark, dir)
    val orders = graft.core.Tables.load(spark, dir, "orders")
    val top = out.select(col("top_orderkey").as("o_orderkey"),
      col("top_price"))
    val joined = top.join(orders, Seq("o_orderkey"))
    assert(joined.filter(col("top_price") =!= col("o_totalprice"))
      .count() === 0, "max_by key must point at the max-price row")
  }

  test("events_gapfill: full spine, explicit zeros, counts preserved") {
    val out = Events.gapfill(spark, dir).cache()
    try {
      val ev = graft.core.Tables.load(spark, dir, "events")
      val days = ev.select(col("ts").cast("date")).distinct().count()
      val types = ev.select("event_type").distinct().count()
      // the event fixture has at least one event every day, so the
      // spine day count equals the distinct event-day count
      assert(out.count() === days * types,
        "every (day, type) cell must be present")
      assert(out.filter(col("n_events") === 0).count() > 0,
        "gaps must be explicit zeros, not missing rows")
      val kept = out.agg(sum(col("n_events"))).collect()(0).getLong(0)
      val expected = ev.filter(col("value") > 250).count()
      assert(kept === expected, "gap filling must not invent events")
    } finally out.unpersist()
  }

  test("corpus_melt reshapes via one Expand, not N re-scans") {
    val out = TextQuality.corpusMelt(spark, dir)
    assert(PlanNodes.all(out).exists(_.isInstanceOf[ExpandExec]),
      "unpivot should plan as a scan-side Expand")
    val sources = graft.core.Tables.load(spark, dir, "documents")
      .select("source").distinct().count()
    assert(out.count() === sources * 3, "3 metrics per source")
  }

  test("agg_corr tracks the built-in estimator") {
    val exact = Relational.aggCorr(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val builtin = graft.core.Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(exact.keySet === builtin.keySet)
    exact.foreach { case (k, v) =>
      assert(math.abs(v) <= 1.0)
      assert(math.abs(v - builtin(k)) < 1e-9,
        s"$k: exact-moment $v vs built-in ${builtin(k)}")
    }
  }

  test("agg_mode picks the max count and breaks ties toward the larger value") {
    val counts = graft.core.Tables.load(spark, dir, "customer")
      .groupBy("c_mktsegment", "c_nationkey")
      .agg(count(lit(1)).as("cnt")).cache()
    try {
      Relational.aggMode(spark, dir).collect().foreach { row =>
        val seg = row.getString(0)
        val inSeg = counts.filter(col("c_mktsegment") === seg)
        val maxCnt = inSeg.agg(max(col("cnt"))).collect()(0).getLong(0)
        assert(row.getAs[Long]("modal_count") === maxCnt)
        // c_nationkey is int-typed; compare through Number to dodge boxing
        val tieWinner = inSeg.filter(col("cnt") === maxCnt)
          .agg(max(col("c_nationkey"))).collect()(0)
          .getAs[Number](0).longValue
        assert(row.getAs[Number]("modal_nationkey").longValue === tieWinner,
          s"$seg: tiebreak must choose the largest value among max-count")
      }
    } finally counts.unpersist()
  }

  test("window_first_last matches an independent sorted-list recomputation") {
    val out = Relational.windowFirstLast(spark, dir).cache()
    try {
      val orders = graft.core.Tables.load(spark, dir, "orders")
      assert(out.count() ===
        orders.select("o_custkey").distinct().count(),
        "one row per customer")
      // independent path: sorted collect_list instead of a window frame;
      // `when` leaves second_orderkey NULL for single-order partitions,
      // the same contract nth_value(2) has
      val expected = orders.groupBy("o_custkey")
        .agg(sort_array(collect_list(struct(col("o_orderdate"),
          col("o_orderkey")))).as("s"))
        .select(col("o_custkey"),
          element_at(col("s"), 1).getField("o_orderkey")
            .as("first_orderkey"),
          element_at(col("s"), -1).getField("o_orderkey")
            .as("last_orderkey"),
          when(size(col("s")) >= 2,
            element_at(col("s"), 2).getField("o_orderkey"))
            .as("second_orderkey"))
      assert(out.exceptAll(expected).count() === 0 &&
        expected.exceptAll(out).count() === 0,
        "window-frame and sorted-aggregate forms must agree row-for-row")
    } finally out.unpersist()
  }

  test("doc_tokens_pos is lossless: tokens rejoin to the original text") {
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 97 === 0)
    val rebuilt = TextSim.docTokensPos(spark, dir)
      .groupBy("doc_id")
      .agg(concat_ws(" ", sort_array(collect_list(struct(col("pos"),
        col("tok")))).getField("tok")).as("rebuilt"))
    val cmp = docs.join(rebuilt, Seq("doc_id"))
    assert(cmp.count() === docs.count())
    assert(cmp.filter(col("text") =!= col("rebuilt")).count() === 0,
      "positions must order tokens back into the exact original text")
  }

  test("q3_top_orders: broadcast dim, top-N execution, ordered output") {
    val df = Relational.q3TopOrders(spark, dir)
    val nodes = PlanNodes.all(df.queryExecution.executedPlan)
    assert(nodes.exists(_.nodeName.contains("BroadcastHashJoin")),
      "segment-filtered customer side must broadcast")
    assert(nodes.exists(_.nodeName.contains("TakeOrderedAndProject")),
      "LIMIT over ORDER BY must run as top-N, not a global sort")
    val rows = df.collect()
    assert(rows.length === 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b },
      "revenue must be non-increasing")
  }

  test("events_anomaly: z-scores center at zero and the flag matches") {
    val out = Events.anomalyDaily(spark, dir).cache()
    try {
      // Σ(x − mean) = 0 exactly, so rounded z-scores per type must sum
      // to ~0 (n_days × rounding ulp at most)
      val sums = out.groupBy("event_type")
        .agg(sum(col("zscore")).as("zsum"), count(lit(1)).as("days"))
        .collect()
      sums.foreach { r =>
        assert(math.abs(r.getAs[Double]("zsum")) <=
          r.getAs[Long]("days") * 1e-6, s"z-scores must center at 0: $r")
      }
      assert(out.filter((abs(col("zscore")) > 2.0) =!= col("is_anomaly"))
        .count() === 0, "flag must derive from the rounded z-score")
      assert(out.filter(col("is_anomaly")).count() < out.count() / 10,
        "anomalies must be the rare tail, not the bulk")
    } finally out.unpersist()
  }

  test("higher_order_funcs agrees with an explode-based recomputation") {
    val toks = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), posexplode(TextSim.tokens(col("text")))
        .as(Seq("pos", "tok")))
    val expected = toks
      .withColumn("next_tok", lead(col("tok"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("pos")))
      .groupBy("doc_id")
      .agg(sum(length(col("tok"))).as("e_sum"),
        count(when(length(col("tok")) > 4, lit(1))).as("e_long"),
        count(when(col("tok") === col("next_tok"), lit(1))).as("e_adj"))
    val cmp = TextSim.hofFuncs(spark, dir).join(expected, Seq("doc_id"))
    assert(cmp.count() === 500)
    assert(cmp.filter(col("sum_tok_len") =!= col("e_sum") ||
      col("n_long") =!= col("e_long") ||
      col("n_adj_repeat") =!= col("e_adj")).count() === 0,
      "lambda algebra must match the explode+window recomputation")
  }

  test("regexp_funcs: mask is length-preserving and counts agree") {
    val part = graft.core.Tables.load(spark, dir, "part")
    val cmp = Relational.regexpFuncs(spark, dir).join(part, Seq("p_partkey"))
    assert(cmp.filter(
      length(col("masked")) =!= length(col("p_name")) ||
      // independent vowel count: chars removed by translate
      col("n_vowels") =!=
        (length(col("p_name")) -
          length(translate(col("p_name"), "aeiou", ""))).cast("long") ||
      col("first_num") =!= "" ||
      !col("starts_lower")).count() === 0)
  }

  test("try_funcs: NULL exactly where the error would be") {
    val out = Relational.tryFuncs(spark, dir).cache()
    try {
      assert(out.filter(col("flag_num").isNotNull).count() === 0,
        "casting 'N'/'R'/'A' to bigint must be null, not an abort")
      assert(out.filter(col("fifth_elem").isNotNull).count() === 0)
      assert(out.filter(col("flag_ts").isNotNull).count() === 0)
      // success path: days 05..30 parse, day 35 (linenumber 7) fails —
      // the column must be NULL exactly there and populated elsewhere
      assert(out.filter(
        col("good_ts").isNull =!= (col("l_linenumber") === 7))
        .count() === 0,
        "try_to_timestamp must parse valid dates and NULL on day 35")
      assert(out.filter(col("good_ts").isNotNull).count() > 0,
        "the success path must actually produce non-NULL timestamps")
      assert(out.filter(col("l_linenumber") === 2).filter(
        col("good_ts") =!= lit("1995-01-10 00:00:00")
          .cast("timestamp_ntz")).count() === 0,
        "parsed value must be the midnight ntz timestamp of the date")
      // both timestamp columns must be ntz to match the oracle's
      // TRY_CAST semantics (the r6 schema-mismatch regression)
      import org.apache.spark.sql.types.TimestampNTZType
      assert(out.schema("flag_ts").dataType === TimestampNTZType)
      assert(out.schema("good_ts").dataType === TimestampNTZType)
      assert(out.filter(
        col("overflowed").isNull =!= (col("l_orderkey") > 0)).count() === 0,
        "try_add overflows to NULL exactly when the addend is positive")
      assert(out.filter(
        col("part_per_mod").isNull =!= (col("l_orderkey") % 3 === 0))
        .count() === 0, "try_divide is NULL exactly on zero divisors")
    } finally out.unpersist()
  }

  test("date_arith_funcs: interval shift and clamped month-add agree") {
    val orders = graft.core.Tables.load(spark, dir, "orders")
    val cmp = Relational.dateArithFuncs(spark, dir)
      .join(orders, Seq("o_orderkey")).cache()
    try {
      assert(cmp.filter(
        datediff(col("due_date"), col("o_orderdate")) =!= 30).count() === 0)
      assert(cmp.filter(col("month_end") < col("o_orderdate"))
        .count() === 0)
      assert(cmp.filter(
        col("ym") =!= date_format(col("o_orderdate"), "yyyy-MM"))
        .count() === 0)
      // add_months never lands on an earlier day-of-month than the
      // clamped month-end allows, and always moves exactly 3 months
      assert(cmp.filter(
        months_between(col("plus3m"), col("o_orderdate")) > 3.0)
        .count() === 0)
    } finally cmp.unpersist()
  }

  test("map_funcs round-trips construction through lookup") {
    val part = graft.core.Tables.load(spark, dir, "part")
    val cmp = Relational.mapFuncs(spark, dir).join(part, Seq("p_partkey"))
    assert(cmp.filter(col("m_size") =!= 2 ||
      col("keys_csv") =!= "brand,type" ||
      col("brand_val") =!= col("p_brand") ||
      col("vals_csv") =!= concat_ws(",", col("p_brand"), col("p_type")) ||
      col("size_val") =!= col("p_size").cast("string")).count() === 0)
  }
}
