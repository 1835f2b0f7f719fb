package graft.query

import org.apache.spark.sql.functions._

import graft.{SparkSuite, TestSpark}

/** Unit checks for the one-scan table profile beyond the DuckDB
  * hash-compare: stats tie out against direct per-column aggregates, and
  * the null-handling paths the no-null fixture cannot exercise are
  * driven on a constructed frame. */
class ProfileSpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  test("profile_table: one row per column; stats tie out against direct aggregates") {
    val t = graft.core.Tables.load(spark, dir, "orders")
    val out = Profile.profileTable(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet === t.schema.fieldNames.toSet)
    val n = t.count()
    out.values.foreach { r =>
      assert(r.getLong(1) === n, s"${r.getString(0)} n_rows")
      assert(r.getLong(2) === 0L, s"${r.getString(0)} n_nulls on no-null fixture")
    }
    assert(out("o_orderstatus").getLong(3) ===
      t.select(countDistinct(col("o_orderstatus"))).first().getLong(0))
    assert(out("o_orderkey").getString(4) ===
      t.agg(min("o_orderkey")).first().getLong(0).toString)
    assert(out("o_orderkey").getString(5) ===
      t.agg(max("o_orderkey")).first().getLong(0).toString)
    // timestamps render at the shared second-grain UTC format
    assert(out("o_orderdate").getString(4)
      .matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}"""))
    assert(out("o_orderdate").getDouble(6) === 19.0)
  }

  test("profileOf: nulls counted, min/max ignore them and order TYPED, not lexicographically") {
    import spark.implicits._
    val df = Seq[(Option[Long], Option[String])](
      (Some(9L), Some("b")), (Some(10L), None),
      (None, Some("a")), (Some(2L), Some("c")))
      .toDF("k", "s")
    val out = Profile.profileOf(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val k = out("k")
    assert(k.getLong(1) === 4L)
    assert(k.getLong(2) === 1L)
    assert(k.getLong(3) === 3L)
    // numeric order: min 2, max 10 — a string-ordered profile would
    // report min "10" / max "9"
    assert(k.getString(4) === "2")
    assert(k.getString(5) === "10")
    // mean width over NON-NULL values only: (1 + 2 + 1) / 3
    assert(math.abs(k.getDouble(6) - 1.333333) < 1e-9)
    val s = out("s")
    assert(s.getLong(2) === 1L)
    assert(s.getLong(3) === 3L)
    assert(s.getString(4) === "a" && s.getString(5) === "c")
  }

  test("profile_merge: merged partials reproduce the full-scan profile exactly; sketch bound green") {
    val full = Profile.profileTable(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val merged = Profile.profileMerge(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(merged.keySet === full.keySet)
    merged.foreach { case (name, m) =>
      val f = full(name)
      // every mergeable stat is EXACT: counts, nulls, typed min/max,
      // width sums — identical to the one-scan profile
      assert(m.getLong(1) === f.getLong(1), s"$name n_rows")
      assert(m.getLong(2) === f.getLong(2), s"$name n_nulls")
      assert(m.getLong(3) === f.getLong(3), s"$name n_distinct (exact side)")
      assert(m.getString(4) === f.getString(4), s"$name min_val")
      assert(m.getString(5) === f.getString(5), s"$name max_val")
      assert(math.abs(m.getDouble(6) - f.getDouble(6)) < 1e-9, s"$name avg_len")
      assert(m.getBoolean(7), s"$name distinct_est_ok")
    }
  }

  test("profileMergeOf: merge algebra survives skewed slices (all nulls in one, a lone min in another)") {
    import spark.implicits._
    val df = Seq[(Long, Option[Long])](
      // slice 0: the lone global minimum
      (0L, Some(-100L)),
      // slice 1: all null
      (1L, None), (3L, None),
      // slice 2: ordinary values incl. the global max
      (2L, Some(7L)), (4L, Some(50L)), (6L, Some(7L)))
      .toDF("id", "v")
    val out = Profile.profileMergeOf(df, pmod(col("id"), lit(3)))
      .collect().map(r => r.getString(0) -> r).toMap
    val v = out("v")
    assert(v.getLong(1) === 6L)      // n_rows
    assert(v.getLong(2) === 2L)      // n_nulls (the all-null slice)
    assert(v.getLong(3) === 3L)      // exact distinct: -100, 7, 50
    assert(v.getString(4) === "-100")
    assert(v.getString(5) === "50")
    assert(v.getBoolean(7), "sketch union must be exact at this cardinality")
  }

  test("planted drift: each flag fires exactly where planted") {
    import spark.implicits._
    // three deliveries; delivery 3 plants all three drift classes in
    // separate columns so attribution is unambiguous
    val rows =
      // delivery 1: baseline — ids 0-9, v in [10,20], all distinct k
      (0L until 10L).map(i => (1L, i, Some(10L + i), s"k$i")) ++
      // delivery 2: same shape (no drift anywhere)
      (0L until 10L).map(i => (2L, 100L + i, Some(10L + i), s"k$i")) ++
      // delivery 3: v gains nulls (null_shift) and one out-of-envelope
      // value (range_escape); s collapses to ONE value (card_jump)
      // (v keeps 5 distinct non-null values — half of 10, NOT under
      // the strict 2x jump bar — so card_jump stays attributed to s)
      ((0L until 10L).map(i => (3L, 200L + i,
        if (i < 5) None else if (i == 9) Some(999L) else Some(15L + i),
        "const")))
    val df = rows.toDF("d", "id", "v", "s")
    val flags = Profile.profileDriftOf(df, col("d"))
      .filter(col("col_name") =!= "d")
      .select("delivery", "col_name", "null_shift", "range_escape",
        "card_jump")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    // delivery 1: no predecessor — all false
    Seq("id", "v", "s").foreach { c =>
      assert(flags((1L, c)) === ((false, false, false)), s"d1 $c") }
    // delivery 2: id's range escapes (100-109 vs 0-9); v, s quiet
    assert(flags((2L, "id")) === ((false, true, false)))
    assert(flags((2L, "v")) === ((false, false, false)))
    assert(flags((2L, "s")) === ((false, false, false)))
    // delivery 3: v = null_shift (0% -> 50%) + range_escape (999);
    // s = card_jump (10 -> 1); id keeps escaping
    assert(flags((3L, "v")) === ((true, true, false)))
    assert(flags((3L, "s"))._3 === true, "cardinality collapse missed")
    assert(flags((3L, "id")) === ((false, true, false)))
  }

  test("profile is ONE job over one scan (no per-column driver loop)") {
    val t = graft.core.Tables.load(spark, dir, "orders")
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    Profile.profileOf(t).collect()
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    // a per-column implementation would run ≥ one job per column (6+);
    // the single-agg plan runs a small constant count (AQE stages)
    assert(after - before <= 3, s"profile ran ${after - before} jobs")
  }
}
