package graft.query

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSuite

/** As-of join semantics on a hand-built fixture: inclusive <=, per-key
  * isolation, null when nothing precedes, and partition-layout
  * independence. */
class TemporalSpec extends SparkSuite {

  import spark.implicits._

  private def t(s: Int) = new Timestamp(s * 1000L)

  test("asof: latest right row at-or-before each left row, per key") {
    val left = Seq(
      (1L, 100L, t(10)), (1L, 101L, t(20)), (1L, 102L, t(5)),
      (2L, 200L, t(15)))
      .toDF("k", "id", "ts")
    val right = Seq(
      (1L, t(10), "a"), (1L, t(18), "b"), (2L, t(99), "zzz"))
      .toDF("k", "ts", "v")
    val out = Temporal.asofJoin(left.repartition(5), right.repartition(3),
        "k", "ts", payload = struct(col("v")))
      .select(col("id"), col("__graft_asof_payload.v").as("v"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(out === Map(
      100L -> "a",   // equal ts matches (inclusive)
      101L -> "b",   // latest of the two priors
      102L -> null,  // nothing at or before t=5
      200L -> null)) // other key's rows invisible
  }

  test("asof query agrees with an in-memory reference computation") {
    val dir = graft.TestSpark.sfDir
    val events = graft.core.Tables.load(spark, dir, "events")
      .select("user_id", "event_id", "event_type", "ts", "value").collect()
    def ts(r: org.apache.spark.sql.Row) =
      r.getAs[java.time.LocalDateTime](3)   // events.ts is TIMESTAMP_NTZ
    val views = events.filter(_.getString(2) == "view")
      .groupBy(r => (r.getLong(0), ts(r)))
      .map { case ((u, t), rs) => (u, t, rs.map(_.getDouble(4)).max) }
      .toSeq
    val expected = events.filter(_.getString(2) == "purchase").map { p =>
      val prior = views.filter(v =>
        v._1 == p.getLong(0) && !v._2.isAfter(ts(p)))
      p.getLong(1) -> (if (prior.isEmpty) None
        else Some(prior.maxBy(_._2)(Ordering.by((x: java.time.LocalDateTime)
          => x.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L +
            x.getNano))._3))
    }.toMap
    val actual = Temporal.purchaseAsofView(spark, dir)
      .select("event_id", "view_value").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(actual === expected)
  }

  test("interval join (time-bucketed) equals the naive BETWEEN join") {
    val dir = graft.TestSpark.sfDir
    val events = graft.core.Tables.load(spark, dir, "events")
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("value").as("purchase_value"))
    val v = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("value").as("view_value"))
    // naive formulation: equi-join on user + BETWEEN filter (the shape
    // the bucketed operator must reproduce exactly)
    val naive = p.join(v,
        p("user_id") === v("v_user") &&
          col("view_ts") > col("ts") - expr("INTERVAL 30 MINUTES") &&
          col("view_ts") <= col("ts"), "left")
      .groupBy("user_id", "event_id", "ts", "purchase_value")
      .agg(count(col("view_ts")).as("n_prior_views"),
        max(graft.core.Tables.dec2(col("view_value"))).cast("double")
          .as("max_view_value"))
      .orderBy("user_id", "event_id")
      .select("user_id", "event_id", "ts", "purchase_value",
        "n_prior_views", "max_view_value")
    val bucketed = Temporal.intervalJoin(spark, dir)
    assert(bucketed.collect().toSeq === naive.collect().toSeq)
    assert(bucketed.count() > 0)
  }

  test("property: 2-bucket probe covers every (t-w, t] range exactly") {
    import spark.implicits._
    // random event times (second granularity, incl. exact boundary
    // collisions) and window widths; reference = in-memory filter
    val fixtureGen = for {
      w <- Gen.oneOf(1, 5, 30) // minutes
      nP <- Gen.choose(1, 8)
      nV <- Gen.choose(0, 12)
      // cluster times around multiples of the window so bucket edges
      // (t - w exactly, t exactly, same bucket, adjacent, far) all occur
      ps <- Gen.listOfN(nP, Gen.choose(0, 6 * w * 60))
      vs <- Gen.listOfN(nV, Gen.choose(0, 6 * w * 60))
    } yield (w, ps, vs)
    val prop = Prop.forAll(fixtureGen) { case (w, ps, vs) =>
      val p = ps.zipWithIndex
        .map { case (s, i) => (1L, i.toLong, t(s), 1.0) }
        .toDF("user_id", "event_id", "ts", "purchase_value")
      val v = vs.map(s => (1L, t(s), 2.0))
        .toDF("v_user", "view_ts", "view_value")
      val out = Temporal.intervalJoinBucketed(p, v, w)
        .select("event_id", "n_prior_views")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = ps.zipWithIndex.map { case (s, i) =>
        i.toLong -> vs.count(x => x > s - w * 60 && x <= s).toLong
      }.toMap
      out == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("forward asof: earliest right row at-or-after each left row") {
    val left = Seq(
      (1L, 100L, t(10)), (1L, 101L, t(20)), (1L, 102L, t(50)),
      (2L, 200L, t(15)))
      .toDF("k", "id", "ts")
    val right = Seq(
      (1L, t(10), "a"), (1L, t(18), "b"), (2L, t(5), "zzz"))
      .toDF("k", "ts", "v")
    val out = Temporal.asofJoinForward(left.repartition(5),
        right.repartition(3), "k", "ts", payload = struct(col("v")))
      .select(col("id"), col("__graft_asof_payload.v").as("v"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(out === Map(
      100L -> "a",   // equal ts matches (inclusive)
      101L -> null,  // key 1's latest view (t=18) precedes t=20
      102L -> null,  // nothing at or after t=50
      200L -> null)) // key 2's only view precedes t=15
  }

  test("tolerance asof: stale matches are nulled, fresh ones kept, " +
      "row set identical to the unguarded key") {
    val dir = graft.TestSpark.sfDir
    val base = Temporal.purchaseAsofView(spark, dir)
      .select("event_id", "ts", "view_ts", "view_value").collect()
      .map(r => r.getLong(0) -> r).toMap
    val tol = Temporal.purchaseAsofViewTolerance(spark, dir, 60)
      .select("event_id", "view_ts", "view_value").collect()
    assert(tol.length === base.size)
    tol.foreach { r =>
      val b = base(r.getLong(0))
      val fresh = !b.isNullAt(2) && {
        val gapUs = java.time.Duration.between(
          b.getAs[java.time.LocalDateTime](2),
          b.getAs[java.time.LocalDateTime](1)).toNanos / 1000L
        gapUs <= 60L * 60L * 1000000L
      }
      if (fresh) {
        assert(!r.isNullAt(1) && r.getAs[java.time.LocalDateTime](1) ==
          b.getAs[java.time.LocalDateTime](2), s"event ${r.getLong(0)}")
        assert(r.getDouble(2) === b.getDouble(3))
      } else {
        assert(r.isNullAt(1) && r.isNullAt(2),
          s"event ${r.getLong(0)}: stale match survived")
      }
    }
  }
}
