package graft.query

import org.apache.spark.sql.functions._

import graft.{SparkSuite, TestSpark}

/** Adaptive skew salting: detection fires only on genuinely hot keys,
  * salting never changes the join result, and uniform data pays no
  * build-side replication. */
class SkewSpec extends SparkSuite {

  import spark.implicits._

  test("uniform fixture: no hot keys detected, result equals the plain join") {
    val li = graft.core.Tables.load(spark, TestSpark.sfDir, "lineitem")
    assert(Relational.detectHotKeys(li, "l_orderkey", 1000000L).count()
      === 0L, "uniform data must not trigger salting")
  }

  test("synthetic skew: only the hot key salts; result matches plain join") {
    val probe = ((1 to 3000).map(i => (1L, i.toLong)) ++
      (2L to 50L).flatMap(k => (1 to 3).map(i => (k, i.toLong))))
      .toDF("k", "seq")
    val build = (1L to 60L).map(k => (k, s"v$k")).toDF("bk", "payload")

    val hot = Relational.detectHotKeys(probe, "k", hotThreshold = 1000L)
    val hotKeys = hot.select("__hot_key").as[Long].collect().toSet
    assert(hotKeys === Set(1L), s"expected only key 1 hot, got $hotKeys")

    val salted = Relational.skewSaltedJoin(probe, "k", col("seq"),
        build, "bk", salt = 8, hot)
      .select("k", "seq", "payload")
      .collect().map(_.toString).sorted.toSeq
    val plain = probe.join(build, probe("k") === build("bk"))
      .select("k", "seq", "payload")
      .collect().map(_.toString).sorted.toSeq
    assert(salted === plain)
  }

  test("salting balances reducer partitions under a hot key (not a timing test)") {
    // the operator's actual claim, asserted deterministically: the hot
    // key's rows spread over the salt space instead of landing on one
    // reducer. AQE off so its own skew mitigation can't mask ours.
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "8")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val probe = ((1 to 8000).map(i => (1L, i.toLong)) ++
        (2L to 17L).flatMap(k => (1 to 50).map(i => (k, i.toLong))))
        .toDF("k", "seq")
      val build = (1L to 20L).map(k => (k, s"v$k")).toDF("bk", "payload")
      val hot = Relational.detectHotKeys(probe, "k", hotThreshold = 1000L)

      def maxPartRows(df: org.apache.spark.sql.DataFrame): Long =
        df.rdd.mapPartitions(it => Iterator(it.size.toLong))
          .collect().max

      val saltedMax = maxPartRows(Relational.skewSaltedJoin(
        probe, "k", col("seq"), build, "bk", salt = 8, hot))
      val plainMax = maxPartRows(
        probe.join(build, probe("k") === build("bk")))
      info(s"max reducer rows: salted=$saltedMax plain=$plainMax")
      assert(plainMax >= 8000L, "hot key must swamp one plain reducer")
      assert(saltedMax < plainMax / 2,
        s"salting must split the hot reducer ($saltedMax vs $plainMax)")
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("empty hot set degenerates to the plain join (salt column constant 0)") {
    val probe = Seq((1L, 10L), (2L, 20L)).toDF("k", "seq")
    val build = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("bk", "payload")
    val noHot = Seq.empty[Long].toDF("__hot_key")
    val out = Relational.skewSaltedJoin(probe, "k", col("seq"),
      build, "bk", salt = 8, noHot)
    assert(out.count() === 2L)
    // no replication: the build side stays at one row per key
    val buildT = build
      .join(broadcast(noHot), build("bk") === noHot("__hot_key"), "left")
      .withColumn("__salt", explode(sequence(lit(0),
        when(col("__hot_key").isNotNull, lit(7)).otherwise(lit(0)))))
    assert(buildT.count() === 3L, "uniform build side must not replicate")
  }
}
