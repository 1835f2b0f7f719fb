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
