package graft.query

import org.apache.spark.sql.functions._

import graft.{SparkSuite, TestSpark}

/** Count-Min bounds via Spark's built-in mergeable count_min_sketch
  * aggregate (agg_countmin_bound). The properties tested are the ones
  * the driver key asserts in-engine: est ≥ exact for EVERY item
  * (deterministic — counters only increase, under any partitioning /
  * merge tree), and est ≤ exact + ⌈eps·n⌉ on the fixture. A hashing
  * mismatch between the aggregate's update path and the driver-side
  * probe (UTF8String vs String bytes) would break the ≥ side — this
  * suite is the guard. */
class CountMinSpec extends SparkSuite {

  import spark.implicits._

  private def sketchOf(items: Seq[String], parts: Int, eps: Double = 0.001)
      : org.apache.spark.util.sketch.CountMinSketch = {
    val bytes = items.toDF("item").repartition(parts)
      .agg(count_min_sketch(col("item"), lit(eps), lit(0.99), lit(7))
        .as("cm")).first().getAs[Array[Byte]](0)
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
  }

  test("overcount-only under every partitioning (merge = matrix add)") {
    val items = (1 to 400).map(i => s"w${i % 23}")
    for (parts <- Seq(1, 3, 32)) {
      val cm = sketchOf(items, parts)
      val exact = items.groupBy(identity).view.mapValues(_.size).toMap
      exact.foreach { case (it, c) =>
        assert(cm.estimateCount(it) >= c.toLong,
          s"parts=$parts item=$it est < exact — probe/update hash mismatch?")
      }
      assert(cm.totalCount() === items.size.toLong)
    }
  }

  test("merge across partitions equals the single-partition sketch") {
    val items = (1 to 300).map(i => s"k${i % 11}")
    val a = sketchOf(items, 1)
    val b = sketchOf(items, 32)
    val probes = items.distinct :+ "never-seen"
    probes.foreach(p =>
      assert(a.estimateCount(p) === b.estimateCount(p),
        s"estimate for $p depends on partitioning"))
  }

  test("driver key: exact counts with both bounds TRUE, totally ordered") {
    val out = Sketches.countMinBound(spark, TestSpark.sfDir).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getString(0)).toSeq === out.map(_.getString(0))
      .toSeq.sorted, "not ordered by item")
    out.foreach { r =>
      assert(r.getBoolean(2), s"item ${r.getString(0)}: est < exact")
      assert(r.getBoolean(3), s"item ${r.getString(0)}: est above eps bound")
    }
    // the fixed stream has 15 distinct items (z1..z64 div-ramp)
    assert(out.length === 15)
  }

  test("scale audit: the probe runs executor-side, no data-grain collect") {
    val df = Sketches.countMinBound(spark, TestSpark.sfDir)
    // the plan must carry the deserialize→mapPartitions→serialize seam
    // (the broadcast-sketch probe); a driver-side probe would show a
    // LocalTableScan of pre-computed estimates instead
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("MapPartitions"),
      s"probe not distributed:\n$plan")
    assert(!plan.contains("LocalTableScan"),
      "driver-materialized estimates crept back into the probe path")
    // code audit (r14 verdict task 2's 'no data-grain collect'): the
    // only collect-class calls in countMinBound must be the two
    // model-scalar first() calls (sketch bytes, slack) — never a
    // collect over per-item rows
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        "src/main/scala/graft/query/Sketches.scala")))
    val body = src.substring(src.indexOf("def countMinBound"),
      src.indexOf("def hllUnionBound"))
    assert(!body.contains(".collect()"),
      "data-grain collect reintroduced in countMinBound")
    assert(body.split("\\.first\\(\\)").length - 1 <= 1,
      "more than the one model-scalar first() in countMinBound")
  }
}
