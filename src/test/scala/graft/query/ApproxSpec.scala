package graft.query

import org.apache.spark.sql.functions._

import graft.{SparkSuite, TestSpark}
import graft.core.Tables

/** Error-bound checks for the lossy operators: the approximate
  * distinct sketch and int8 quantization make accuracy claims — measure
  * them instead of trusting them. */
class ApproxSpec extends SparkSuite {

  test("int8 quantization: operator output matches an independent " +
      "reference, and reconstruction stays within one step") {
    val dir = TestSpark.sfDir
    // the OPERATOR's digests — this test must fail if embedQuantize
    // changes, so its output is compared against a driver-side
    // reimplementation of the affine code, per vector
    val got = TextSim.embedQuantize(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      val v = r.getSeq[Float](1).map(_.toDouble)
      val (lo, hi) = (v.min, v.max)
      val step = (hi - lo) / 256.0
      val qs = v.map { x =>
        val q = math.min(255L,
          math.floor((x - lo) / (hi - lo) * 256).toLong)
        val reconstructed = lo + (q + 0.5) * step
        assert(math.abs(reconstructed - x) <= step / 2 + 1e-9,
          s"vec $id: |${reconstructed - x}| > step/2=$step")
        q
      }
      assert(got(id) === md5hex(qs.mkString(" ")),
        s"vec $id: operator digest != reference digest")
    }
  }

  test("approx percentile lands within the neighboring exact quantiles") {
    val dir = TestSpark.sfDir
    val approx = Relational.aggPercentileApprox(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    // GK-sketch guarantee is on RANK error (±1/accuracy); with
    // accuracy=10000 and fixture groups ≪ 10000 rows the rank error is
    // <1 — but assert the robust envelope (value between the exact p±5
    // quantiles) so the test survives larger fixtures
    val exact = Tables.load(spark, dir, "events")
      .groupBy("event_type")
      .agg(expr("percentile(value, array(0.45D, 0.55D, 0.85D, 0.95D))")
        .as("q"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[Double](1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, Seq(lo50, hi50, lo90, hi90)) =>
      val (p50, p90) = approx(k)
      info(f"$k: p50=$p50%.3f in [$lo50%.3f,$hi50%.3f] " +
        f"p90=$p90%.3f in [$lo90%.3f,$hi90%.3f]")
      assert(p50 >= lo50 && p50 <= hi50,
        s"group $k p50 $p50 outside [$lo50, $hi50]")
      assert(p90 >= lo90 && p90 <= hi90,
        s"group $k p90 $p90 outside [$lo90, $hi90]")
    }
  }

  test("approx distinct within 5% of exact per group") {
    val dir = TestSpark.sfDir
    val approx = Relational.aggApproxDistinct(spark, dir)
      .select("o_orderpriority", "n_customers_approx")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.load(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      val err = math.abs(a - n).toDouble / n
      info(f"$k: exact=$n approx=$a err=$err%.4f")
      assert(err <= 0.05, s"group $k error $err exceeds 5%%")
    }
  }
}
