package graft.query

import org.apache.spark.sql.functions._

import graft.{SparkSuite, TestSpark}
import graft.core.Tables

/** Error-bound checks for the lossy operators: the approximate
  * distinct sketch and int8 quantization make accuracy claims — measure
  * them instead of trusting them. */
class ApproxSpec extends SparkSuite {

  test("int8 quantization reconstructs within one step (hi-lo)/256") {
    val dir = TestSpark.sfDir
    val rows = Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1).map(_.toDouble)
      val (lo, hi) = (v.min, v.max)
      val step = (hi - lo) / 256.0
      v.foreach { x =>
        // the operator's affine code: floor((x-lo)/(hi-lo)*256) capped
        val q = math.min(255L,
          math.floor((x - lo) / (hi - lo) * 256).toLong)
        val reconstructed = lo + (q + 0.5) * step
        assert(math.abs(reconstructed - x) <= step / 2 + 1e-9,
          s"vec ${r.getLong(0)}: |${reconstructed - x}| > step/2=$step")
      }
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
