package graft.query

import org.apache.spark.sql.functions._

import graft.{SparkSuite, TestSpark}
import graft.core.Tables

/** agg_approx_distinct has no SQL oracle (HLL internals are
  * engine-specific) — its correctness claim is an error bound, so
  * measure it against the exact count. */
class ApproxSpec extends SparkSuite {

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
