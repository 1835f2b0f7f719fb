package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Native Catalyst expressions: exact-value checks against in-JVM math. */
class ExpressionsSpec extends SparkSuite {

  import spark.implicits._

  test("cosine_sim matches a direct computation; boundary cases null") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),   // identical → 1
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),   // orthogonal → 0
      (Array(1.0f, 2.0f), Array(2.0f, 4.0f)),   // parallel → 1
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f)),   // zero norm → null
      (Array(1.0f), Array(1.0f, 2.0f)))         // size mismatch → null
      .toDF("a", "b")
    val out = df.select(cosine_sim(col("a"), col("b"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out(0).exists(v => math.abs(v - 1.0) < 1e-9))
    assert(out(1).exists(v => math.abs(v) < 1e-9))
    assert(out(2).exists(v => math.abs(v - 1.0) < 1e-9))
    assert(out(3).isEmpty)
    assert(out(4).isEmpty)
  }

  test("dot_product over float and double arrays") {
    val f = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
      .select(dot_product(col("a"), col("b"))).as[Double].collect().head
    assert(math.abs(f - 32.0) < 1e-9)
    val d = Seq((Array(0.5, 0.5), Array(2.0, 2.0))).toDF("a", "b")
      .select(dot_product(col("a"), col("b"))).as[Double].collect().head
    assert(math.abs(d - 2.0) < 1e-9)
  }

  test("hyperplane_signature: deterministic in seed, bounded by nPlanes") {
    val df = Seq(
      Tuple1(Array(1.0f, -2.0f, 0.5f, 3.0f)),
      Tuple1(Array(-1.0f, 2.0f, -0.5f, -3.0f))).toDF("v")
    val s1 = df.select(hyperplane_signature(col("v"), 8, 7L))
      .as[Long].collect().toSeq
    val s2 = df.select(hyperplane_signature(col("v"), 8, 7L))
      .as[Long].collect().toSeq
    val s3 = df.select(hyperplane_signature(col("v"), 8, 8L))
      .as[Long].collect().toSeq
    assert(s1 === s2)                       // same seed → same buckets
    assert(s1 !== s3)                       // different table → different
    assert(s1.forall(s => s >= 0 && s < 256))
    // antipodal vectors land in complementary buckets
    assert((s1(0) ^ s1(1)) === 255L)
  }

  test("simhash64: identical token sets collide; disjoint sets differ") {
    val df = Seq(
      Tuple1(Seq("alpha", "beta", "gamma")),
      Tuple1(Seq("alpha", "beta", "gamma")),
      Tuple1(Seq("delta", "epsilon", "zeta", "eta", "theta")))
      .toDF("toks")
    val sigs = df.select(simhash64(col("toks"))).as[Long].collect()
    assert(sigs(0) === sigs(1))
    assert(sigs(0) !== sigs(2))
  }
}
