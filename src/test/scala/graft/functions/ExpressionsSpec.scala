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

  test("lane_sums: single pass equals per-lane reference; UTF-8 byte based") {
    val texts = Seq("hello world", "", "a", "abcdefghij" * 7)
    val out = texts.toDF("text")
      .select(col("text"), lane_sums(col("text"), 8),
        lane_sums(col("text"), 4, 2))
      .collect().map(r => r.getString(0) ->
        ((r.getSeq[Long](1), r.getSeq[Long](2)))).toMap
    texts.foreach { t =>
      val bytes = t.getBytes("UTF-8")
      def ref(nLanes: Int, group: Int): Seq[Long] = {
        val s = new Array[Long](nLanes)
        bytes.zipWithIndex.foreach { case (b, i) =>
          s((i % (nLanes * group)) / group) += (b & 0xFF).toLong }
        s.toSeq
      }
      assert(out(t)._1 === ref(8, 1), s"lanes(8) for '$t'")
      assert(out(t)._2 === ref(4, 2), s"lanes(4,2) for '$t'")
    }
    // byte-based (like the codec), not char-based: é is 2 UTF-8 bytes
    val acc = Seq("é").toDF("text")
      .select(lane_sums(col("text"), 8)).collect().head.getSeq[Long](0)
    assert(acc.sum === "é".getBytes("UTF-8").map(_ & 0xFF).map(_.toLong).sum)
    assert(acc.count(_ != 0L) === 2)
  }

  test("property: lane_sums equals the composed filter+aggregate specification") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // the naive per-lane column-algebra form the native expression
    // replaced — random ASCII strings, both lane geometries
    val gen = Gen.listOfN(12,
      Gen.chooseNum(0x20, 0x7e).map(_.toChar)).map(_.mkString)
    val p = Prop.forAll(Gen.listOfN(5, gen)) { texts =>
      val df = texts.toDF("text")
      def spec(nLanes: Int, group: Int) = df.select(expr(
        s"""transform(sequence(0, ${nLanes - 1}), j ->
           aggregate(filter(sequence(1, length(text)), p -> ((p - 1) % ${nLanes * group}) div $group = j),
             0L, (acc, p) -> acc + ascii(substring(text, p, 1))))""")
        .as("l")).collect().map(_.getSeq[Long](0)).toSeq
      def native(nLanes: Int, group: Int) = df
        .select(lane_sums(col("text"), nLanes, group).as("l"))
        .collect().map(_.getSeq[Long](0)).toSeq
      native(8, 1) == spec(8, 1) && native(4, 2) == spec(4, 2)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(res.passed, res.status.toString)
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
