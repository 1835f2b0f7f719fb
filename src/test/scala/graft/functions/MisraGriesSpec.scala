package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.{SparkSuite, TestSpark}
import graft.query.Sketches

/** The Misra–Gries guarantee, tested where it actually bites: random
  * adversarial streams, every partitioning (partial/merge paths), and
  * the driver key's exact-side derivation. The ONLY assertion on the
  * sketch is the order-free one — membership of items with
  * (k+1)·f > n — because survivor sets below that bar legitimately
  * depend on merge order. */
class MisraGriesSpec extends SparkSuite {

  import spark.implicits._

  private def checkProp(p: Prop, minSuccessful: Int = 10): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful), p)
    assert(res.passed, res.status.toString)
  }

  private def survivors(items: Seq[String], k: Int, parts: Int)
      : Set[String] =
    items.toDF("item").repartition(parts)
      .agg(heavy_hitters_sketch(col("item"), k).as("hh"))
      .first().getSeq[String](0).toSet

  test("guarantee on random streams at every partitioning: every item " +
      "with (k+1)*f > n survives") {
    val streamGen = for {
      nItems <- Gen.choose(2, 30)
      len <- Gen.choose(20, 400)
      // zipf-ish bias so heavy hitters actually occur
      items <- Gen.listOfN(len,
        Gen.frequency((8, Gen.choose(0, 2)), (2, Gen.choose(0, nItems - 1)))
          .map(i => s"w$i"))
    } yield items
    checkProp(Prop.forAll(streamGen, Gen.choose(1, 6), Gen.choose(1, 7)) {
      (items, k, parts) =>
        val freq = items.groupBy(identity).map { case (s, o) => s -> o.size }
        val heavy = freq.filter { case (_, f) =>
          (k + 1).toLong * f > items.size }.keySet
        val got = survivors(items, k, parts)
        val missed = heavy -- got
        if (missed.nonEmpty)
          println(s"MG MISSED $missed (k=$k parts=$parts n=${items.size})")
        missed.isEmpty && got.size <= k
    }, minSuccessful = 40)
  }

  test("sketch capacity is k even when the stream has more distinct items") {
    val items = (0 until 40).flatMap(i => Seq.fill(i + 1)(s"d$i"))
    (1 to 4).foreach { parts =>
      assert(survivors(items, 5, parts).size <= 5)
    }
  }

  test("driver key: exact heavy hitters of the ramp stream, all caught") {
    val out = Sketches.heavyHitters(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    // the z(64 div r) ramp: exactly z1 (32/64) and z2 (11/64) clear 9c>n
    assert(out.map(_._1).toSeq === Seq("z1", "z2"))
    assert(out.forall(_._3), s"sketch missed a true heavy hitter: $out")
    // z1 carries 32 of each doc's 64 items, z2 exactly 11 — the exact
    // counts must agree on the implied document count
    assert(out(0)._2 % 32 === 0L)
    assert(out(0)._2 / 32 === out(1)._2 / 11,
      "z1 and z2 counts must come from the same doc count")
  }
}
