package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSuite

/** The bounded-heap aggregate must agree with the window form on every
  * partitioning (partial/merge paths exercised) and break score ties by
  * lowest id. */
class TopKSpec extends SparkSuite {

  import spark.implicits._

  test("ties broken by lowest id; k bounds the group") {
    val df = Seq(
      ("g", 5.0, 10L), ("g", 5.0, 3L), ("g", 5.0, 7L), ("g", 1.0, 1L),
      ("h", 2.0, 2L))
      .toDF("k", "score", "id")
    val out = df.groupBy("k")
      .agg(top_k(col("score"), col("id"), 2).as("top"))
      .select(col("k"), col("top").cast("string").as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("g") === "[{5.0, 3}, {5.0, 7}]")
    assert(out("h") === "[{2.0, 2}]")
  }

  test("non-castable score type fails at analysis, not per-row at run") {
    val df = Seq(("g", Seq(1.0), 1L)).toDF("k", "s", "id")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("k").agg(top_k(col("s"), col("id"), 2)).collect()
    }
  }

  test("property: equals the sort-based reference on any partitioning") {
    val gen = for {
      n <- Gen.choose(0, 60)
      rows <- Gen.listOfN(n, for {
        g <- Gen.choose(1, 4)
        s <- Gen.choose(0, 9).map(_.toDouble)
        i <- Gen.choose(1L, 500L)
      } yield (g, s, i))
      parts <- Gen.choose(1, 7)
      k <- Gen.choose(1, 5)
    } yield (rows, parts, k)
    val prop = Prop.forAll(gen) { case (rows, parts, k) =>
      val df = rows.toDF("g", "score", "id").repartition(parts)
      val got = df.groupBy("g")
        .agg(top_k(col("score"), col("id"), k).as("top"))
        .select(col("g"), explode(col("top")).as("p"))
        .select(col("g"), col("p.score"), col("p.id"))
        .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
      // reference: sort by (-score, id), take k — duplicates preserved
      val ref = rows.groupBy(_._1).view.mapValues(
        _.map(t => (t._2, t._3)).sortBy(p => (-p._1, p._2)).take(k)).toMap
      ref.forall { case (g, exp) => got.getOrElse(g, Nil) == exp } &&
        got.keySet == ref.keySet
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }
}
