package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSuite

/** A8 upsert semantics (SURVEY.md §5.2/§5.3): last-writer-wins,
  * field-level `$set` retention (reference data_processor.py:103-110),
  * idempotence under replay (the at-least-once argument of mq.py:180-181
  * depends on it) and batching invariance (file_splitter.py:119-128
  * batch boundaries are arbitrary). */
class UpsertSpec extends SparkSuite {

  import spark.implicits._

  /** Run a ScalaCheck property (scalatestplus bridge not in the offline
    * cache, so drive ScalaCheck directly). */
  private def checkProp(p: Prop, minSuccessful: Int = 10): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful), p)
    assert(res.passed, res.status.toString)
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("merge: last writer wins on key collision, by version then delta-over-snapshot") {
    val snap = Seq(("a", "old-a", 1L), ("b", "old-b", 1L))
      .toDF("code", "name", "v")
    val delta = Seq(("a", "new-a", 2L), ("c", "new-c", 2L))
      .toDF("code", "name", "v")
    val out = Upsert.merge(snap, delta, "code", version = Seq(col("v")))
      .select("code", "name").as[(String, String)].collect().toMap
    assert(out === Map("a" -> "new-a", "b" -> "old-b", "c" -> "new-c"))
  }

  test("merge: within-delta duplicate keys resolve by version regardless of partitioning") {
    val delta = Seq(("a", "v1", 1L), ("a", "v2", 2L), ("a", "v3", 3L))
      .toDF("code", "name", "v").repartition(3)
    val snap = Seq.empty[(String, String, Long)].toDF("code", "name", "v")
    val out = Upsert.merge(snap, delta, "code", version = Seq(col("v")))
    assert(out.select("name").as[String].collect().toSeq === Seq("v3"))
  }

  test("mergeFields: a field absent from the delta record survives from the snapshot ($set parity)") {
    val snap = Seq(("a", "Oat Milk", "Acme", 1L))
      .toDF("code", "name", "brand", "v")
    val delta = Seq(("a", "Oat Milk Deluxe", null.asInstanceOf[String], 2L))
      .toDF("code", "name", "brand", "v")
    val out = Upsert.mergeFields(snap, delta, "code",
      version = Seq(col("v")), mergeWholly = Set.empty)
      .select("name", "brand").as[(String, String)].collect()
    assert(out.toSeq === Seq(("Oat Milk Deluxe", "Acme")))
  }

  test("mergeFields: extras maps merge key-wise, delta keys win, old keys survive") {
    val snap = Seq(("a", Map("brands" -> "Acme", "qty" -> "1")))
      .toDF("code", "extras")
    val delta = Seq(("a", Map("qty" -> "2", "origin" -> "ES")))
      .toDF("code", "extras")
    val out = Upsert.mergeFields(snap, delta, "code",
      mergeWholly = Set.empty)
      .select("extras").as[Map[String, String]].collect().head
    assert(out === Map("brands" -> "Acme", "qty" -> "2", "origin" -> "ES"))
  }

  test("mergeFields: two same-key records in ONE batch compose field-level in version order") {
    val snap = Seq.empty[(String, String, String, Long)]
      .toDF("code", "name", "brand", "v")
    val delta = Seq(
      ("a", "First", "KeepMe", 1L),
      ("a", "Second", null.asInstanceOf[String], 2L))
      .toDF("code", "name", "brand", "v")
    val out = Upsert.mergeFields(snap, delta, "code",
      version = Seq(col("v")), mergeWholly = Set.empty)
      .select("name", "brand").as[(String, String)].collect()
    // name from the later record, brand retained from the earlier one
    assert(out.toSeq === Seq(("Second", "KeepMe")))
  }

  test("mergeFields: snapshot-only and delta-only keys pass through") {
    val snap = Seq(("s", "snap-only", 1L)).toDF("code", "name", "v")
    val delta = Seq(("d", "delta-only", 2L)).toDF("code", "name", "v")
    val out = Upsert.mergeFields(snap, delta, "code",
        version = Seq(col("v")), mergeWholly = Set.empty)
      .select("code", "name").as[(String, String)].collect().toMap
    assert(out === Map("s" -> "snap-only", "d" -> "delta-only"))
  }

  // --- properties -------------------------------------------------------

  private val recordsGen: Gen[List[(String, String, Long)]] = for {
    n <- Gen.choose(1, 24)
    recs <- Gen.listOfN(n, for {
      key <- Gen.oneOf("k1", "k2", "k3", "k4")
      value <- Gen.alphaNumStr.map(_.take(6))
    } yield (key, value))
  } yield recs.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }

  test("property: upsert is idempotent — replaying the same delta changes nothing") {
    checkProp(Prop.forAll(recordsGen) { recs =>
      val delta = recs.toDF("code", "name", "v")
      val snap = Seq(("k1", "base", -1L)).toDF("code", "name", "v")
      val once = Upsert.mergeFields(snap, delta, "code",
        version = Seq(col("v")), mergeWholly = Set.empty)
      val twice = Upsert.mergeFields(once, delta, "code",
        version = Seq(col("v")), mergeWholly = Set.empty)
      sortedRows(once) == sortedRows(twice)
    })
  }

  test("property: batching invariance — any split of the delta, applied in order, equals one-shot") {
    checkProp(Prop.forAll(recordsGen, Gen.choose(1, 5)) { (recs, nChunks) =>
      val snap = Seq(("k2", "base", -1L)).toDF("code", "name", "v")
      val oneShot = Upsert.mergeFields(snap, recs.toDF("code", "name", "v"),
        "code", version = Seq(col("v")), mergeWholly = Set.empty)
      val chunkSize = math.max(1, recs.size / nChunks)
      val chunked = recs.grouped(chunkSize).foldLeft(snap) { (acc, chunk) =>
        Upsert.mergeFields(acc, chunk.toDF("code", "name", "v"), "code",
          version = Seq(col("v")), mergeWholly = Set.empty)
      }
      sortedRows(oneShot) == sortedRows(chunked)
    })
  }

  test("property: after merge the key is unique") {
    checkProp(Prop.forAll(recordsGen) { recs =>
      val delta = recs.toDF("code", "name", "v")
      val snap = Seq(("k1", "base", -1L), ("k9", "only", -1L))
        .toDF("code", "name", "v")
      val out = Upsert.merge(snap, delta, "code", version = Seq(col("v")))
      out.count() == out.select("code").distinct().count()
    })
  }
}
