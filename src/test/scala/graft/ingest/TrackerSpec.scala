package graft.ingest

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSuite
import graft.core.Schemas.Status

/** A4/A9/A10: per-file counters + the exact 5-state status machine
  * (reference app/models.py:27-32, data_processor.py:126-141). */
class TrackerSpec extends SparkSuite {

  import spark.implicits._

  private def statusOf(total: Long, processed: Long, failed: Long): String =
    Seq((total, processed, failed)).toDF("t", "p", "f")
      .select(Tracker.deriveStatus(col("t"), col("p"), col("f")).as("s"))
      .as[String].collect().head

  test("status machine: every branch") {
    assert(statusOf(10, 4, 2) === Status.Processing)   // 6 < 10: in flight
    assert(statusOf(10, 10, 0) === Status.Processed)
    assert(statusOf(10, 8, 2) === Status.ProcessedWithErrors)
    assert(statusOf(10, 0, 10) === Status.ProcessedWithErrors)
    assert(statusOf(0, 0, 0) === Status.Processed)     // empty file
  }

  test("counters: total = processed + failed, failed = records without code") {
    val prepared = Seq(
      ("f1", "c1"), ("f1", "c2"), ("f1", null), ("f1", "  "),
      ("f2", "c9"))
      .toDF("file_id", "code")
    val rows = Tracker.counters(prepared).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows("f1") === ((4L, 2L, 2L)))  // null + blank code both fail
    assert(rows("f2") === ((1L, 1L, 0L)))
  }

  test("property: processed + failed = total for any record mix") {
    val gen = Gen.listOf(for {
      f <- Gen.oneOf("fa", "fb")
      c <- Gen.oneOf(Gen.const(null.asInstanceOf[String]),
        Gen.const(""), Gen.alphaNumStr.map(_.take(4)))
    } yield (f, c)).suchThat(_.nonEmpty)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10),
      Prop.forAll(gen) { recs =>
        Tracker.counters(recs.toDF("file_id", "code")).collect().forall(r =>
          r.getLong(1) == r.getLong(2) + r.getLong(3))
      })
    assert(res.passed, res.status.toString)
  }

  test("withStatus over a derivation where all files complete") {
    val counters = Seq(("f1", 3L, 3L, 0L), ("f2", 3L, 1L, 2L))
      .toDF("file_id", "total_records", "records_processed", "records_failed")
    val statuses = Tracker.withStatus(counters)
      .select("file_id", "status").as[(String, String)].collect().toMap
    assert(statuses === Map(
      "f1" -> Status.Processed, "f2" -> Status.ProcessedWithErrors))
  }
}
