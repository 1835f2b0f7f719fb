package graft.query

import graft.SparkSuite

/** A11–A14 read-path semantics on hand-built tables. */
class FindersSpec extends SparkSuite {

  import spark.implicits._

  private val products = Seq(
    (1L, "Oat Milk"), (2L, "OAT bread"), (3L, "Dark Chocolate"),
    (4L, "oat milk")).toDF("code", "product_name")

  test("lookup: equality point read; empty result is the 404") {
    assert(Finders.lookupByKey(products, "code", 3L).count() === 1)
    assert(Finders.lookupByKey(products, "code", 99L).count() === 0)
  }

  test("partial search: case-insensitive substring, deterministic order, limited") {
    val hits = Finders.searchPartial(products, "product_name", "OaT",
      "code", limit = 2).select("code").as[Long].collect().toSeq
    assert(hits === Seq(1L, 2L))   // 3 matches, capped at 2, key-ordered
  }

  test("regex search interprets metacharacters; contains stays literal (A12 parity)") {
    val rows = Seq((1L, "blue bolt"), (2L, "red belt"), (3L, "b.lt plate"),
      (4L, "gear")).toDF("code", "product_name")
    // reference semantics: '.' is a wildcard, case-insensitive, unanchored
    val regexHits = Finders.searchRegex(rows, "product_name", "B.LT",
      "code").select("code").as[Long].collect().toSeq
    assert(regexHits === Seq(1L, 2L, 3L))
    // the default literal form: 'b.lt' means the three characters b.lt
    val literalHits = Finders.searchPartial(rows, "product_name", "b.lt",
      "code").select("code").as[Long].collect().toSeq
    assert(literalHits === Seq(3L))
  }

  test("exact search: case-sensitive equality, NO limit (reference code behavior)") {
    val hits = Finders.searchExact(products, "product_name", "Oat Milk",
      "code").select("code").as[Long].collect().toSeq
    assert(hits === Seq(1L))       // 'oat milk' ≠ 'Oat Milk'
  }

  test("status lookup projects the reference's status-endpoint fields") {
    val control = Seq(
      ("f1", "x", 10L, 9L, 1L, "processed_with_errors"))
      .toDF("file_id", "other", "total_records", "records_processed",
        "records_failed", "status")
    val out = Finders.statusLookup(control, "f1")
    assert(out.columns.toSeq === Seq("file_id", "status", "total_records",
      "records_processed", "records_failed"))
    assert(out.count() === 1)
    assert(Finders.statusLookup(control, "nope").count() === 0)
  }
}
