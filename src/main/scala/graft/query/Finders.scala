package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Read-path query surface (SURVEY.md §2 A11–A14, exercised as B13 over
  * `part.p_name` standing in for the reference's `product_name`).
  *
  * The reference's four HTTP lookups (app/api/main.py:106-184) become
  * DataFrame predicates: equality point lookup (parquet min-max +
  * dictionary pushdown does the index's job), case-insensitive substring
  * scan, exact match. The reference's partial search uses an UNSORTED
  * limit(20) (main.py:162) — nondeterministic, so the engine version adds
  * a total order by key before the limit (SURVEY.md §5.1).
  */
object Finders {

  /** A11: point lookup by key. */
  def lookupByKey(df: DataFrame, keyCol: String, key: Long): DataFrame =
    df.filter(col(keyCol) === key)

  /** A12: case-insensitive substring search, deterministic top-20. */
  def searchPartial(df: DataFrame, nameCol: String, term: String,
      orderCol: String, limit: Int = 20): DataFrame =
    df.filter(lower(col(nameCol)).contains(term.toLowerCase))
      .orderBy(orderCol).limit(limit)

  /** A12 regex parity: the reference builds an UNANCHORED case-insensitive
    * regex around the raw term — `{"$regex": ".*term.*", "$options": "i"}`
    * (app/api/main.py:157-160) — so regex metacharacters in the term are
    * INTERPRETED (`b.lt` matches bolt AND belt). [[searchPartial]] keeps
    * the literal-contains default (what most callers mean); this form
    * reproduces the reference's interpreted semantics for users porting
    * wildcard search terms. */
  def searchRegex(df: DataFrame, nameCol: String, term: String,
      orderCol: String, limit: Int = 20): DataFrame =
    df.filter(col(nameCol).rlike("(?i).*" + term + ".*"))
      .orderBy(orderCol).limit(limit)

  /** A13: exact-match search (reference has no limit here —
    * main.py:177 docstring vs :180 code; we keep the code's behavior). */
  def searchExact(df: DataFrame, nameCol: String, term: String,
      orderCol: String): DataFrame =
    df.filter(col(nameCol) === term).orderBy(orderCol)

  /** A14: control-record point read — the upload-status endpoint
    * (reference app/api/main.py:106-127): one `uploaded_files` row by
    * file_id, 6-field projection; empty result = the endpoint's 404. */
  def statusLookup(control: DataFrame, fileId: String): DataFrame =
    control.filter(col("file_id") === fileId)
      .select("file_id", "status", "total_records", "records_processed",
        "records_failed")

  // --- testdata-bound forms (the oracle-checked B13 queries) ---

  def lookupCode(spark: SparkSession, dir: String): DataFrame =
    lookupByKey(Tables.load(spark, dir, "part"), "p_partkey", 42L)
      .orderBy("p_partkey")

  def searchPartialPart(spark: SparkSession, dir: String): DataFrame =
    searchPartial(Tables.load(spark, dir, "part"), "p_name", "Bolt",
      "p_partkey")

  def searchExactPart(spark: SparkSession, dir: String): DataFrame =
    searchExact(Tables.load(spark, dir, "part"), "p_name", "red widget",
      "p_partkey")

  /** `b.lt` is deliberately metacharacter-bearing: the regex form matches
    * bolt/belt while literal contains matches nothing (FindersSpec). */
  def searchRegexPart(spark: SparkSession, dir: String): DataFrame =
    searchRegex(Tables.load(spark, dir, "part"), "p_name", "b.lt",
      "p_partkey")
}
