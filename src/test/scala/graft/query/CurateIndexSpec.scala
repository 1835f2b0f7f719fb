package graft.query

import org.apache.spark.sql.functions._

import graft.{SparkSuite, TestSpark}

/** The curate chain's pair stage served from the PERSISTED minhash
  * index ([[MinhashIndex.starPairsFromIndex]]): postings/buckets are
  * per-doc rows, so semi-filtering the stored tables to any survivor
  * set must yield bit-identical pairs to re-deriving them from the
  * survivors' text — the guarantee that lets curate_full/curate_scrub
  * read the maintained index instead of re-shingling the corpus. */
class CurateIndexSpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("index-served pairs == recomputed pairs on the canonical " +
      "survivor set") {
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("canon_md5").orderBy(col("doc_id").asc)
    val canon = docs
      .withColumn("canon_md5", TextSim.canonicalMd5(col("text")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("canon_md5", "rn")
    val recomputed = pairSet(
      TextSim.dedupMinhashStarOf(canon, threshold = 0.8))
    val served = pairSet(MinhashIndex.starPairsFromIndex(
      spark, dir, canon.select("doc_id"), threshold = 0.8))
    assert(served === recomputed,
      "index-served pair stage diverges from the recompute")
    assert(served.nonEmpty, "vacuous: no near-dup pairs on fixture")
  }

  test("an arbitrary (non-canonical) survivor subset serves " +
      "identically too") {
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 3 =!= 1)
    val recomputed = pairSet(
      TextSim.dedupMinhashStarOf(docs, threshold = 0.8))
    val served = pairSet(MinhashIndex.starPairsFromIndex(
      spark, dir, docs.select("doc_id"), threshold = 0.8))
    assert(served === recomputed)
  }
}
