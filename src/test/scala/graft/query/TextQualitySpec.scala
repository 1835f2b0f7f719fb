package graft.query

import org.apache.spark.sql.functions._

import graft.{SparkSuite, TestSpark}

/** Unit checks for the curation operators (TF-IDF, quality filter, PII
  * redaction) beyond the DuckDB hash-compare: internal consistency
  * properties that would survive an oracle-side copy of the same bug. */
class TextQualitySpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  test("tfidf: scores non-increasing in rank, at most 5 per doc") {
    val rows = TextQuality.textTfidf(spark, dir)
      .select("doc_id", "rank", "tfidf")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byDoc = rows.groupBy(_._1)
    byDoc.foreach { case (doc, rs) =>
      val ordered = rs.sortBy(_._2).map(_._3)
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b },
        s"doc $doc tfidf not non-increasing in rank")
    }
    assert(byDoc.forall(_._2.length <= 5))
  }

  test("tfidf: a corpus-ubiquitous term scores ~0") {
    // df == N ⇒ ln(N/df) = 0 regardless of tf
    val n = graft.core.Tables.load(spark, dir, "documents").count()
    val ubiquitous = TextQuality.textTfidf(spark, dir)
      .filter(col("df") === n)
    ubiquitous.select("tfidf").collect()
      .foreach(r => assert(r.getDouble(0) === 0.0))
  }

  test("quality filter: reason is the first failing rule, keep <=> ok") {
    val rows = TextQuality.qualityFilter(spark, dir).collect()
    rows.foreach { r =>
      val (nWords, distinct, top, reason, keep) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getString(4),
          r.getBoolean(5))
      val expected =
        if (nWords < 20) "too_short"
        else if (distinct < 0.45) "low_diversity"
        else if (top > 0.12) "repetitive"
        else "ok"
      assert(reason === expected)
      assert(keep === (reason == "ok"))
    }
    // thresholds must actually split the fixture corpus
    assert(rows.map(_.getString(4)).distinct.length >= 3)
  }

  test("pii: planted docs are counted and masked; clean docs untouched") {
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), md5(col("text")).as("orig_md5"))
    val out = TextQuality.piiRedact(spark, dir)
      .join(docs, "doc_id")
      .collect()
    out.foreach { r =>
      val doc = r.getAs[Long]("doc_id")
      val (emails, phones, urls) = (r.getAs[Long]("n_emails"),
        r.getAs[Long]("n_phones"), r.getAs[Long]("n_urls"))
      val changed =
        r.getAs[String]("redacted_md5") != r.getAs[String]("orig_md5")
      if (doc % 7 == 0) {
        assert(emails === 1L && phones === 0L && urls === 0L)
        assert(changed, s"doc $doc email not redacted")
      } else if (doc % 7 == 3) {
        assert(emails === 0L && phones === 1L && urls === 1L)
        assert(changed, s"doc $doc phone/url not redacted")
      } else {
        assert(emails === 0L && phones === 0L && urls === 0L)
        assert(!changed, s"doc $doc modified despite no PII")
      }
    }
  }
}
