package graft.query

import org.apache.spark.sql.functions._

import graft.{SparkSuite, TestSpark}

/** Unit checks for the curation operators (TF-IDF, quality filter, PII
  * redaction) beyond the DuckDB hash-compare: internal consistency
  * properties that would survive an oracle-side copy of the same bug. */
class TextQualitySpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  test("text_surprisal ties out against a direct unigram-LM computation") {
    val toks = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), TextSim.tokens(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val freq = toks.values.flatten.groupBy(identity).map {
      case (t, occ) => t -> occ.size.toLong
    }
    val total = freq.values.sum.toDouble
    val log2 = (x: Double) => math.log(x) / math.log(2.0)
    val out = TextQuality.textSurprisal(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet === toks.filter(_._2.nonEmpty).keySet)
    out.foreach { case (id, (n, bits)) =>
      assert(n === toks(id).size.toLong, s"doc $id token count")
      // mean surprisal, fold order irrelevant at test tolerance
      val want = toks(id).map(t => log2(total / freq(t))).sum / n
      assert(math.abs(bits - want) < 1e-5, s"doc $id bits=$bits want=$want")
      assert(bits > 0, s"doc $id nonpositive surprisal")
    }
    // rarity sanity: the most common token alone scores below the mean
    // of the rarest token's surprisal
    val cMax = freq.values.max.toDouble
    val cMin = freq.values.min.toDouble
    assert(log2(total / cMax) < log2(total / cMin))
  }

  test("text_repetition: scan-side mode agrees with explode+groupBy brute force") {
    import org.apache.spark.sql.expressions.Window
    val out = TextQuality.textRepetition(spark, dir)
      .select("doc_id", "top_bigram", "top_bigram_n")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    // brute force: one row per bigram occurrence, count, argmax with the
    // same (count desc, gram asc) tie-break
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .withColumn("toks", TextSim.tokens(col("text")))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(toks) - 1),
          |  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"""
          .stripMargin)).as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("n").desc, col("gram").asc)
    val brute = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("gram"), r.getAs[Long]("n"))).toMap
    assert(out === brute)
  }

  test("text_repetition: zero data shuffle (only the final presentation sort)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    def hashShuffles(df: org.apache.spark.sql.DataFrame) =
      graft.PlanNodes.all(df).collect {
        case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
      }
    // sensitivity guard: the traversal MUST see the shuffle in a plan
    // that definitely has one — with AQE on, a bare `.collect` over
    // executedPlan stops at the AdaptiveSparkPlanExec wrapper and this
    // whole test goes vacuously green (PlanAuditSpec documents the trap)
    val grouped = graft.core.Tables.load(spark, dir, "documents")
      .groupBy("source").agg(count(lit(1)))
    assert(hashShuffles(grouped).nonEmpty,
      "plan traversal is AQE-blind — zero-shuffle assertion is vacuous")
    assert(hashShuffles(TextQuality.textRepetition(spark, dir)).isEmpty,
      "per-doc mode must be computed scan-side, not via a keyed shuffle")
  }

  test("text_repetition: per-row analysis window caps at maxTokens") {
    import spark.implicits._
    // 3 tokens, cap 2 ⇒ only the first bigram is visible; n_tokens
    // reports the ANALYZED count (the operator contract, mirrored in
    // the oracle twin's list_slice)
    val docs = Seq((1L, "a b a")).toDF("doc_id", "text")
    val r = TextQuality.repetitionOf(docs, maxTokens = 2).collect().head
    assert(r.getAs[Long]("n_tokens") === 2L)
    assert(r.getAs[String]("top_bigram") === "a b")
    assert(r.getAs[Long]("top_bigram_n") === 1L)
    // default cap leaves the fixture corpus untouched: every doc is
    // far below RepetitionMaxTokens, so capped == uncapped
    val capped = TextQuality.textRepetition(spark, dir).collect()
    val uncapped = TextQuality
      .repetitionOf(graft.core.Tables.load(spark, dir, "documents"),
        maxTokens = Int.MaxValue).collect()
    assert(capped === uncapped)
  }

  test("text_repetition: planted repetitive vs diverse docs score as expected") {
    import spark.implicits._
    // doc 1: 20× "spam ham" ⇒ "ham spam" and "spam ham" runs; top bigram
    // count 20 ("spam ham"), 19 ("ham spam") — tie-break irrelevant;
    // distinct 5-grams collapse to 2. doc 2: all-distinct tokens ⇒ every
    // bigram count 1 (tie → lexicographically smallest), ratio 1.0.
    val planted = Seq((1L, ("spam ham " * 20).trim),
        (2L, (1 to 40).map(i => f"w$i%02d").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextQuality.repetitionOf(planted).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val rep = out(1L)
    assert(rep.getAs[String]("top_bigram") === "spam ham")
    assert(rep.getAs[Long]("top_bigram_n") === 20L)
    assert(rep.getAs[Double]("distinct_5gram_ratio") < 0.06) // 2/36
    val div = out(2L)
    assert(div.getAs[Long]("top_bigram_n") === 1L)
    assert(div.getAs[String]("top_bigram") === "w01 w02") // smallest gram
    assert(div.getAs[Double]("distinct_5gram_ratio") === 1.0)
  }

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
