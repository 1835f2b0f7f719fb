package graft.query

import org.apache.spark.sql.functions._
import graft.{SparkSuite, TestSpark}

/** The Lee-'22 removal stage ([[TextSim.dedupSubstringApplyOf]]) and
  * its placement as curate_full's optional scrub stage (r14 verdict
  * task 6). */
class SubstringApplySpec extends SparkSuite {

  import spark.implicits._

  /** doc 1 carries the corpus-first occurrence of a 5-gram run; doc 3
    * repeats it with a unique tail; doc 7 is untouched filler. */
  private lazy val planted = Seq(
    (1L, "alpha bravo charlie delta echo foxtrot unique one tail"),
    (3L, "alpha bravo charlie delta echo foxtrot other ending words here"),
    (7L, "completely different content with no shared grams at all"))
    .toDF("doc_id", "text")

  test("keep-first semantics on a planted duplicated run") {
    val out = TextSim.dedupSubstringApplyOf(planted)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // doc 1: first occurrence — nothing removed
    assert(out(1L) === ((9L, 0L,
      "alpha bravo charlie delta echo foxtrot unique one tail")))
    // doc 3: the 6-token duplicated run is cut (two overlapping dup
    // 5-grams cover positions 0..5), the unique tail survives
    assert(out(3L) === ((10L, 6L, "other ending words here")))
    // doc 7: untouched
    assert(out(7L)._2 === 0L)
    assert(out(7L)._3 === "completely different content with no " +
      "shared grams at all")
  }

  test("within-document repetition: later in-doc copy is cut too") {
    val docs = Seq(
      (2L, "one two three four five MID one two three four five"
        .toLowerCase))
      .toDF("doc_id", "text")
    val out = TextSim.dedupSubstringApplyOf(docs).head()
    // 11 tokens; the second occurrence (positions 6..10) is covered
    // only by non-primary occurrences => removed; 'mid' (pos 5) is
    // inside no dup gram
    assert(out.getLong(1) === 11L)
    assert(out.getLong(2) === 5L)
    assert(out.getString(3) === "one two three four five mid")
  }

  test("hot gram (df >> partition count): primary is the global " +
      "(doc_id, start) min and the plan has ZERO Window operators") {
    // 500 carriers of one boilerplate 5-gram — its occurrence list is
    // corpus-wide, far above the 32 shuffle partitions. The r15-weak
    // formulation sorted that whole list in ONE task
    // (Window.partitionBy("gh") + row_number); the de-skewed form is
    // a map-side-combinable min(struct(doc_id, start)) aggregate, so
    // no Window may appear anywhere in the plan.
    val hot = "alpha bravo charlie delta echo"
    val docs = (1 to 500).map(i =>
      (i.toLong, s"$hot uniq${i}a uniq${i}b")).toDF("doc_id", "text")
    val out = TextSim.dedupSubstringApplyOf(docs)
    val windows = graft.PlanNodes.all(out)
      .filter(_.nodeName.contains("Window"))
    assert(windows.isEmpty,
      s"apply plan still has Window nodes: ${windows.map(_.nodeName)}")
    val m = out.collect().map(r => r.getLong(0) ->
      (r.getLong(2), r.getString(3))).toMap
    assert(m(1L) === ((0L, s"$hot uniq1a uniq1b")),
      "the corpus-first carrier lost its primary occurrence")
    (2 to 500).foreach { i =>
      assert(m(i.toLong) === ((5L, s"uniq${i}a uniq${i}b")),
        s"doc $i: hot run not cut exactly")
    }
  }

  test("total over the corpus: short and empty docs pass through") {
    val docs = Seq((1L, "tiny"), (2L, "   "), (3L, "a b c d"))
      .toDF("doc_id", "text")
    val out = TextSim.dedupSubstringApplyOf(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) === ((1L, 0L, "tiny")))
    assert(out(2L) === ((0L, 0L, "")))
    assert(out(3L) === ((4L, 0L, "a b c d")))
  }

  test("fixture: removal accounting agrees with the span detection") {
    val dir = TestSpark.sfDir
    val apply = TextSim.dedupSubstringApply(spark, dir)
    val docs = graft.core.Tables.load(spark, dir, "documents")
    assert(apply.count() === docs.count(), "not total over the corpus")
    // every removed token sits inside a detected span, so per-doc
    // n_removed <= the doc's total span length (equality iff the doc
    // holds no primary occurrence — both quantities over capped grams)
    val spans = TextSim.dedupSubstring(spark, dir)
      .groupBy("doc_id")
      .agg(sum(col("span_end") - col("span_start")).as("span_toks"))
    val bad = apply.join(spans, Seq("doc_id"), "left")
      .filter(col("n_removed") > coalesce(col("span_toks"), lit(0L)))
      .count()
    assert(bad === 0L, s"$bad docs removed more than their span mass")
    assert(apply.agg(sum("n_removed")).head().getLong(0) > 0L,
      "fixture removed nothing — vacuous")
  }

  test("curate composition law: scrubSpans == pre-scrubbed corpus " +
      "when doc-grain dedup is identity") {
    // a corpus with no canonical or near duplicates: stages 1-2 are
    // identity, so scrubbing inside the pipeline must equal scrubbing
    // the corpus first (quality gate needs >= 30 distinct-ish tokens;
    // build long docs sharing one 5-gram run)
    val shared = "omega psi chi phi upsilon"
    def filler(i: Int, n: Int) =
      (0 until n).map(j => s"w${i}x$j").mkString(" ")
    val docs = (1 to 6).map(i =>
      ((i * 7).toLong, s"src${i % 2}", s"${filler(i, 40)} $shared"))
      .toDF("doc_id", "source", "text")
    val inPipeline = TextQuality
      .curateFullOf(docs, capacity = 256, scrubSpans = true)
      .collect().map(_.toString).sorted.toSeq
    val preScrubbed = docs.drop("text").join(
      TextSim.dedupSubstringApplyOf(docs)
        .select(col("doc_id"), col("cleaned_text").as("text")),
      Seq("doc_id"))
    val composed = TextQuality
      .curateFullOf(preScrubbed, capacity = 256)
      .collect().map(_.toString).sorted.toSeq
    assert(inPipeline === composed)
    assert(inPipeline.nonEmpty,
      "quality gate dropped every planted doc — vacuous")
  }

  test("curate_scrub is non-vacuous at the fixture: scrubbing moves " +
      "token accounting vs curate_full") {
    // at sf0.001 the few duplicated spans don't survive doc-grain
    // dedup into the representatives, so the divergence is pinned at
    // the DRIVER GATE scale (sf0.01), where 4 packed rows move
    val dir = "/root/testdata/sf0.01"
    val scrub = TextQuality.curateScrub(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val full = TextQuality.curateFull(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(scrub !== full,
      "scrub stage changed nothing — duplicated spans vanished from " +
      "the fixture, the key no longer exercises removal")
  }

  test("curate_scrub_delta: incremental scrub is non-vacuous at sf0.1 " +
      "and equals the manual composition") {
    // sf0.1 is where delivery-slice duplicated spans survive to the
    // gated output: scrubbing flips quality-gate outcomes (removing
    // repetitive spans IMPROVES the top-token ratio, so the scrubbed
    // pipeline keeps MORE docs)
    val dir = "/root/testdata/sf0.1"
    val scrub = TextQuality.curateScrubDelta(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val plain = TextQuality.curateDelta(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(scrub !== plain,
      "incremental scrub changed nothing at sf0.1 — vacuous")
  }
}
