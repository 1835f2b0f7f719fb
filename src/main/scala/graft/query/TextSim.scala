package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions.{cosine_sim, hyperplane_signature, simhash64}

/** Text analysis + deduplication + similarity search (SURVEY.md §2
  * B14–B16 and the LLM-training-pipeline extensions): exact dedup,
  * n-gram Jaccard, MinHash+LSH, SimHash, embedding near-dup, brute-force
  * and LSH-bucketed cosine top-k, language ID, quality scoring, token
  * counting, fingerprinting.
  *
  * Scale design: nothing here is O(n²) over the corpus. Every pairwise
  * operator goes through a CANDIDATE-generation stage first — shared
  * shingles, MinHash bands, SimHash chunks, label blocks or hyperplane
  * buckets — so the join fans out on bucket keys (hash-partitionable,
  * skew-salvageable by AQE) rather than a cross product. The verify stage
  * then computes the exact measure per candidate pair only.
  */
object TextSim {

  /** Whitespace tokenization, lowercased, empty tokens dropped. */
  def tokens(c: Column): Column =
    filter(split(lower(c), "\\s+"), t => length(t) > 0)

  private def docsTokOf(docs: DataFrame): DataFrame =
    docs.withColumn("toks", tokens(col("text")))

  // NOT fanOut here (r20 measured): most consumers are cheap panels
  // where the extra exchange costs more than single-task tokenize;
  // heavy per-row consumers (simhash, shingle family) fan out at
  // their own entries.
  private def docsTok(spark: SparkSession, dir: String): DataFrame =
    docsTokOf(Tables.load(spark, dir, "documents"))

  // ---------------------------------------------------------------- text

  /** B15: corpus-wide token frequencies, top 100. */
  def textTokens(spark: SparkSession, dir: String): DataFrame =
    docsTok(spark, dir)
      .select(explode(col("toks")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(100)

  /** Lateral flatten WITH position: one output row per (doc, token
    * index) — the explode shape every sequence-labeling / chunk-offset
    * pipeline needs, where plain explode loses the offset. Tokenization
    * here is a bare single-space split (not [[tokens]]) so the oracle's
    * string_split is character-identical. Scale: posexplode is scan-side
    * Generate — fan-out ~tokens-per-doc, zero shuffle before the oracle
    * ORDER BY; the doc_id sample bounds the dump size only. */
  def docTokensPos(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 97 === 0)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("p", "tok")))
      .select(col("doc_id"), col("p").cast("long").as("pos"), col("tok"))
      .orderBy("doc_id", "pos")

  /** Scalar array-function panel over the token array: size, distinct
    * size, membership, 1-based position, last element, and a joined
    * slice — the column algebra a pipeline uses to interrogate
    * array<string> columns without exploding them. Everything projects
    * to SCALARS (the differential oracle compares scalar columns;
    * list-typed output would pin the compare to pandas list hashing).
    * Scale: pure scan-side projection, zero shuffle before the oracle
    * ordering. */
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        array_contains(col("toks"), "the").as("has_the"),
        array_position(col("toks"), "the").as("first_the"),
        element_at(col("toks"), -1).as("last_tok"),
        concat_ws("_", slice(col("toks"), 1, 3)).as("first3"))
      .orderBy("doc_id")

  /** Higher-order-function panel: transform / aggregate / filter /
    * exists / forall / zip_with lambdas over the token array — the
    * column algebra a pipeline uses to interrogate array columns
    * WITHOUT exploding them (per-row work, no Generate fan-out, no
    * shuffle). All outputs live in integer/boolean space so the
    * cross-engine compare is exact. `n_adj_repeat` pairs each token
    * with its successor via zip_with against a 1-shifted slice —
    * zip_with pads the short side with null, and === null is null,
    * which the filter drops, so the trailing pair self-excludes. */
  def hofFuncs(spark: SparkSession, dir: String): DataFrame =
    docsTok(spark, dir)
      .select(col("doc_id"),
        aggregate(transform(col("toks"), t => length(t)), lit(0L),
          (acc, x) => acc + x).as("sum_tok_len"),
        size(filter(col("toks"), t => length(t) > 4)).cast("long")
          .as("n_long"),
        exists(col("toks"), t => t === "the").as("has_the"),
        forall(col("toks"), t => length(t) < 30).as("all_short"),
        size(filter(
          zip_with(col("toks"),
            slice(col("toks"), lit(2),
              greatest(size(col("toks")) - 1, lit(0))),
            (a, b) => a === b),
          x => x)).cast("long").as("n_adj_repeat"))
      .orderBy("doc_id")

  /** Per-document quality/statistics: word counts, BPE-ish token count,
    * average word length, stopword ratio, uniqueness, quality score. */
  def textStats(spark: SparkSession, dir: String): DataFrame = {
    val stop = Seq("the", "a", "of", "and", "to", "in")
    docsTok(spark, dir)
      .withColumn("n_words", size(col("toks")).cast("long"))
      .withColumn("n_distinct_words",
        size(array_distinct(col("toks"))).cast("long"))
      .withColumn("n_tokens_bpe",
        regexp_count(col("text"), lit("[a-z0-9]+|[^a-z0-9\\s]"))
          .cast("long"))
      .withColumn("sum_word_len",
        aggregate(col("toks"), lit(0), (acc, t) => acc + length(t)))
      .withColumn("n_stopwords",
        size(filter(col("toks"), t => t.isInCollection(stop))))
      .select(
        col("doc_id"), col("n_chars"), col("n_words"),
        col("n_distinct_words"), col("n_tokens_bpe"),
        round(col("sum_word_len").cast("double") / col("n_words"), 6)
          .as("avg_word_len"),
        round(col("n_stopwords").cast("double") / col("n_words"), 6)
          .as("stopword_ratio"),
        round((col("n_distinct_words").cast("double") / col("n_words")) *
          least(lit(1.0), col("n_words").cast("double") / 50.0), 6)
          .as("quality_score"))
      .orderBy("doc_id")
  }

  /** Marker-word language ID (n-gram-heuristic family): vote per language
    * on trigger-word hits, deterministic preference order on ties. */
  def textLangid(spark: SparkSession, dir: String): DataFrame = {
    val markers = Seq(
      "en" -> Seq("the", "and", "of"),
      "es" -> Seq("el", "los", "las"),
      "fr" -> Seq("le", "les", "une"),
      "de" -> Seq("der", "und", "das"))
    val voted = markers.foldLeft(docsTok(spark, dir)) { case (df, (l, ws)) =>
      df.withColumn(s"votes_$l",
        size(filter(col("toks"), t => t.isInCollection(ws))).cast("long"))
    }
    val best = markers.map { case (l, _) => col(s"votes_$l") }
    val pred = markers.foldLeft(when(lit(false), lit(""))) {
      case (acc, (l, _)) =>
        acc.when(col(s"votes_$l") === greatest(best: _*) &&
          col(s"votes_$l") > 0, l)
    }.otherwise("und")
    voted.select(col("doc_id"), col("lang"),
        pred.as("predicted_lang"),
        col("votes_en"), col("votes_es"), col("votes_fr"), col("votes_de"))
      .orderBy("doc_id")
  }

  /** Document fingerprint: hash of the sorted distinct token set
    * (order-invariant content signature). */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame =
    docsTok(spark, dir)
      .select(col("doc_id"),
        md5(concat_ws(" ", array_sort(array_distinct(col("toks")))))
          .as("fingerprint"))
      .orderBy("doc_id")

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken '03 — the
    * MOSS algorithm): guarantee-bearing document fingerprint SELECTION.
    * Hash every token 3-gram, slide a window of `w` = 4 consecutive
    * hashes, and keep the minimal hash per window (RIGHTMOST position
    * on ties — the paper's robust winnowing). The guarantee: any match
    * of at least w + k − 1 = 6 tokens between two documents shares at
    * least one selected fingerprint, while only ~2/(w+1) of all grams
    * are kept — the density/guarantee trade the paper proves. The hash
    * order is md5-hex string order: portable across engines (the
    * DuckDB twin recomputes it literally), uniform enough that
    * selection is content-, not alphabet-, biased.
    *
    * Shape at scale: shingle + hash scan-side, then ONE doc-keyed
    * shuffle where a sliding window frame (`rowsBetween(0, w−1)`)
    * computes each window's minimum as a struct-min aggregate —
    * min(struct(h, −pos)) makes the RIGHTMOST position win ties for
    * free. (A first cut did the window fold as nested array HOFs
    * referencing the hash array per element; project-collapse inlined
    * the whole md5-array expression into every element_at — quadratic
    * hashing, 13.6 s at sf0.1 vs ~1 s for this form.) Documents
    * shorter than one full window winnow as a single window over
    * their grams (the standard short-document convention; the frame's
    * partition-end clipping gives exactly that); docs under k tokens
    * emit nothing. */
  def textWinnow(spark: SparkSession, dir: String, w: Int = 4)
      : DataFrame =
    textWinnowOf(Tables.fanOut(Tables.load(spark, dir, "documents")), w)

  /** [[textWinnow]] over an explicit documents frame (doc_id, text) —
    * the spec's entry point for planted-match fixtures. */
  def textWinnowOf(docs: DataFrame, w: Int = 4): DataFrame = {
    val k = 3
    val hs = transform(
      sequence(lit(1), size(col("toks")) - (k - 1)),
      i => md5(concat_ws(" ",
        element_at(col("toks"), i),
        element_at(col("toks"), i + 1),
        element_at(col("toks"), i + 2))))
    val grams = docsTokOf(docs)
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"), posexplode(hs).as(Seq("p0", "h")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("h"))
    val slide = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    val whole = Window.partitionBy("doc_id")
    grams
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("m",
        min(struct(col("h").as("h"), (-col("pos")).as("np"))).over(slide))
      // windows start at pos 1..n-w+1 (or just pos 1 when n < w)
      .filter(col("pos") <= greatest(col("n") - (w - 1), lit(1)))
      .select(col("doc_id"), (-col("m.np")).cast("long").as("pos"),
        col("m.h").as("fp"))
      .distinct()
      .orderBy("doc_id", "pos")
  }

  /** Winnow-fingerprint match detection — MOSS's second half: two
    * documents sharing at least `minShared` distinct selected
    * fingerprints are reported with their shared count. Because
    * selection carries the winnowing guarantee, any pair sharing a
    * run of ≥ w+k−1 tokens per shared fingerprint is caught, while
    * the candidate space is the SELECTED grams only (~2/(w+1) of the
    * corpus gram mass — the whole point of winnowing at 100 TB: the
    * postings index is 2.5× smaller than a full shingle index for the
    * same guarantee). Hot fingerprints above `dfCap` docs are dropped
    * from pairing (the [[dedupNgram]] DF-cap precedent — boilerplate
    * grams pair quadratically and signal template, not provenance). */
  def dedupWinnow(spark: SparkSession, dir: String, minShared: Int = 2,
      dfCap: Int = 1000): DataFrame = {
    // localCheckpoint: the fingerprint frame is referenced FOUR times
    // (hot derivation + the anti-join and both self-join sides), and
    // each reference re-ran the whole two-window winnow pipeline —
    // 8 scans / 8 Windows in the executed plan, 3.1 s → checkpointing
    // the selected-fp frame runs it once (the curate-survivor
    // convention)
    val fps = textWinnow(spark, dir)
      .select("doc_id", "fp").distinct()
      .localCheckpoint()
    val hot = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap).select("fp")
    val cold = fps.join(hot, Seq("fp"), "left_anti")
    cold.as("a").join(cold.as("b"),
        col("a.fp") === col("b.fp") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy("d1", "d2")
  }

  // --------------------------------------------------------------- dedup

  /** B14: exact dedup on content hash, keep lowest doc_id per group. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id").asc)
    Tables.load(spark, dir, "documents")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  /** Canonicalized near-exact dedup (the C4/CCNet normalization family,
    * public construction): dedup on a NORMALIZED content hash —
    * lowercase, punctuation stripped, whitespace collapsed — so
    * reformatted/re-cased/re-punctuated copies of one document collapse
    * to a single canonical row. Sits between [[dedupExact]] (byte
    * identity) and the similarity family: one hash-partitioned window,
    * scan-side normalization, no candidate generation at all — the
    * cheapest dedup pass a 100 TB curation pipeline runs FIRST to
    * shrink the input of the expensive near-dup stages. Emits the
    * surviving rows plus how many duplicates each absorbed. */
  /** Punctuation becomes a SPACE (not deleted) before collapsing, so
    * hyphenated/joined variants normalize like spaced ones. A document
    * with NO [a-z0-9] content at all normalizes to the empty string —
    * hashing that would collapse every such document (different
    * non-Latin texts, pure-symbol docs) into one bogus duplicate
    * group, so the canonical hash falls back to the raw content hash
    * there (byte-identity dedup only, the honest floor for text this
    * normalizer cannot see). */
  def canonicalMd5(text: Column): Column = {
    val canon = trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))
    when(canon === "", md5(text)).otherwise(md5(canon))
  }

  /** Canonical-dedup pre-pass returning the surviving FULL rows (lowest
    * doc_id per normalized-content hash, helper columns dropped) — the
    * stage every pairwise dedup operator should consume at scale: the
    * Scale audit (SCALE.md r7) measures raw levenshtein candidates
    * growing ~factor² under crawl duplication while survivors hold the
    * DP stage constant. */
  def canonicalSurvivors(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("canon_md5").orderBy(col("doc_id").asc)
    docs.withColumn("canon_md5", canonicalMd5(col("text")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("canon_md5", "rn")
  }

  def dedupCanonical(spark: SparkSession, dir: String): DataFrame = {
    val canon = canonicalMd5(col("text"))
    val w = Window.partitionBy(col("canon_md5")).orderBy(col("doc_id").asc)
    Tables.load(spark, dir, "documents")
      .withColumn("canon_md5", canon)
      .withColumn("rn", row_number().over(w))
      .withColumn("n_absorbed",
        count(lit(1)).over(Window.partitionBy(col("canon_md5"))) - 1)
      .filter(col("rn") === 1)
      .select("doc_id", "lang", "source", "canon_md5", "n_absorbed")
      .orderBy("doc_id")
  }

  /** n-word shingles of a token array (distinct; default 3). */
  def shingles(toks: Column, n: Int = 3): Column =
    array_distinct(transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (1 to n).map(j => element_at(toks, i + j)): _*)))

  private def shingleSetsOf(docs: DataFrame): DataFrame =
    docsTokOf(docs)
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(shingles(col("toks"))).as("shingle"))

  private def shingleSets(spark: SparkSession, dir: String): DataFrame =
    shingleSetsOf(Tables.fanOut(Tables.load(spark, dir, "documents")))

  /** All ordered pairs within each row's sorted `arr` column — the
    * shared candidate-expansion core of [[dedupNgram]],
    * [[dedupLevenshtein]] and [[dedupEmbeddingAnn]]. Two Generate
    * operators — posexplode + explode(slice) stay inside whole-stage
    * codegen, where a transform/flatten HOF chain would be interpreted
    * per row (~40 % slower measured at sf0.1). Pair fan-out is bounded
    * by the caller's cap on size(arr); arrays must be pre-sorted
    * (array_sort upstream) so (a, b) is deterministic with a < b. */
  private[query] def orderedPairs(postings: DataFrame, arr: String,
      a: String, b: String): DataFrame =
    postings
      .select(posexplode(col(arr)).as(Seq("i", a)), col(arr))
      .select(col(a), explode(
        slice(col(arr), col("i") + lit(2), size(col(arr)))).as(b))

  /** n-gram Jaccard near-dup pairs: candidate pairs share ≥1 shingle
    * (index join, not cross product), exact Jaccard computed per pair.
    *
    * Skew guard: a shingle appearing in `df` documents contributes
    * O(df²) candidate pairs, so one boilerplate trigram ("all rights
    * reserved") would go quadratic at corpus scale. Shingles with
    * document frequency > `maxShingleDf` are dropped BEFORE the
    * self-join — Jaccard is then computed over the capped shingle space
    * on both the common and per-doc counts (the DuckDB oracle applies
    * the identical cap, so parity holds at any SF). At 100 TB the cap
    * bounds the worst key's fan-out to maxShingleDf² pairs; corpora with
    * heavy boilerplate should route through [[dedupMinhash]], whose
    * banding bounds fan-out by construction. Observed max df: 7 at
    * sf0.01, 25 at sf0.1 — the default cap changes nothing at test SFs. */
  def dedupNgram(spark: SparkSession, dir: String,
      threshold: Double = 0.3, maxShingleDf: Int = 1000): DataFrame = {
    // Postings-list formulation: ONE aggregation groups the docs sharing
    // each shingle (keyed by a 64-bit shingle hash — ~3× less shuffled
    // data than the raw string; cross-shingle collisions ~n²/2^65,
    // immaterial); the DF cap is then a free `size(docs)` filter and
    // candidate pairs come from per-posting combinatorics instead of a
    // self-join that recomputes the whole tokenize→explode subtree per
    // join side. Per-doc shingle counts reuse the SAME capped postings,
    // so the Jaccard space is consistently the capped one (the oracle
    // mirrors the cap).
    val sh = shingleSets(spark, dir)
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh_h"))
    val postings = sh.groupBy("sh_h")
      .agg(array_sort(collect_list(col("doc_id"))).as("docs"))
      .filter(size(col("docs")) <= maxShingleDf)   // skew guard, free
      .select("docs")
    val counts = postings.select(explode(col("docs")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    // all ordered pairs within one posting (bounded by maxShingleDf²)
    val common = orderedPairs(
        postings.filter(size(col("docs")) >= 2), "docs", "d1", "d2")
      .groupBy("d1", "d2")
      .agg(count(lit(1)).as("common"))
    common
      .join(counts.as("c1"), col("d1") === col("c1.doc_id"))
      .join(counts.as("c2"), col("d2") === col("c2.doc_id"))
      .select(col("d1"), col("d2"),
        round(col("common").cast("double") /
          (col("c1.n_sh") + col("c2.n_sh") - col("common")), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("d1", "d2")
  }

  /** DF-capped posting arrays (sh_h, docs sorted) — the shared
    * substrate of the star-bounded shingle family. Two aggregations
    * on sh_h so an over-cap posting (a 10⁷-df boilerplate shingle)
    * is dropped BEFORE collect_list and can never materialize as one
    * giant array cell — strictly safer than [[dedupNgram]]'s
    * filter-after-collect (ONE aggregation — a pre-filtering df pass
    * was measured at +2 corpus shuffles for the same result; the
    * transient over-cap array before the filter is [[dedupNgram]]'s
    * long-documented trade, and every SURVIVING array is
    * ≤ maxShingleDf elements, which is what licenses the in-task
    * array expansion below. Corpora where even the transient is a
    * hazard — 10⁷-df boilerplate — are the documented hand-off to
    * minhash banding, whose star stage stays on the window form
    * [[starEdges]] precisely because its buckets have NO df cap).
    * Includes df = 1 postings: per-doc totals (Jaccard denominators)
    * must count the whole capped shingle space, exactly like
    * [[dedupNgram]]. */
  private[graft] def cappedPostings(docs: DataFrame, maxShingleDf: Int)
      : DataFrame =
    shingleSetsOf(docs)
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh_h"))
      .groupBy("sh_h")
      .agg(array_sort(collect_list(col("doc_id"))).as("docs"))
      .filter(size(col("docs")) <= maxShingleDf)

  /** Bounded candidate pairs from capped posting ARRAYS: postings
    * at-or-under `allPairCap` expand to exact all-i<j pairs
    * ([[orderedPairs]] — posexplode + slice, whole-stage codegen);
    * postings above it emit the DOUBLE star (edges from the two
    * lowest docs — the array is sorted, so that's elements 1 and 2 —
    * O(df) per posting, (mn, mn2) deduped by the trailing distinct).
    * The array form exists because the window + self-join shape of
    * [[starEdges]] measured ~7× slower here at sf0.1: it re-shuffles
    * the posting table three times where this is one aggregation
    * already paid by [[cappedPostings]] plus in-task generators. */
  private[graft] def arrayStarPairs(postings: DataFrame,
      allPairCap: Int): DataFrame = {
    val multi = postings.filter(size(col("docs")) >= 2)
    val small = orderedPairs(
      multi.filter(size(col("docs")) <= allPairCap), "docs", "d1", "d2")
    small.union(starOnlyPairs(postings, allPairCap)).distinct()
  }

  /** Just the over-cap postings' double-star edges (not distinct —
    * callers union/dedup). Empty whenever every posting is at-or-under
    * the cap, which is what keeps the fixture plans on the cheap
    * expansion-count path below. */
  private def starOnlyPairs(postings: DataFrame, allPairCap: Int)
      : DataFrame = {
    val big = postings.filter(size(col("docs")) > allPairCap)
    val root1 = big.select(element_at(col("docs"), 1).as("d1"),
      explode(slice(col("docs"), lit(2), size(col("docs")))).as("d2"))
    val root2 = big.select(element_at(col("docs"), 2).as("d1"),
      explode(slice(col("docs"), lit(3), size(col("docs")))).as("d2"))
    root1.union(root2)
  }

  /** Exact shared-shingle counts for the star-bounded candidate set —
    * (d1, d2, common), where `common` is the TOTAL number of capped
    * shingles the pair shares (the quantity both the Jaccard numerator
    * and the Levenshtein `minShared` floor consume). Split by posting
    * size so the exact count never needs a join when nothing is over
    * the cap:
    *   - small postings (≤ allPairCap) expand ALL their pairs, so the
    *     expansion's occurrence count IS the pair's shared-small count
    *     (the [[dedupNgram]] form — one groupBy, no join);
    *   - big postings contribute both their star candidates and, via
    *     one join of the candidate set against ONLY the big postings'
    *     exploded rows, the shared-big count for every candidate.
    * common = shared_small + shared_big is exact for every emitted
    * candidate (a small posting expands every pair it contains; a big
    * shingle shared by a candidate is counted by the join), so
    * precision stays 1 at any scale; only candidate COMPLETENESS
    * relaxes to the spanning guarantee above the cap. At fixture DFs
    * the big side is EMPTY: the join runs against an empty relation
    * and the output — and cost class — equals the exact form's. */
  private def starCommonCounts(postings: DataFrame, allPairCap: Int)
      : DataFrame = {
    val multi = postings.filter(size(col("docs")) >= 2)
    // ONE weighted expansion: small postings emit all their pairs at
    // weight 1 (so the sum IS the pair's shared-small count — the
    // dedupNgram form), big postings emit their double-star edges at
    // weight 0 (candidates only); one aggregation yields the
    // candidate set AND c_small together — no separate distinct, no
    // candidate-vs-count join
    val candSmall = orderedPairs(
        multi.filter(size(col("docs")) <= allPairCap), "docs", "d1", "d2")
      .select(col("d1"), col("d2"), lit(1L).as("w"))
      .union(starOnlyPairs(postings, allPairCap)
        .select(col("d1"), col("d2"), lit(0L).as("w")))
      .groupBy("d1", "d2").agg(sum(col("w")).as("c_small"))
    // big-shared counts for every candidate via the big postings'
    // exploded rows; when nothing is over the cap, shBig is empty and
    // AQE's empty-relation propagation collapses this whole branch —
    // the fixture plan pays only the weighted aggregation above
    val shBig = multi.filter(size(col("docs")) > allPairCap)
      .select(col("sh_h"), explode(col("docs")).as("doc_id"))
    val commonBig = candSmall.select("d1", "d2")
      .join(shBig.as("s1"), col("d1") === col("s1.doc_id"))
      .join(shBig.as("s2"), col("d2") === col("s2.doc_id") &&
        col("s1.sh_h") === col("s2.sh_h"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("c_big"))
    candSmall
      .join(commonBig, Seq("d1", "d2"), "left")
      .select(col("d1"), col("d2"),
        (col("c_small") + coalesce(col("c_big"), lit(0L))).as("common"))
  }

  /** [[dedupNgram]] with STAR-BOUNDED per-shingle candidate expansion —
    * the CLUSTER-consumer form of the shared-shingle family, closing
    * the r14 audit's last per-bucket quadratic: [[dedupNgram]]'s
    * all-ordered-pairs within a posting is the right contract when the
    * OUTPUT is the pair set, but an at-cap boilerplate shingle
    * (df = maxShingleDf = 1000) emits ~500k pairs there, and a
    * templated crawl corpus holds MANY at-cap shingles (Σ df² total
    * work). Connectivity — what transitive-closure clustering
    * ([[Cluster.dedupCluster]]) consumes — only needs a spanning set
    * per posting, so postings above `allPairCap` emit the double-star
    * edges of [[arrayStarPairs]] (O(df) per posting) while postings
    * at-or-under the cap keep the exact all-pairs form. At the driver
    * fixtures (observed max df: 7 at sf0.01, 25 at sf0.1 — both under
    * the 32 cap) the candidate set, the verified pair set and every
    * downstream hash are IDENTICAL to [[dedupNgram]]'s, which is what
    * lets `dedup_ngram_star` run under the same full DuckDB hash gate.
    * Jaccard is exact per emitted pair ([[starCommonCounts]] sums the
    * expansion-derived and join-derived shared counts), so precision
    * is 1 at any
    * scale; above the cap only pair-set COMPLETENESS relaxes to the
    * spanning guarantee — the [[dedupMinhashStarOf]] trade, measured
    * in StarShingleSpec and ScaleTen. */
  def dedupNgramStarOf(docs: DataFrame, threshold: Double = 0.3,
      allPairCap: Int = 32, maxShingleDf: Int = 1000): DataFrame = {
    // the posting table is this operator's working index, consumed by
    // FOUR plan branches (totals, small expansion, big probe ×2);
    // materialize it once (the Ivf Lloyd-round localCheckpoint
    // precedent) instead of re-shuffling the corpus per branch —
    // measured ×2 at sf0.1
    val postings = cappedPostings(docs, maxShingleDf).localCheckpoint()
    // per-doc totals derived from the postings (one explode — never a
    // second tokenize of the corpus), the dedupNgram counts form
    val counts = postings.select(explode(col("docs")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    starCommonCounts(postings, allPairCap)
      .join(counts.as("c1"), col("d1") === col("c1.doc_id"))
      .join(counts.as("c2"), col("d2") === col("c2.doc_id"))
      .select(col("d1"), col("d2"),
        round(col("common").cast("double") /
          (col("c1.n_sh") + col("c2.n_sh") - col("common")), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("d1", "d2")
  }

  /** Table-loading wrapper of [[dedupNgramStarOf]]. */
  def dedupNgramStar(spark: SparkSession, dir: String,
      threshold: Double = 0.3, allPairCap: Int = 32,
      maxShingleDf: Int = 1000): DataFrame =
    dedupNgramStarOf(Tables.fanOut(Tables.load(spark, dir, "documents")),
      threshold, allPairCap, maxShingleDf)

  /** Exact duplicated-SPAN detection — substring-grain dedup (the
    * suffix-array exact-substring method of "Deduplicating Training
    * Data Makes Language Models Better", Lee et al. 2022, re-expressed
    * as a shuffle-on-gram Spark plan): find every token position whose
    * `gramLen`-gram occurs more than once in the corpus (within- OR
    * cross-document — both are removal targets), then merge the
    * overlapping/adjacent hits per document into maximal spans
    * (gaps-and-islands). Output: one row per maximal duplicated span
    * with its token range [span_start, span_end) and the number of
    * duplicated grams it merged.
    *
    * Scale shape — and why there is NO df cap here, unlike
    * [[dedupNgram]]: nothing is pairwise. The plan is one gram-grain
    * aggregate (map-side combinable count), one equi-join back on the
    * 64-bit gram hash (hot boilerplate grams are a large PROBE side
    * against a single build row — linear, not quadratic), and one
    * per-document window whose partition is bounded by document length.
    * Total work is linear in corpus token count at any skew; a real
    * suffix array would find variable-length maximal repeats, but the
    * fixed-gram + island-merge form recovers the same maximal spans
    * down to `gramLen` resolution with only scan-shuffle-window
    * primitives. Spark groups/joins 64-bit xxhash64 gram keys while the
    * oracle groups raw strings, so hash agreement doubles as a
    * collision check ([[textNoveltyOf]] convention). */
  def dedupSubstring(spark: SparkSession, dir: String, gramLen: Int = 5)
      : DataFrame =
    dedupSubstringOf(Tables.fanOut(Tables.load(spark, dir, "documents")),
      gramLen)

  /** DataFrame-parameterized core of [[dedupSubstring]] (specs plant
    * known duplicated spans through it). */
  def dedupSubstringOf(docs: DataFrame, gramLen: Int = 5): DataFrame = {
    val grams = docsTokOf(docs)
      .filter(size(col("toks")) >= gramLen)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, size(toks) - $gramLen),
           |  s -> struct(s AS start,
           |    array_join(slice(toks, s + 1, $gramLen), ' ') AS gram))"""
          .stripMargin)).as("g"))
      .select(col("doc_id"), col("g.start").as("start"),
        xxhash64(col("g.gram")).as("gh"))
    val dupGrams = grams.groupBy("gh")
      .agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2)
      .select("gh")
    val spans = grams.join(dupGrams, "gh")
      .select(col("doc_id"), col("start"),
        (col("start") + gramLen).as("end"))
    val w = Window.partitionBy("doc_id").orderBy("start")
    spans
      .withColumn("prev_max_end",
        max(col("end")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      // new island when this gram starts past everything seen so far;
      // start == prev end merges too (contiguous duplicated text)
      .withColumn("new_island",
        when(col("prev_max_end").isNull ||
          col("start") > col("prev_max_end"), 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(w))
      .groupBy("doc_id", "island")
      .agg(min("start").cast("long").as("span_start"),
        max("end").cast("long").as("span_end"),
        count(lit(1)).as("n_grams"))
      .select("doc_id", "span_start", "span_end", "n_grams")
      .orderBy("doc_id", "span_start")
  }

  /** The REMOVAL stage on top of [[dedupSubstring]]'s detection — the
    * Lee et al. '22 policy: when a substring occurs more than once in
    * the corpus, keep its FIRST occurrence (corpus order = (doc_id,
    * start), deterministic) and cut every other occurrence from the
    * text. Output is the cleaned corpus at doc grain: (doc_id,
    * n_tokens, n_removed, cleaned_text), total over the corpus (docs
    * too short for a gram — or with no tokens at all — pass through
    * with n_removed 0).
    *
    * Position rule (the span semantics made token-exact): a token
    * position is removed iff it is covered by ≥ 1 duplicated-gram
    * occurrence and by NO primary occurrence — so the first
    * occurrence's span survives even where it overlaps later
    * duplicates, and islands merge implicitly (adjacent non-primary
    * hits remove their union, exactly the [[dedupSubstringOf]] spans
    * minus the kept copies).
    *
    * Scale shape, like the detection stage: ONE gram-grain aggregate
    * computing both the occurrence count and the primary occurrence —
    * `min(struct(doc_id, start))` IS the rank-1 row under (doc_id,
    * start) order, but as a map-side-combinable aggregate instead of
    * a per-gram window sort, so a boilerplate gram with 10⁸
    * occurrences at 100 TB costs a combiner tree, never a
    * single-task sort (the r15 verdict's one weak mark) — then one
    * equi-join back on the 64-bit gram hash (hot grams are a large
    * probe side against a single build row — linear), a
    * gramLen-bounded position fan-out, and one doc-grain rollup —
    * linear in corpus token count at any skew, zero Window operators
    * in the whole plan (SubstringApplySpec pins that). Integer counts
    * + deterministic string rebuild ⇒ fully hash-checkable; Spark
    * keys 64-bit gram hashes while the oracle keys raw strings
    * (collision-check convention). */
  def dedupSubstringApply(spark: SparkSession, dir: String,
      gramLen: Int = 5): DataFrame =
    dedupSubstringApplyOf(
      Tables.fanOut(Tables.load(spark, dir, "documents")), gramLen)

  /** DataFrame-parameterized core of [[dedupSubstringApply]] (the
    * curation composition runs it as an optional scrub stage). */
  def dedupSubstringApplyOf(docs: DataFrame, gramLen: Int = 5)
      : DataFrame =
    substringKeptToksOf(docs, gramLen)
      .select(col("doc_id"), col("n_tokens"), col("n_removed"),
        concat_ws(" ", col("toks")).as("cleaned_text"))
      .orderBy("doc_id")

  /** [[dedupSubstringApplyOf]] stopped one step short of the string
    * rebuild: (doc_id, n_tokens, n_removed, toks) where `toks` is the
    * kept token array in position order. The curation pipeline
    * consumes THIS form — its quality gate needs tokens, not text, so
    * rebuilding `cleaned_text` only to re-split it wastes a pass over
    * every survivor (`tokens(concat_ws(" ", toks)) == toks` exactly:
    * kept tokens are lowercase, non-empty and whitespace-free by
    * [[tokens]]' construction, which is why the two forms are
    * hash-interchangeable). */
  private[query] def substringKeptToksOf(docs: DataFrame,
      gramLen: Int = 5): DataFrame = {
    val tok = docsTokOf(docs).select(col("doc_id"), col("toks"))
    val grams = tok
      .filter(size(col("toks")) >= gramLen)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, size(toks) - $gramLen),
           |  s -> struct(s AS start,
           |    array_join(slice(toks, s + 1, $gramLen), ' ') AS gram))"""
          .stripMargin)).as("g"))
      .select(col("doc_id"), col("g.start").as("start"),
        xxhash64(col("g.gram")).as("gh"))
    // count + primary in ONE map-side-combinable aggregate:
    // min(struct(doc_id, start)) == the row_number()==1 row under
    // (doc_id, start) order (pairs are unique per gram by
    // construction), without a per-gram sort a hot gram could skew
    val dupPrimary = grams.groupBy("gh")
      .agg(count(lit(1)).as("occ"),
        min(struct(col("doc_id"), col("start"))).as("p"))
      .filter(col("occ") >= 2)
      .select(col("gh"), col("p.doc_id").as("p_doc"),
        col("p.start").as("p_start"))
    val occ = grams.join(dupPrimary, "gh")
      .withColumn("is_primary",
        col("doc_id") === col("p_doc") && col("start") === col("p_start"))
    val covered = occ
      .select(col("doc_id"),
        explode(sequence(col("start"), col("start") + gramLen - 1))
          .as("pos"),
        col("is_primary"))
      .groupBy("doc_id", "pos")
      .agg(max(col("is_primary")).as("primary_covered"))
    val cleaned = tok
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tk")))
      .join(covered, Seq("doc_id", "pos"), "left")
      .withColumn("removed",
        coalesce(!col("primary_covered"), lit(false)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("removed"), lit(1))).as("n_removed"),
        transform(array_sort(collect_list(
            when(!col("removed"), struct(col("pos"), col("tk"))))),
          k => k("tk")).cast("array<string>").as("toks"))
    // total over the corpus: zero-token docs never reach posexplode
    docs.select("doc_id").join(cleaned, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("toks"), array().cast("array<string>"))
          .as("toks"))
  }

  /** The decision metric derived from [[dedupSubstring]]'s spans: what
    * fraction of each SOURCE's tokens sits inside a duplicated span
    * (plus doc counts) — the per-provenance duplication report a
    * curation run reads before deciding which sources to dedup or
    * down-weight. Docs shorter than a gram contribute to the token
    * denominator with zero duplicated tokens, so the rate is over the
    * whole corpus, not just span-eligible docs. One extra doc-grain
    * aggregate and a source-grain rollup on top of the span plan —
    * same linear class. */
  def corpusDupRate(spark: SparkSession, dir: String, gramLen: Int = 5)
      : DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val tok = docsTokOf(docs).select(col("doc_id"), col("source"),
      size(col("toks")).cast("long").as("n_toks"))
    val dup = dedupSubstringOf(docs, gramLen)
      .groupBy("doc_id")
      .agg(sum(col("span_end") - col("span_start")).as("dup_toks"))
    tok.join(dup, Seq("doc_id"), "left")
      .na.fill(0L, Seq("dup_toks"))
      .groupBy("source")
      .agg(sum("n_toks").as("total_tokens"),
        sum("dup_toks").as("dup_tokens"),
        count(lit(1)).as("n_docs"),
        count(when(col("dup_toks") > 0, lit(1))).as("n_docs_with_dups"))
      .select(col("source"), col("total_tokens"), col("dup_tokens"),
        col("n_docs"), col("n_docs_with_dups"),
        round(col("dup_tokens").cast("double") / col("total_tokens"), 6)
          .as("dup_rate"))
      .orderBy("source")
  }

  /** Boilerplate share per document (the C4/RefinedWeb signal): the
    * fraction of a doc's distinct shingles whose corpus document
    * frequency exceeds `commonDf` — high share ⇒ the doc is mostly
    * template/navigation text repeated across the crawl. Shape at
    * scale: one shingle-grain aggregate for the DF table, one
    * shingle-grain equi-join back, one doc-grain rollup — all linear
    * in total shingle count, no pairwise anything. (If the common-
    * shingle set (df > commonDf) is known to be small it could be
    * broadcast instead of joined, but boilerplate-heavy crawls are
    * exactly where it is NOT small, so the shuffle join is the honest
    * default.) Counts are integers and the ratio is rounded — fully
    * hash-checkable; Spark joins 64-bit shingle hashes while the
    * oracle joins raw strings, so agreement doubles as a collision
    * check. Docs under 3 tokens have no shingles and are excluded on
    * both sides. */
  def textNovelty(spark: SparkSession, dir: String, commonDf: Int = 2)
      : DataFrame =
    textNoveltyOf(Tables.fanOut(Tables.load(spark, dir, "documents")),
      commonDf)

  /** DataFrame-parameterized core of [[textNovelty]] (the Scale harness
    * runs it over replicated corpora). */
  def textNoveltyOf(docs: DataFrame, commonDf: Int = 2): DataFrame = {
    val sh = shingleSetsOf(docs)
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh_h"))
    val df = sh.groupBy("sh_h").agg(count(lit(1)).as("df"))
    sh.join(df, "sh_h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"),
        count(when(col("df") > commonDf, lit(1))).as("n_common"))
      .select(col("doc_id"), col("n_sh"), col("n_common"),
        round(lit(1) - col("n_common").cast("double") / col("n_sh"), 6)
          .as("novelty"))
      .orderBy("doc_id")
  }

  /** Edit-distance near-dup pairs: candidates share ≥ `minShared`
    * (capped) 3-gram shingles — the same bounded postings-list
    * generation as [[dedupNgram]], never an all-pairs product — then
    * the O(L²) Levenshtein DP runs ONLY on candidate pairs, gated by
    * the free necessary-condition prefilter dist ≥ |len₁ − len₂| (a
    * pure length comparison that prunes before any DP work; it cannot
    * change the result set, so the oracle omits it). A pair is a
    * near-dup when the edit distance is within `maxRel` of the longer
    * text. Catches small-patch duplication (timestamps, typo fixes,
    * template fills) that token-set Jaccard under-weights and
    * byte-exact dedup misses entirely.
    *
    * `minShared` is PART OF THE CONTRACT (mirrored in the oracle, the
    * dedupNgram DF-cap honesty pattern) because it is what keeps the
    * DP affordable: at sf0.1, ≥1 shared shingle admits 1.13M candidate
    * pairs; ≥3 admits 10.3k, and every true ≤20 %-distance pair in the
    * fixture shares ≥8 shingles — near-dup texts share many shingles
    * by nature, so the floor trims coincidental single-shingle overlap
    * without touching real hits. Integer DP — bit-identical across
    * engines, so the key is fully hash-checkable (Spark joins 64-bit
    * shingle hashes, the oracle joins raw strings: agreement doubles
    * as a collision check). */
  def dedupLevenshtein(spark: SparkSession, dir: String,
      maxRel: Double = 0.2, minShared: Int = 3,
      maxShingleDf: Int = 1000): DataFrame =
    dedupLevenshteinOf(Tables.fanOut(Tables.load(spark, dir, "documents")),
      maxRel, minShared, maxShingleDf)

  /** Shared-shingle candidate pairs with their shared-count — the
    * bounded generation stage of [[dedupLevenshtein]], exposed so the
    * Scale harness can measure candidate growth (cap/floor binding)
    * without paying for the DP verify stage. */
  private[graft] def levCandidates(docs: DataFrame,
      maxShingleDf: Int = 1000): DataFrame = {
    val sh = shingleSetsOf(docs)
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh_h"))
    val postings = sh.groupBy("sh_h")
      .agg(array_sort(collect_list(col("doc_id"))).as("docs"))
      .filter(size(col("docs")).between(2, maxShingleDf))
      .select("docs")
    orderedPairs(postings, "docs", "d1", "d2")
      .groupBy("d1", "d2").agg(count(lit(1)).as("n_shared"))
  }

  /** DataFrame-parameterized core of [[dedupLevenshtein]]. */
  def dedupLevenshteinOf(docs: DataFrame,
      maxRel: Double = 0.2, minShared: Int = 3,
      maxShingleDf: Int = 1000): DataFrame =
    levVerify(
      levCandidates(docs, maxShingleDf)
        .filter(col("n_shared") >= minShared),
      docs, maxRel)

  /** [[dedupLevenshteinOf]] with STAR-BOUNDED candidate expansion —
    * the [[dedupNgramStarOf]] construction applied to the edit-
    * distance family: per-posting double-star edges above `allPairCap`
    * (O(df), never O(df²)), exact all-pairs under it, then the
    * `minShared` floor RE-DERIVED on the bounded candidate set by
    * joining back to the capped posting table (star edges span a
    * posting but do not enumerate every co-occurrence, so the shared
    * count must come from the postings, not the expansion — the
    * [[verifyJaccard]] common-count shape). At fixture document
    * frequencies (max 25 < the 32 cap) candidates, shared counts and
    * the verified pair set are identical to [[dedupLevenshteinOf]]'s
    * (StarShingleSpec pins it), so the key runs under the same DuckDB
    * hash gate; above the cap completeness relaxes to the spanning
    * guarantee while every emitted pair stays exact. */
  def dedupLevenshteinStarOf(docs: DataFrame,
      maxRel: Double = 0.2, minShared: Int = 3, allPairCap: Int = 32,
      maxShingleDf: Int = 1000): DataFrame = {
    val cand = starCommonCounts(
        cappedPostings(docs, maxShingleDf).localCheckpoint(), allPairCap)
      .filter(col("common") >= minShared)
      .select("d1", "d2")
    levVerify(cand, docs, maxRel)
  }

  /** Table-loading wrapper of [[dedupLevenshteinStarOf]]. */
  def dedupLevenshteinStar(spark: SparkSession, dir: String,
      maxRel: Double = 0.2, minShared: Int = 3, allPairCap: Int = 32,
      maxShingleDf: Int = 1000): DataFrame =
    dedupLevenshteinStarOf(Tables.fanOut(Tables.load(spark, dir, "documents")),
      maxRel, minShared, allPairCap, maxShingleDf)

  /** The DP verify stage shared by the exact and star-bounded
    * edit-distance forms: length prefilter (a free necessary condition
    * — dist ≥ |len₁−len₂| — that cannot change the result set), then
    * the BANDED Levenshtein DP on surviving candidates only: the
    * 3-arg `levenshtein(t1, t2, k)` walks only the ±k diagonal band
    * (O(L·k) cells, early exit on -1) instead of the full O(L²)
    * table. Exactness is free: `dist` is an integer, so
    * `dist ≤ maxlen·maxRel ⟺ dist ≤ ⌊maxlen·maxRel⌋`, and the banded
    * form returns the exact distance whenever it is ≤ k — the
    * surviving rows carry the identical dist the full DP would. */
  private def levVerify(cand: DataFrame, docs: DataFrame,
      maxRel: Double): DataFrame = {
    val t1 = docs.select(col("doc_id").as("d1"), col("text").as("t1"))
    val t2 = docs.select(col("doc_id").as("d2"), col("text").as("t2"))
    cand.join(t1, "d1").join(t2, "d2")
      .withColumn("maxlen", greatest(length(col("t1")), length(col("t2"))))
      .filter(abs(length(col("t1")) - length(col("t2")))
        <= col("maxlen") * maxRel)
      .withColumn("dist", expr(
        s"levenshtein(t1, t2, cast(maxlen * $maxRel as int))"))
      .filter(col("dist") >= 0 && col("dist") <= col("maxlen") * maxRel)
      .select(col("d1"), col("d2"), col("dist").cast("long").as("dist"),
        round(col("dist").cast("double") / col("maxlen"), 6)
          .as("rel_dist"))
      .orderBy("d1", "d2")
  }

  /** MinHash + LSH near-dup (public banding construction: Broder '97 /
    * MMDS ch.3): 32 hash slots from xxhash64(shingle ⊕ slot), 8 bands × 4
    * rows; band-equal docs are candidates; exact Jaccard verifies.
    * No SQL oracle (hash functions differ across engines) — rows-only. */
  def dedupMinhash(spark: SparkSession, dir: String,
      threshold: Double = 0.3, nHashes: Int = 32, bands: Int = 8)
      : DataFrame =
    dedupMinhashOf(Tables.fanOut(Tables.load(spark, dir, "documents")),
      threshold, nHashes, bands)

  /** DataFrame-parameterized core of [[dedupMinhash]] — the composed
    * curation pipeline ([[TextQuality.curateFullOf]]) runs it over the
    * canonical-dedup survivors rather than the raw table. */
  def dedupMinhashOf(docs: DataFrame,
      threshold: Double = 0.3, nHashes: Int = 32, bands: Int = 8)
      : DataFrame = {
    val sh = shingleHashesOf(docs)
    val buckets = bandBucketsOf(sh, nHashes, bands)
    val cand = buckets.as("x")
      .join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    verifyJaccard(cand, sh, threshold)
  }

  /** Spanning candidate pairs from band buckets with BOUNDED in-bucket
    * expansion — the CLUSTER-consumer form of banding's candidate
    * stage. [[dedupMinhashOf]]'s all-i<j expansion is the right
    * contract when the OUTPUT is the pair set, but it is O(B²) inside
    * one (band, bucket): a boilerplate-heavy crawl corpus can land B ≈
    * 10⁴⁺ near-identical docs in one bucket and emit B²/2 candidates —
    * the one genuine scale-killer in the dedup family. Connectivity
    * (what transitive-closure clustering consumes) only needs a
    * SPANNING set per bucket, so here buckets above `allPairCap` emit
    * STAR edges rooted at the bucket-minimum doc — O(B) per bucket —
    * while buckets at-or-under the cap keep the exact all-pairs form
    * (so at fixture scale, where the observed max bucket is single-
    * digit, the pair set — and every downstream hash — is unchanged).
    *
    * Degenerate-root robustness (the r14 ADVICE follow-up): an
    * over-cap bucket emits a DOUBLE star — edges from the bucket's
    * lowest AND second-lowest doc (2B−3 distinct edges, still O(B)).
    * A single star rooted at a CHANCE collider (a minimum that
    * verifies against nothing) would disconnect the bucket's true
    * near-dups from each other; with two independent roots, losing
    * all connectivity needs BOTH roots to be chance colliders in the
    * SAME bucket while the pair also misses its other 7 bands — each
    * band collision at j < 0.3 is < 1 % to begin with, so the failure
    * odds drop from p·(band miss)⁷ to p²·(band miss)⁷. The
    * `dedup_minhash_recall` contract pins catch = ALL on the driver
    * fixtures. Window-min/count (not collect_list) on purpose: a
    * degenerate bucket must never materialize as ONE array cell — the
    * window sorter spills; a 10⁷-doc array row would OOM the executor.
    */
  private[graft] def starCandidates(buckets: DataFrame,
      allPairCap: Int = 32): DataFrame =
    starEdges(buckets, Seq("band", "bh"), allPairCap)

  /** The generic bounded candidate expansion behind [[starCandidates]]
    * (minhash band buckets — unbounded group sizes, so no array may
    * materialize): rows are
    * (keys…, doc_id) group memberships; groups at-or-under
    * `allPairCap` emit exact all-i<j pairs (so fixture-scale outputs
    * — and every downstream hash — match the unbounded forms), groups
    * above it emit the double star described at [[starCandidates]].
    * Bounded-group families (the DF-capped shingle postings) use the
    * cheaper array form [[arrayStarPairs]] instead — this window form
    * exists for families whose group sizes are unbounded. */
  private[graft] def starEdges(rows: DataFrame, keys: Seq[String],
      allPairCap: Int = 32): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    val ann = rows
      .withColumn("mn", min("doc_id").over(w))
      .withColumn("mn2",
        min(when(col("doc_id") =!= col("mn"), col("doc_id"))).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(col("cnt") >= 2)
    val small = ann.filter(col("cnt") <= allPairCap)
      .select((keys :+ "doc_id").map(col): _*)
    val smallPairs = small.as("x").join(small.as("y"),
        keys.map(k => col(s"x.$k") === col(s"y.$k")).reduce(_ && _) &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
    val big = ann.filter(col("cnt") > allPairCap)
    val root1 = big.filter(col("doc_id") =!= col("mn"))
      .select(col("mn").as("d1"), col("doc_id").as("d2"))
    val root2 = big.filter(col("doc_id") =!= col("mn2"))
      .select(least(col("mn2"), col("doc_id")).as("d1"),
        greatest(col("mn2"), col("doc_id")).as("d2"))
    smallPairs.union(root1).union(root2).distinct()
  }

  /** [[dedupMinhashOf]] with star-bounded candidate expansion
    * ([[starCandidates]]) — the form every transitive-closure consumer
    * ([[Cluster.dedupClusterMinhash]], [[TextQuality.curateFullOf]])
    * routes through. Identical banding + exact-Jaccard verify; only
    * the in-bucket candidate combinatorics differ, and only for
    * buckets above `allPairCap`. */
  def dedupMinhashStarOf(docs: DataFrame, threshold: Double = 0.8,
      nHashes: Int = 32, bands: Int = 8, allPairCap: Int = 32)
      : DataFrame = {
    val sh = shingleHashesOf(docs)
    verifyJaccard(
      starCandidates(bandBucketsOf(sh, nHashes, bands), allPairCap),
      sh, threshold)
  }

  /** Table-loading wrapper of [[dedupMinhashStarOf]]. */
  def dedupMinhashStar(spark: SparkSession, dir: String,
      threshold: Double = 0.8, nHashes: Int = 32, bands: Int = 8,
      allPairCap: Int = 32): DataFrame =
    dedupMinhashStarOf(Tables.fanOut(Tables.load(spark, dir, "documents")),
      threshold, nHashes, bands, allPairCap)

  /** (doc_id, sh_h): each doc's distinct shingles hashed ONCE — the 32
    * minhash streams then hash the 8-byte value instead of re-hashing a
    * ~25-byte string 32 times (same independence, ~4× less hashing work
    * per shingle). This is also the POSTING table the incremental index
    * persists ([[MinhashIndex]]): per-doc rows, so a filtered doc set
    * yields exactly the full set's rows for those docs. */
  private[graft] def shingleHashesOf(docs: DataFrame): DataFrame =
    shingleSetsOf(docs)
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh_h"))

  /** (doc_id, band, bh): LSH band buckets of each doc's nHashes-slot
    * minhash signature (bands × rows banding). Per-doc aggregation —
    * signatures of a doc subset equal the full corpus run's, which is
    * what makes incremental index maintenance EXACT (no drift, unlike
    * frozen-centroid IVF). */
  private[graft] def bandBucketsOf(sh: DataFrame,
      nHashes: Int = 32, bands: Int = 8): DataFrame = {
    val rows = nHashes / bands
    val minhashes = (0 until nHashes).map(i =>
      min(xxhash64(col("sh_h"), lit(i))).as(s"h$i"))
    val sig = sh.groupBy("doc_id").agg(minhashes.head, minhashes.tail: _*)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((b * rows until (b + 1) * rows).map(i => col(s"h$i")): _*)
          .as("bh"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bh"))
  }

  /** Exact-Jaccard verification of candidate pairs (d1 < d2) against a
    * posting table (doc_id, sh_h): emits (d1, d2, jaccard ≥ threshold),
    * rounded for engine parity, totally ordered. Candidate side is the
    * small one — two hash joins against the postings, then a pair-grain
    * aggregation. */
  private[graft] def verifyJaccard(cand: DataFrame, sh: DataFrame,
      threshold: Double): DataFrame = {
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val common = cand
      .join(sh.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sh.as("s2"), col("d2") === col("s2.doc_id") &&
        col("s1.sh_h") === col("s2.sh_h"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("common"))
    common
      .join(counts.as("c1"), col("d1") === col("c1.doc_id"))
      .join(counts.as("c2"), col("d2") === col("c2.doc_id"))
      .select(col("d1"), col("d2"),
        round(col("common").cast("double") /
          (col("c1.n_sh") + col("c2.n_sh") - col("common")), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("d1", "d2")
  }

  /** SimHash near-dup: 64-bit signature per doc (native expression),
    * 4×16-bit chunk LSH for candidates (pigeonhole: hamming ≤ 3 ⇒ some
    * chunk equal), exact Hamming verify. No SQL oracle. */
  def dedupSimhash(spark: SparkSession, dir: String, maxHamming: Int = 3)
      : DataFrame = {
    // fanOut: the 64-lane simhash fold is heavy per-row CPU on a
    // one-split scan (r20 measured ×0.72 with it)
    val sigs = docsTokOf(
        Tables.fanOut(Tables.load(spark, dir, "documents")))
      .select(col("doc_id"), simhash64(col("toks")).as("sig"))
    val chunks = sigs.select(col("doc_id"), col("sig"),
        explode(array((0 until 4).map(k =>
          struct(lit(k).as("k"),
            shiftright(col("sig"), k * 16).bitwiseAND(0xFFFFL)
              .as("chunk"))): _*)).as("c"))
      .select(col("doc_id"), col("sig"), col("c.k"), col("c.chunk"))
    chunks.as("x")
      .join(chunks.as("y"),
        col("x.k") === col("y.k") && col("x.chunk") === col("y.chunk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("d1", "d2")
  }

  /** Embedding near-dup: label-blocked candidate pairs, exact cosine via
    * the native expression, rounded for engine parity. (Threshold sits at
    * the ≈99.9th percentile of the synthetic corpus' within-label cosine —
    * real near-dup corpora would use ~0.9+.) */
  def dedupEmbedding(spark: SparkSession, dir: String,
      threshold: Double = 0.35): DataFrame = {
    // fanOut: per-pair cosine is the cost and embeddings is one split
    val e = Tables.fanOut(Tables.load(spark, dir, "embeddings"))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"),
        round(cosine_sim(col("a.embedding"), col("b.embedding")), 4)
          .as("cos"))
      .filter(col("cos") >= threshold)
      .orderBy("v1", "v2")
  }

  /** SemDeDup-style semantic dedup (Abbas et al. '23, arXiv:2303.09540):
    * partition the corpus into k centroid cells, then mark as duplicate
    * any document whose cosine to an EARLIER in-cell document clears the
    * threshold — keep-first-seen, the policy every dedup key here uses.
    * Distinct from [[dedupEmbeddingAnn]]: cells are semantic Voronoi
    * regions (every doc lands in exactly ONE cell, so the candidate set
    * is a partition, not overlapping LSH buckets), which is what lets
    * the paper prune aggressively inside semantically-coherent regions.
    *
    * Determinism/oracle parity: centroids are the embeddings of the k
    * lowest vec_ids (deterministic seeding — Lloyd iterations would put
    * float accumulation order into the centroids and break cross-engine
    * parity; with real k-means the plan shape below is unchanged,
    * centroids are still a broadcast model). Assignment ranks on the
    * ROUNDED cosine with cid as tie-break, the [[textTfidf]] rounded-
    * ranking convention. Output is doc-grain (vec_id, cluster, is_dup).
    *
    * Shape at scale: assignment is a broadcast nested-loop over k
    * model rows — one corpus scan, no shuffle (the [[Ivf]] assignment
    * shape); the dup check shuffles once on the cell id and joins
    * earlier-vs-later INSIDE cells only. In-cell pair work is O(C²) per
    * cell by the paper's own construction; the control is k ∝ corpus
    * (cells stay ~corpus/k docs), exactly how SemDeDup runs at scale
    * (the paper uses 50k clusters on LAION). */
  def dedupSemantic(spark: SparkSession, dir: String, k: Int = 8,
      threshold: Double = 0.35): DataFrame =
    dedupSemanticOf(Tables.load(spark, dir, "embeddings"), k, threshold)

  /** [[dedupSemantic]]'s core over any (vec_id, embedding) frame:
    * deterministic lowest-vec_id seeding (the oracle-exact form). */
  def dedupSemanticOf(e: DataFrame, k: Int = 8,
      threshold: Double = 0.35): DataFrame =
    semanticCells(e,
      e.filter(col("vec_id") < k)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec")),
      threshold)

  /** The PRODUCTION form of [[dedupSemantic]]: cells from real Lloyd
    * k-means (the [[Ivf]] trainer — deterministic by its exact-decimal
    * means, but iteration makes it SQL-inexpressible, so the key is
    * rows-only and [[Contracts.dedupSemanticRecall]] hash-gates it on
    * planted exact twins: an identical vector lands in the SAME cell
    * under ANY centroid model, so a missed twin can only mean the
    * assignment → cell-pair → flag pipeline broke). Trained cells track
    * the data's actual density instead of the first k docs' happenstance
    * — the SemDeDup paper's own configuration. */
  def dedupSemanticKmeans(spark: SparkSession, dir: String, k: Int = 8,
      iters: Int = 3, threshold: Double = 0.35): DataFrame =
    dedupSemanticKmeansOf(Tables.load(spark, dir, "embeddings"),
      k, iters, threshold)

  /** [[dedupSemanticKmeans]]'s core over any (vec_id, embedding)
    * frame (the recall contract runs it twin-augmented). */
  def dedupSemanticKmeansOf(e: DataFrame, k: Int = 8, iters: Int = 3,
      threshold: Double = 0.35): DataFrame =
    semanticCells(e, Ivf.trainCentroids(e, k, iters, seed = 7L),
      threshold)

  /** Shared cell-dedup core: assign every vector to its best cell via
    * the [[Ivf]] max_by shape — map-side partial argmax, so only one
    * (cid, embedding) row per vector reaches the shuffle (a row_number
    * window here would shuffle the full corpus×k expansion to sort
    * each vec_id group). Argmax ranks on the ROUNDED cosine with
    * lowest-cid tie-break, mirroring the oracle's ORDER BY exactly;
    * then keep-first-seen inside each cell at the threshold. */
  private def semanticCells(e: DataFrame, cents: DataFrame,
      threshold: Double): DataFrame = {
    val best = assignCells(e, cents)
    cellDupFlags(best, best, threshold).orderBy("vec_id")
  }

  /** The assignment half of [[semanticCells]]: best cell per vector
    * under the broadcast centroid model — (vec_id, embedding, cid).
    * Exposed to [[SemanticIndex]], whose O(delta) maintenance assigns
    * ONLY a delivery's vectors under frozen centroids. */
  private[query] def assignCells(e: DataFrame, cents: DataFrame)
      : DataFrame =
    e.crossJoin(broadcast(cents))
      .withColumn("ccos",
        round(cosine_sim(col("embedding"), col("cvec")), 4))
      .groupBy("vec_id")
      .agg(max_by(struct(col("cid"), col("embedding")),
        struct(col("ccos"), -col("cid"))).as("m"))
      .select(col("vec_id"), col("m.embedding").as("embedding"),
        col("m.cid").as("cid"))

  /** The keep-first-seen half: flag each row of `cells` a duplicate
    * iff some EARLIER row of `earlier` (same cell, smaller vec_id)
    * clears the threshold — (vec_id, cluster, is_dup), unordered
    * (callers sort). Passing the same frame twice is the one-shot
    * form; [[SemanticIndex]] passes (delta, base ∪ delta) so the
    * pair work is O(delta × cell), never O(corpus²). */
  private[query] def cellDupFlags(cells: DataFrame, earlier: DataFrame,
      threshold: Double): DataFrame = {
    val dup = cells.as("a").join(earlier.as("b"),
        col("a.cid") === col("b.cid") &&
          col("b.vec_id") < col("a.vec_id") &&
          round(cosine_sim(col("a.embedding"), col("b.embedding")), 4)
            >= threshold)
      .select(col("a.vec_id")).distinct()
    cells.join(dup.withColumn("hit", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid").cast("long").as("cluster"),
        coalesce(col("hit"), lit(false)).as("is_dup"))
  }

  /** Embedding near-dup WITHOUT label blocking — the fallback
    * [[dedupEmbedding]] needs when no blocking key exists or labels are
    * skewed: candidates come from multi-table hyperplane LSH buckets
    * (postings-list expansion, like [[dedupNgram]]), then exact cosine
    * verifies. Every emitted pair is exact (precision 1); recall is the
    * LSH collision probability, which approaches 1 for true near-dups
    * (cosine → 1 means signatures agree on every table) and is tuned by
    * `nTables` for looser thresholds. `maxBucket` caps the per-bucket
    * pair blowup exactly like dedupNgram's DF cap. No SQL oracle
    * (engine-specific signatures). */
  def dedupEmbeddingAnn(spark: SparkSession, dir: String,
      threshold: Double = 0.35, nPlanes: Int = 8, nTables: Int = 8,
      maxBucket: Int = 10000, seed: Long = 7L): DataFrame =
    dedupEmbeddingAnnOf(Tables.load(spark, dir, "embeddings"),
      threshold, nPlanes, nTables, maxBucket, seed)

  /** DataFrame-parameterized core of [[dedupEmbeddingAnn]] (the
    * contract key [[Contracts.dedupEmbeddingAnnRecall]] runs it over a
    * twin-augmented corpus). */
  /** (vec_id, t, bucket): each vector's multi-table hyperplane LSH
    * buckets — a PER-VECTOR computation, so an incrementally-built
    * bucket table is bit-identical to a from-scratch one at any
    * number of deliveries (the minhash-exactness argument;
    * [[EmbeddingIndex]] persists exactly this table). */
  private[graft] def annBuckets(e: DataFrame, nPlanes: Int,
      nTables: Int, seed: Long): DataFrame = {
    val tableSig = (0 until nTables).map(t =>
      struct(lit(t).as("t"),
        hyperplane_signature(col("embedding"), nPlanes, seed + t)
          .as("bucket")))
    e.select(col("vec_id"), explode(array(tableSig: _*)).as("tb"))
      .select(col("vec_id"), col("tb.t").as("t"), col("tb.bucket")
        .as("bucket"))
  }

  def dedupEmbeddingAnnOf(e: DataFrame,
      threshold: Double = 0.35, nPlanes: Int = 8, nTables: Int = 8,
      maxBucket: Int = 10000, seed: Long = 7L): DataFrame = {
    val bucketed = annBuckets(e, nPlanes, nTables, seed)
    val postings = bucketed.groupBy("t", "bucket")
      .agg(array_sort(collect_list(col("vec_id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    val cand = orderedPairs(postings, "ids", "v1", "v2").distinct()
    cand
      .join(e.select(col("vec_id").as("v1"), col("embedding").as("e1")),
        "v1")
      .join(e.select(col("vec_id").as("v2"), col("embedding").as("e2")),
        "v2")
      .select(col("v1"), col("v2"),
        round(cosine_sim(col("e1"), col("e2")), 4).as("cos"))
      .filter(col("cos") >= threshold)
      .orderBy("v1", "v2")
  }

  /** Benchmark decontamination: flag training docs sharing ≥
    * `minOverlap` distinct n-gram shingles with any eval-set document —
    * the standard guard against test-set leakage into a pretraining
    * corpus. The eval set here is a deterministic slice (doc_id % 50 =
    * 0, standing in for an external benchmark file). Shape at scale:
    * eval shingles are tiny next to the corpus (benchmarks are MBs,
    * corpora are TBs) → broadcast them; the corpus side streams through
    * one scan + one hash aggregation on (train_doc, eval_doc). Shingle
    * keys are 64-bit hashes (collision odds ~n²/2⁶⁵, immaterial); the
    * oracle joins the raw strings — agreement doubles as a collision
    * check. */
  def decontaminate(spark: SparkSession, dir: String, n: Int = 4,
      minOverlap: Int = 2): DataFrame =
    decontaminateOf(Tables.fanOut(Tables.load(spark, dir, "documents")), n,
      minOverlap)

  /** Driver key `decontaminate_semantic`: eval-set contamination at
    * the EMBEDDING level — the modern complement to the n-gram
    * [[decontaminate]] (paraphrased or translated eval leakage shares
    * no n-grams but sits at high cosine; the two are run together in
    * practice, n-gram for verbatim, semantic for re-worded). Eval set
    * = `vec_id % 97 == 0` (the held-out-suite convention of
    * [[decontaminateOf]]'s `% 50`); a corpus vector within cosine
    * `threshold` of ANY eval vector is contaminated, reported per
    * (corpus, eval) hit with the rounded cosine.
    *
    * Scale shape: the eval side is a broadcast model frame — eval
    * suites are thousands of rows where the corpus is billions, so the
    * corpus-side scan × |eval| comparisons is the honest brute-force
    * bound ([[similarityTopk]]'s sanctioned BNLJ class); at very large
    * eval suites the same pairing rides [[EmbeddingIndex]]'s LSH
    * buckets, the ANN path every embedding operator here shares. */
  def decontaminateSemantic(spark: SparkSession, dir: String,
      threshold: Double = 0.35): DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
    decontaminateSemanticOf(e.filter(col("vec_id") % 97 =!= 0),
      e.filter(col("vec_id") % 97 === 0)
        .select(col("vec_id").as("eval_id"),
          col("embedding").as("ev")),
      threshold)
  }

  /** [[decontaminateSemantic]]'s core over any corpus/eval frames —
    * the planted-leak spec path. */
  def decontaminateSemanticOf(corpus: DataFrame, evalSet: DataFrame,
      threshold: Double = 0.35): DataFrame =
    corpus.crossJoin(broadcast(evalSet))
      .select(col("vec_id"), col("eval_id"),
        round(cosine_sim(col("embedding"), col("ev")), 4).as("cos"))
      .filter(col("cos") >= threshold)
      .orderBy("vec_id", "eval_id")

  /** [[decontaminate]]'s core over any (doc_id, text) frame (the
    * scaled-copy harness [[graft.Scale]] runs it on replicated
    * corpora). */
  def decontaminateOf(docs: DataFrame, n: Int = 4,
      minOverlap: Int = 2): DataFrame = {
    val sh = docs
      .withColumn("toks", tokens(col("text")))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), explode(shingles(col("toks"), n)).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("sh_h"))
    val evalSh = sh.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("eval_doc_id"), col("sh_h"))
    val trainSh = sh.filter(col("doc_id") % 50 =!= 0)
    trainSh.join(broadcast(evalSh), "sh_h")
      .groupBy("doc_id", "eval_doc_id")
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
      .orderBy("doc_id", "eval_doc_id")
  }

  /** Per-vector int8 quantization (min/max affine): the 4× storage cut
    * a 100 TB embedding store takes before ANN indexing. Scale factors
    * travel with the row, so dequantization is row-local. All math in
    * double with floor (not round — rounding-mode-portable across
    * engines); the digest column makes the full quantized array
    * hash-checkable against DuckDB's identical list algebra. Pure
    * projected scan — no shuffle. */
  def embedQuantize(spark: SparkSession, dir: String): DataFrame = {
    val lo = array_min(col("embedding")).cast("double")
    val hi = array_max(col("embedding")).cast("double")
    // constant vector (hi == lo) would divide by zero — null in Spark,
    // inf in DuckDB → silent oracle divergence; both sides map it to 0
    val q = transform(col("embedding"), x =>
      when(hi === lo, lit(0L)).otherwise(
        least(lit(255L), floor((x.cast("double") - lo) / (hi - lo) * 256)))
        .cast("int"))
    Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        round(lo, 6).as("qmin"), round(hi, 6).as("qmax"),
        md5(concat_ws(" ", transform(q, _.cast("string"))))
          .as("q_digest"))
      .orderBy("vec_id")
  }

  // ---------------------------------------------------------- similarity

  /** B16 baseline: brute-force cosine top-k for a fixed query set
    * (vec_id < 10). The query side is tiny → broadcast; the corpus is
    * scanned once; per-query top-k via window on the rounded score. */
  def similarityTopk(spark: SparkSession, dir: String, k: Int = 5)
      : DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine_sim(col("qv"), col("embedding")), 4).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
      .orderBy("query_id", "rank")
  }

  /** B16 scale path: multi-table multi-probe hyperplane LSH (Charikar
    * STOC'02 signatures; multi-probe per Lv et al., VLDB'07 — both public
    * constructions). `nTables` independent signature tables (seeds
    * `seed+t`); every vector lands in one bucket per table; each query
    * probes its own bucket plus all buckets within Hamming distance
    * `probeRadius` in every table; candidates are the union across
    * tables, then exact cosine ranks them.
    *
    * Tuning is the standard LSH trade: more planes ⇒ more selective
    * buckets (keyspace `nTables · 2^nPlanes`); more tables/probes ⇒
    * recall. The defaults hit recall ≥ 0.9 vs the [[similarityTopk]]
    * brute-force baseline on the test corpus (asserted in
    * LshRecallSpec), whose true neighbors are FAR (cosine 0.26–0.49 —
    * near-orthogonal synthetic data, the hard case for LSH). At 100 TB
    * one would raise `nPlanes` toward 20+ (selectivity) and re-tune
    * tables/probes against a recall budget; the plan shape — bucket
    * equi-join, no full scan per query — is unchanged. No SQL oracle
    * (signatures are engine-specific). */
  def similarityLsh(spark: SparkSession, dir: String, k: Int = 5,
      nPlanes: Int = 10, nTables: Int = 8, probeRadius: Int = 3,
      seed: Long = 7L): DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")

    // one (table, bucket) row per vector per table
    val tableSig = (0 until nTables).map(t =>
      struct(lit(t).as("t"),
        hyperplane_signature(col("embedding"), nPlanes, seed + t)
          .as("bucket")))
    val corpus = e.select(col("vec_id"), col("embedding"),
        explode(array(tableSig: _*)).as("tb"))
      .select(col("vec_id"), col("embedding"), col("tb.t"), col("tb.bucket"))

    // all XOR masks with ≤ probeRadius bits set (1 + C(b,1) + ... )
    val masks: Seq[Long] = 0L +: (1 to probeRadius).flatMap(r =>
      (0 until nPlanes).combinations(r).map(_.map(1L << _).sum))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        explode(array(tableSig: _*)).as("tb"))
      .select(col("query_id"), col("qv"), col("tb.t"),
        explode(array(masks.map(m =>
          col("tb.bucket").bitwiseXOR(lit(m))): _*)).as("probe"))

    // candidate union across tables, then exact verify + top-k
    val cand = corpus.join(broadcast(q),
        corpus("t") === q("t") && col("bucket") === col("probe") &&
          col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("qv"), col("embedding"))
      .distinct()
    val scored = cand.select(col("query_id"), col("neighbor_id"),
      round(cosine_sim(col("qv"), col("embedding")), 4).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
      .orderBy("query_id", "rank")
  }
}
