package graft.query

import graft.{SparkSuite, TestSpark}

/** Dedup family invariants over the real fixture corpus. */
class TextSimSpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  test("dedup_exact: result keys are unique and never exceed the corpus") {
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val out = TextSim.dedupExact(spark, dir).cache()
    try {
      assert(out.count() === out.select("doc_id").distinct().count())
      assert(out.count() <= docs.count())
    } finally out.unpersist()
  }

  test("dedup_canonical: re-cased/re-punctuated copies share one canonical hash") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val variants = Seq(
      "Hello,  World!", "hello world", "HELLO   WORLD.", "hello-world",
      "a different document").toDF("text")
      .select(TextSim.canonicalMd5(col("text")).as("h"))
      .as[String].collect().toSeq
    assert(variants.take(4).distinct.size === 1,
      "normalization variants must collapse to one hash")
    assert(variants(4) !== variants.head)
    // empty-canonical fallback: docs with no [a-z0-9] content must NOT
    // collapse together — they fall back to byte-identity hashing
    val symbolic = Seq("!!!", "???", "!!!").toDF("text")
      .select(TextSim.canonicalMd5(col("text")).as("h"))
      .as[String].collect().toSeq
    assert(symbolic(0) !== symbolic(1),
      "different non-alnum docs must not share a canonical hash")
    assert(symbolic(0) === symbolic(2))
    // fixture invariant: canonical dedup absorbs at least as many rows
    // as byte-exact dedup (every exact dup is also a canonical dup)
    val exactN = TextSim.dedupExact(spark, dir).count()
    val canonN = TextSim.dedupCanonical(spark, dir).count()
    assert(canonN <= exactN)
  }

  test("dedup_substring: planted duplicated spans are found, merged " +
      "maximally, and unique text yields nothing") {
    import spark.implicits._
    // doc 1 and 2 share a 7-token run (≥ gramLen=5) mid-document; doc 3
    // is byte-unique AND shares no 5-gram with anything
    val shared = "alpha bravo charlie delta echo foxtrot golf"
    val twin = "hotel india juliett kilo lima mike november oscar"
    val docs = Seq(
      (1L, s"one two $shared three four"),
      (2L, s"nine ten eleven $shared twelve"),
      (3L, "completely different words with no overlap at all here"),
      // byte-identical twins: EVERY gram repeats → one whole-doc span
      (4L, twin), (5L, twin))
      .toDF("doc_id", "text")
    val out = TextSim.dedupSubstringOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1: shared run = tokens [2, 9) → grams at starts 2,3,4 → one
    // merged span [2, 9); doc 2: tokens [3, 10) → one span [3, 10);
    // docs 4/5: 8 tokens, grams at starts 0..3 all duplicated → [0, 8)
    assert(out.toSet === Set((1L, 2L, 9L, 3L), (2L, 3L, 10L, 3L),
      (4L, 0L, 8L, 4L), (5L, 0L, 8L, 4L)), s"got ${out.toSeq}")
    // fixture-wide invariants at the default gram length
    val fix = TextSim.dedupSubstring(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(fix.nonEmpty, "fixture corpus has exact dups; spans expected")
    fix.foreach { case (id, s, e, n) =>
      assert(e - s >= 5, s"doc $id span shorter than a gram")
      assert(n <= e - s - 5 + 1 && n >= 1, s"doc $id gram count impossible")
    }
    // spans within a doc are disjoint and strictly ordered (maximality)
    fix.groupBy(_._1).foreach { case (id, spans) =>
      spans.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) =>
          assert(s2 > e1, s"doc $id spans overlap — merge failed")
        case _ => ()
      }
    }
  }

  test("corpus_dup_rate ties out against the span output and raw token counts") {
    import org.apache.spark.sql.functions.{col, size}
    val dupByDoc = TextSim.dedupSubstring(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2) - r.getLong(1)))
      .groupBy(_._1).map { case (id, v) => id -> v.map(_._2).sum }
    val docMeta = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(TextSim.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val out = TextSim.corpusDupRate(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    val bySource = docMeta.groupBy(_._2)
    assert(out.keySet === bySource.keySet)
    bySource.foreach { case (src, docs) =>
      val total = docs.map(_._3).sum
      val dup = docs.map(d => dupByDoc.getOrElse(d._1, 0L)).sum
      val withDups = docs.count(d => dupByDoc.getOrElse(d._1, 0L) > 0)
      val (oTotal, oDup, oN, oWith, oRate) = out(src)
      assert((oTotal, oDup, oN, oWith) ===
        ((total, dup, docs.length.toLong, withDups.toLong)),
        s"source $src counters diverge from direct computation")
      assert(oDup <= oTotal && oWith <= oN, s"source $src impossible rate")
      assert(math.abs(oRate - dup.toDouble / total) < 1e-6, s"source $src rate")
    }
  }

  test("dedup_ngram: DF cap above the corpus max changes nothing; a tiny cap prunes candidates") {
    val base = TextSim.dedupNgram(spark, dir).collect().map(_.toString).sorted
    val highCap = TextSim.dedupNgram(spark, dir, maxShingleDf = 100000)
      .collect().map(_.toString).sorted
    assert(base === highCap)
    // a df cap of 1 keeps only shingles unique to one doc → no shared
    // shingles → no candidate pairs at all
    assert(TextSim.dedupNgram(spark, dir, maxShingleDf = 1).count() === 0)
  }

  test("dedup_minhash finds the high-jaccard pairs dedup_ngram confirms") {
    val exact = TextSim.dedupNgram(spark, dir, threshold = 0.5)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val banded = TextSim.dedupMinhash(spark, dir, threshold = 0.5)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    // banding is a candidate filter + the SAME exact verify, so at 0.5
    // jaccard (band collision prob ≈ 1-(1-0.5^4)^8 ≈ 0.42 per pair…)
    // every banded pair must be a true pair, and the high-sim pairs the
    // fixture plants (near-identical docs) must be recovered
    assert(banded.subsetOf(exact))
    val veryHigh = TextSim.dedupNgram(spark, dir, threshold = 0.9)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(veryHigh.subsetOf(banded))
  }

  test("dedup_embedding_ann: every emitted pair is a true >=threshold pair (precision 1)") {
    import org.apache.spark.sql.functions._
    import graft.functions.cosine_sim
    val e = graft.core.Tables.load(spark, dir, "embeddings")
    val truth = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"),
        round(cosine_sim(col("a.embedding"), col("b.embedding")), 4)
          .as("cos"))
      .filter(col("cos") >= 0.35)
      .select("v1", "v2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = TextSim.dedupEmbeddingAnn(spark, dir)
      .select("v1", "v2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ann.nonEmpty)
    assert(ann.subsetOf(truth))
    // and the unblocked path can see pairs label blocking cannot
    info(s"ann found ${ann.size}/${truth.size} unblocked pairs")
  }

  test("dedup_simhash: pairs are symmetric-free (d1 < d2) and within hamming bound") {
    val out = TextSim.dedupSimhash(spark, dir).collect()
    assert(out.forall(r => r.getLong(0) < r.getLong(1)))
    assert(out.forall(r => r.getAs[Number]("hamming").intValue() <= 3))
  }

  test("text_fingerprint: duplicate texts share fingerprints") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val dupTexts = docs.groupBy("text").count().filter(col("count") > 1)
    val nDupDocs = docs.join(dupTexts.select("text"), "text").count()
    val fp = TextSim.textFingerprint(spark, dir)
    val nDupFps = fp.groupBy("fingerprint").count()
      .filter(col("count") > 1)
      .agg(coalesce(sum("count"), lit(0L))).collect().head.getLong(0)
    // every exact duplicate text must produce a duplicate fingerprint
    assert(nDupFps >= nDupDocs)
  }

  test("dedup_levenshtein: distances match a reference DP; pairs well-formed") {
    val out = TextSim.dedupLevenshtein(spark, dir).collect()
    assert(out.nonEmpty, "fixture must contain edit-distance near-dups")
    val texts = graft.core.Tables.load(spark, dir, "documents")
      .select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // textbook Wagner–Fischer, two-row form — independent of both
    // Spark's and DuckDB's implementations
    def lev(a: String, b: String): Int = {
      var prev = (0 to b.length).toArray
      for (i <- 1 to a.length) {
        val cur = new Array[Int](b.length + 1)
        cur(0) = i
        for (j <- 1 to b.length)
          cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
            prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
      prev(b.length)
    }
    out.foreach { r =>
      val (d1, d2) = (r.getAs[Long]("d1"), r.getAs[Long]("d2"))
      assert(d1 < d2, s"pair ($d1, $d2) not ordered")
      val dist = r.getAs[Long]("dist")
      assert(dist === lev(texts(d1), texts(d2)).toLong,
        s"pair ($d1, $d2): engine dist $dist != reference DP")
      val maxlen = math.max(texts(d1).length, texts(d2).length)
      assert(dist <= 0.2 * maxlen)
      // tolerance, not exact: Spark's Round is BigDecimal HALF_UP over
      // Double.toString, which can disagree with math.round(x*1e6) on
      // a 7th-digit halfway tie (e.g. 13/640 = 0.0203125)
      assert(math.abs(r.getAs[Double]("rel_dist") -
        dist.toDouble / maxlen) < 1e-6 + 1e-9)
    }
  }

  test("dedup_lev_curated == raw levenshtein restricted to canonical survivors") {
    // On this fixture the shingle-DF cap never binds (max df far below
    // 1000), so removing canonical duplicates cannot ADD candidates —
    // the composed form must equal the raw key filtered to pairs whose
    // BOTH endpoints survive the canonical pre-pass.
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val survivors = TextSim.canonicalSurvivors(docs)
      .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet
    val composed = TextSim.dedupLevenshteinOf(
      TextSim.canonicalSurvivors(docs))
    val rawFiltered = TextSim.dedupLevenshtein(spark, dir)
      .filter(r => survivors.contains(r.getLong(0)) &&
        survivors.contains(r.getLong(1)))
    assert(composed.exceptAll(rawFiltered).count() === 0)
    assert(rawFiltered.exceptAll(composed).count() === 0)
    assert(composed.count() > 0, "fixture must exercise the DP stage")
  }

  test("orderedPairs property: exactly the i<j pairs of every array") {
    // the shared candidate-expansion core of three dedup operators —
    // property-tied to its specification (all ordered pairs, nothing
    // else) so a slice off-by-one can't silently drop candidates
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val arraysGen = Gen.listOfN(5,
      Gen.chooseNum(0L, 20L).flatMap(n => Gen.pick(n.toInt min 12,
        0L until 40L)).map(_.toSeq.sorted))
    val prop = Prop.forAll(arraysGen) { arrays =>
      val df = arrays.toDF("docs")
      val got = TextSim.orderedPairs(df, "docs", "a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val want = arrays.flatMap(ds =>
        for (i <- ds.indices; j <- i + 1 until ds.size)
          yield (ds(i), ds(j))).sorted
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("dedup_semantic: planted cells, keep-first inside a cell, " +
      "exact copy flagged, determinism under repartition") {
    import spark.implicits._
    // seeds (k=2): 0 → x-axis cell, 1 → y-axis cell. 2/3/4 are near-
    // dups of an EARLIER doc in their cell; 5/6 share cell 0 but clear
    // no 0.35 cosine to anything earlier — kept
    val docs = Seq(
      0L -> Array(1f, 0f, 0f, 0f),
      1L -> Array(0f, 1f, 0f, 0f),
      2L -> Array(0.9f, 0.1f, 0f, 0f),   // cell 0, cos≈0.99 to 0
      3L -> Array(1f, 0f, 0f, 0f),       // exact copy of 0
      4L -> Array(0f, 1f, 0.05f, 0f),    // cell 1, cos≈0.999 to 1
      5L -> Array(0.3f, 0f, 0.95f, 0f),  // cell 0, max cos to earlier ≈0.30
      6L -> Array(0.3f, 0.1f, 0f, 0.95f) // cell 0, max cos to earlier ≈0.31
    ).toDF("vec_id", "embedding")
    def run(df: org.apache.spark.sql.DataFrame) =
      TextSim.dedupSemanticOf(df, k = 2, threshold = 0.35).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val out = run(docs)
    assert(out.map(_._1).toSeq === (0L to 6L), "one row per doc, ordered")
    val cell = out.map(t => t._1 -> t._2).toMap
    assert(Seq(0L, 2L, 3L, 5L, 6L).forall(cell(_) === 0L))
    assert(Seq(1L, 4L).forall(cell(_) === 1L))
    val dup = out.filter(_._3).map(_._1).toSet
    assert(dup === Set(2L, 3L, 4L), s"got $dup")
    assert(run(docs.repartition(7)).toSeq === out.toSeq,
      "partitioning leaked into the output")
  }

  test("dedup_semantic fixture: a partition of the corpus, dup mass " +
      "present, first seed never a dup") {
    val out = TextSim.dedupSemantic(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val n = graft.core.Tables.load(spark, dir, "embeddings").count()
    assert(out.length.toLong === n, "every vector lands in exactly one cell")
    assert(out.map(_._2).distinct.sorted.toSeq === (0L to 7L),
      "all 8 seeded cells non-empty on the fixture")
    // vec 0 seeds cell 0 and precedes everything — can never be a dup
    assert(!out.find(_._1 === 0L).get._3)
    val dupRate = out.count(_._3).toDouble / n
    assert(dupRate > 0 && dupRate < 0.9, s"degenerate dup rate $dupRate")
  }

  test("dedup_semantic_kmeans: still a partition, deterministic under " +
      "repartition (exact-decimal Lloyd means), distinct from seeding") {
    val e = graft.core.Tables.load(spark, dir, "embeddings")
    def run(df: org.apache.spark.sql.DataFrame) =
      TextSim.dedupSemanticKmeansOf(df).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val out = run(e)
    assert(out.length.toLong === e.count(), "one cell per vector")
    assert(out.map(_._2).distinct.length === 8, "all 8 trained cells used")
    // Lloyd rounds use exact-decimal means — the trained model, and so
    // the whole output, must be bit-stable under input partitioning
    assert(run(e.repartition(13)).toSeq === out.toSeq,
      "partitioning leaked into the trained cells")
    // non-vacuous: the trained cells actually moved off the seed cells
    val seeded = TextSim.dedupSemanticOf(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.exists(t => seeded(t._1) !== t._2),
      "k-means cells identical to seed cells — trainer not engaged")
  }

  test("sample_importance: eval slice excluded, token counts tie out, " +
      "keep consistent with the normalized weight, deterministic") {
    import org.apache.spark.sql.functions.{col, size => fsize}
    val out = Sampling.sampleImportance(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(out.nonEmpty)
    assert(out.forall(_._1 % 50 != 0), "target slice must not be scored")
    val wantTok = graft.core.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"),
        fsize(TextSim.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (id, n, w, a, k) =>
      assert(n === wantTok(id), s"doc $id token count drifted")
      assert(math.abs(a - w / n) < 2e-4,
        s"doc $id avg_lr inconsistent with logw")
      assert(k === (a >= -0.09), s"doc $id keep flag inconsistent")
    }
    // every non-eval doc with >= 1 token is scored
    assert(out.length === wantTok.count(_._2 > 0))
    val again = Sampling.sampleImportance(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(again.toSeq === out.toSeq, "weights not deterministic")
  }
}
