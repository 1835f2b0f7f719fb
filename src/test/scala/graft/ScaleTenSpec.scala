package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables

/** The decade-up generator's shape-preservation contract: the fresh
  * corpus must be drawn from the BASE fixture's own measured
  * distributions (vocabulary, word-count range, language mix, source
  * count, duplicate rate) and be bit-deterministic — the properties
  * that make a [[ScaleTen]] run admissible as an "sf-shaped one decade
  * up" measurement instead of an arbitrary synthetic corpus. */
class ScaleTenSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private val sfDir = TestSpark.sfDir
  private lazy val base = Tables.load(spark, sfDir, "documents")
  private lazy val gen = ScaleTen.genDocuments(base, 5000L).cache()

  test("row count, schema and id range match the request") {
    assert(gen.count() === 5000L)
    assert(gen.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      base.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val r = gen.agg(min("doc_id"), max("doc_id"),
      countDistinct("doc_id")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((0L, 4999L, 5000L)))
  }

  test("vocabulary is exactly the base corpus's") {
    def vocab(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "").distinct()
        .collect().map(_.getString(0)).toSet
    val bv = vocab(base)
    val gv = vocab(gen)
    // ⊆ always; with 5000 docs × ≥10 uniform draws from ~31 words,
    // every base word appears (P(miss) < 31·(30/31)^50000 ≈ 0)
    assert(gv === bv)
  }

  test("word counts stay inside the base range; n_chars is honest") {
    val wc = base.select(size(split(col("text"), " ")).as("nw"))
      .agg(min("nw"), max("nw")).head()
    val g = gen.select(size(split(col("text"), " ")).as("nw"))
      .agg(min("nw"), max("nw")).head()
    assert(g.getInt(0) >= wc.getInt(0) && g.getInt(1) <= wc.getInt(1))
    assert(gen.filter(length(col("text")) =!= col("n_chars")).count() === 0L)
  }

  test("language mix tracks the base shares; sources match") {
    val total = base.count().toDouble
    val baseShares = base.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / total).toMap
    val genShares = gen.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / 5000.0).toMap
    assert(genShares.keySet === baseShares.keySet)
    baseShares.foreach { case (l, s) =>
      assert(math.abs(genShares(l) - s) < 0.03,
        s"lang $l: gen ${genShares(l)} vs base $s") }
    assert(gen.select("source").distinct().count() ===
      base.select("source").distinct().count())
  }

  test("an exact-dup-free base generates (near-)exactly none") {
    assert(base.count() === base.select("text").distinct().count(),
      "fixture changed: sf0.001 documents now has duplicates")
    // near-dup planting can collapse to byte-exact when the ~10%
    // substitution draw touches no slot of a short doc — bound those
    // accidents by the near rate itself
    val levPairs = graft.query.TextSim.dedupLevenshteinOf(base)
      .filter(col("dist") > 0).count()
    // planted near docs ≈ levPairs × (5000/500); only a minority of
    // those can collapse to byte-exact
    val extras = 5000L - gen.select("text").distinct().count()
    assert(extras <= math.max(1L, levPairs * 10L),
      s"$extras exact extras from a base with 0 exact / $levPairs near")
  }

  test("a base WITH duplicates plants them at the measured rate") {
    // synthesize a base at a known rate: every 50th doc repeats the
    // previous text -> 10 extras on 500 rows
    val dup = base.limit(500).withColumn("text",
        when(col("doc_id") % 50 === 49,
          lag(col("text"), 1).over(org.apache.spark.sql.expressions
            .Window.orderBy("doc_id")))
          .otherwise(col("text")))
    val g = ScaleTen.genDocuments(dup, 5000L)
    val extras = 5000L - g.select("text").distinct().count()
    // expected ~100 (rate 1/50); hash-deterministic, band is generous
    assert(extras >= 50 && extras <= 200, s"planted $extras dup extras")
  }

  test("near-duplicates are planted at the measured pair rate") {
    import graft.query.TextSim
    // synthesize a base with a KNOWN near-dup rate: every 25th doc is
    // a ~10%-word-substituted copy of its predecessor
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
    val nearBase = base.withColumn("prev", lag(col("text"), 1).over(w))
      .withColumn("text",
        when(col("doc_id") % 25 === 24 && col("prev").isNotNull,
          concat(col("prev"), lit(" spark")))
          .otherwise(col("text")))
      .drop("prev")
    val basePairs = TextSim.dedupLevenshteinOf(nearBase)
      .filter(col("dist") > 0).count()
    assert(basePairs >= 20, s"synthetic base should have ≥20 near pairs")
    val g = ScaleTen.genDocuments(nearBase, 2000L)
    val genPairs = TextSim.dedupLevenshteinOf(g)
      .filter(col("dist") > 0).count()
    val expected = 2000.0 * basePairs / 500.0
    assert(genPairs > expected * 0.2 && genPairs < expected * 5.0,
      s"gen near pairs $genPairs vs expected ~$expected")
  }

  test("generation is bit-deterministic") {
    val again = ScaleTen.genDocuments(base, 5000L)
    assert(gen.unionAll(again).select("doc_id", "text", "lang", "source")
      .distinct().count() === 5000L)
  }

  test("events replicate with strided ids over the same span") {
    val ev = Tables.load(spark, sfDir, "events")
    val g = ScaleTen.genEvents(ev, 3)
    assert(g.count() === ev.count() * 3)
    assert(g.select("event_id").distinct().count() === ev.count() * 3)
    assert(g.select("user_id").distinct().count() ===
      ev.select("user_id").distinct().count() * 3)
    val Seq(b, s) = Seq(ev, g).map(_.agg(min("ts"), max("ts")).head())
    assert(b === s)
  }

  test("part: fresh names from the base vocabulary, strided keys, " +
      "base replica verbatim") {
    val baseP = Tables.load(spark, sfDir, "part")
    val stride0 = baseP.agg(max("p_partkey")).head().getLong(0) + 1L
    val g = ScaleTen.genPart(baseP, 3, stride0).cache()
    assert(g.count() === baseP.count() * 3)
    assert(g.select("p_partkey").distinct().count() === g.count())
    assert(g.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      baseP.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    // replica 0 IS the base (strided keys partition cleanly above it)
    val stride = stride0
    assert(g.filter(col("p_partkey") < stride).except(baseP)
      .count() === 0L)
    // fresh-name replicas draw from the base's measured name-word
    // vocabulary and words-per-name range — gram mass grows with new
    // names, not by inflating every base gram's DF ×factor
    val baseVocab = baseP
      .select(explode(split(col("p_name"), " ")).as("w"))
      .distinct().collect().map(_.getString(0)).toSet
    val genWords = g.filter(col("p_partkey") >= stride)
      .select(explode(split(col("p_name"), " ")).as("w")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(genWords.subsetOf(baseVocab))
    val wc = baseP.select(size(split(col("p_name"), " ")).as("nw"))
      .agg(min("nw"), max("nw")).head()
    val gwc = g.select(size(split(col("p_name"), " ")).as("nw"))
      .agg(min("nw"), max("nw")).head()
    assert(gwc.getInt(0) >= wc.getInt(0) && gwc.getInt(1) <= wc.getInt(1))
    assert(g.select("p_name").distinct().count() >
      baseP.select("p_name").distinct().count(),
      "replicas must add NEW name mass")
  }

  test("keyed replication preserves referential integrity and join " +
      "fan-out across the strided constellation") {
    val part = Tables.load(spark, sfDir, "part")
    val orders = Tables.load(spark, sfDir, "orders")
    val li = Tables.load(spark, sfDir, "lineitem")
    def strideOf(df: org.apache.spark.sql.DataFrame, k: String): Long =
      df.agg(max(col(k))).head().getLong(0) + 1L
    val (pkS, okS) = (strideOf(part, "p_partkey"),
      strideOf(orders, "o_orderkey"))
    val gPart = ScaleTen.genPart(part, 3, pkS)
    val gOrders = ScaleTen.replicateKeyed(orders, 3,
      Seq("o_orderkey" -> okS))
    val gLi = ScaleTen.replicateKeyed(li, 3,
      Seq("l_orderkey" -> okS, "l_partkey" -> pkS))
    // every foreign key resolves (stride consistency: the owning
    // table's key space, not the referencing table's max)
    assert(gLi.join(gPart, col("l_partkey") === col("p_partkey"),
      "left_anti").count() === 0L)
    assert(gLi.join(gOrders, col("l_orderkey") === col("o_orderkey"),
      "left_anti").count() === 0L)
    // fan-out preserved exactly: lines-per-order histogram is the
    // base's with every count ×3
    val baseHist = li.groupBy("l_orderkey").count()
      .groupBy("count").count().orderBy("count")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val genHist = gLi.groupBy("l_orderkey").count()
      .groupBy("count").count().orderBy("count")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(genHist === baseHist.map { case (k, n) => (k, n * 3) })
  }

  test("embeddings: schema, per-dim moments and label set preserved") {
    val baseE = Tables.load(spark, sfDir, "embeddings")
    val g = ScaleTen.genEmbeddings(baseE, 5000L).cache()
    assert(g.count() === 5000L)
    assert(g.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      baseE.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    def moments(df: org.apache.spark.sql.DataFrame) = df
      .select(posexplode(col("embedding")).as(Seq("d", "v")))
      .groupBy("d").agg(avg("v").as("m"), stddev_pop("v").as("s"))
      .orderBy("d").collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))
    val bm = moments(baseE)
    val gm = moments(g)
    // CLT-3 draw at 5000 rows: sample moments track the targets within
    // sampling noise (std of a 5000-sample mean ≈ s/70)
    bm.zip(gm).zipWithIndex.foreach { case (((m0, s0), (m1, s1)), d) =>
      assert(math.abs(m1 - m0) < 0.05 * math.max(s0, 1e-6) + 0.005,
        s"dim $d mean drifted: base $m0 vs gen $m1")
      assert(math.abs(s1 - s0) < 0.08 * s0 + 1e-6,
        s"dim $d std drifted: base $s0 vs gen $s1")
    }
    assert(g.select("label").distinct().count() ===
      baseE.select("label").distinct().count())
  }
}
