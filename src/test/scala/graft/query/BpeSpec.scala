package graft.query

import org.apache.spark.sql.functions._

import graft.{SparkSuite, TestSpark}

/** BPE trainer + encoder ([[Bpe]]): merge order verified against a
  * hand-derivable corpus (the Sennrich '16 working example's shape),
  * bit-determinism across runs and partitionings, and the round-trip /
  * bounds contract on the driver fixture. */
class BpeSpec extends SparkSuite {

  import spark.implicits._

  private val dir = TestSpark.sfDir

  test("hand-derivable corpus: first merges match manual BPE") {
    // corpus: "aaab" x5, "aab" x2 — char+</w> sequences:
    //   a a a b </w> (5), a a b </w> (2)
    // pair counts round 1: (a,a)=5*2+2=12, (a,b)=7, (b,</w>)=7
    //   → merge 1 = (a,a)
    // round 2: aa a b </w> (5), aa b </w> (2):
    //   (aa,a)=5, (a,b)=5, (aa,b)=2, (b,</w>)=7 → merge 2 = (b,</w>)
    // round 3: (aa,a)=5, (a,b</w>)=5, (aa,b</w>)=2 → tie 5:
    //   lexicographic → (a,b</w>) beats (aa,a)
    val docs = ((1 to 5).map(i => (i.toLong, "aaab")) ++
      Seq((6L, "aab"), (7L, "aab")))
      .toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, numMerges = 3)
    val eow = Bpe.EndOfWord
    assert(merges === Seq(("a", "a"), ("b", eow), ("a", "b" + eow)))
  }

  test("determinism: identical merges across runs and partitionings") {
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val once = Bpe.trainMerges(docs, numMerges = 60)
    val again = Bpe.trainMerges(docs.repartition(13), numMerges = 60)
    assert(once === again)
    assert(once.size === 60, s"fixture exhausted early: ${once.size}")
    assert(once.distinct.size === once.size, "duplicate merge learned")
  }

  test("fixture: round-trip + bounds contract is all-true, totals hold") {
    val c = Bpe.roundtripContract(spark, dir).cache()
    try {
      val docs = graft.core.Tables.load(spark, dir, "documents").count()
      assert(c.count() === docs)
      assert(c.filter(!col("roundtrip_ok") || !col("bounds_ok"))
        .count() === 0L)
    } finally c.unpersist()
  }

  test("encode compresses: learned merges shorten the fixture corpus") {
    val t = Bpe.tokenizeBpe(spark, dir)
      .agg(sum("n_subwords"), sum("n_words"),
        sum(col("n_words") * lit(3))).head()
    val (subs, words) = (t.getLong(0), t.getLong(1))
    // with 200 merges on a 31-word vocabulary the corpus collapses to
    // near word-grain: avg symbols/word must approach 1, and must
    // always be >= 1
    assert(subs >= words)
    assert(subs < words * 2,
      s"merges learned nothing: $subs subwords for $words words")
  }

  test("decode inverts encode on arbitrary planted words") {
    val docs = Seq((1L, "internationalization is fun"),
      (2L, "zebra zebra unseen-word zebra"),
      (3L, "internationalization internationalization"))
      .toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, numMerges = 40)
    // encode via the expression at vocab grain, decode driver-side
    val enc = docs
      .withColumn("toks", TextSim.tokens(col("text")))
      .select(col("doc_id"), explode(col("toks")).as("w"))
      .select(col("doc_id"), col("w"),
        org.apache.spark.sql.graftbridge.Bridge.column(
          graft.functions.BpeEncodeWord(
            org.apache.spark.sql.graftbridge.Bridge
              .expression(col("w")), merges)).as("subs"))
      .collect()
    enc.foreach { r =>
      val w = r.getString(1)
      val subs = r.getSeq[String](2)
      assert(Bpe.decode(subs) === w, s"round-trip broke for '$w'")
      assert(subs.nonEmpty)
    }
  }

  test("adversarial literal '</w>' inside a token cannot forge the " +
      "marker (decode stays injective)") {
    // tokens are lowercased, so the uppercase-W marker Bpe.EndOfWord
    // can never occur in (or be concatenated from) corpus text — a doc
    // containing the literal lowercase string must survive the full
    // encode→decode roundtrip unchanged (the r14 ADVICE gap: under a
    // lowercase marker this input made roundtrip_ok flip false).
    val docs = Seq((1L, "x</w>y plain x</w>y"),
      (2L, "</w> alone and x</w>y again")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, numMerges = 20)
    val enc = docs
      .select(explode(TextSim.tokens(col("text"))).as("w"))
      .select(col("w"),
        org.apache.spark.sql.graftbridge.Bridge.column(
          graft.functions.BpeEncodeWord(
            org.apache.spark.sql.graftbridge.Bridge
              .expression(col("w")), merges)).as("subs"))
      .collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      assert(Bpe.decode(r.getSeq[String](1)) === r.getString(0),
        s"marker forged by '${r.getString(0)}'")
    }
  }
}
