package graft.query

import org.apache.spark.sql.functions._

import graft.{SparkSuite, TestSpark}

/** Unigram-LM trainer + Viterbi encoder ([[Unigram]]): EM likelihood
  * monotonicity (the EM theorem, observable because the trainer
  * records its history), bit-determinism across runs and
  * partitionings, the tiling round-trip / bounds contract on the
  * driver fixture, and Viterbi preferring high-probability pieces on
  * a hand-built corpus. */
class UnigramSpec extends SparkSuite {

  import spark.implicits._

  private val dir = TestSpark.sfDir

  test("EM is a true EM: corpus log-likelihood is non-decreasing " +
      "across iterations") {
    val m = Unigram.model(spark, dir)
    assert(m.llHistory.size >= 2)
    m.llHistory.sliding(2).foreach { case Seq(a, b) =>
      // quantizing the M-step to micro-nats perturbs each piece
      // occurrence by <= 5e-7 nats; the corpus log-likelihood is
      // O(|corpus|) nats, so a relative epsilon bounds the quantization
      // while any real EM regression (orders larger) still fails
      assert(b >= a - math.max(1e-6 * math.abs(a), 1e-3),
        s"likelihood decreased: ${m.llHistory.mkString(", ")}")
    case _ => ()
    }
  }

  test("determinism: identical piece tables across runs and " +
      "partitionings") {
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val once = Unigram.train(docs)
    val again = Unigram.train(docs.repartition(13))
    assert(once.pieces === again.pieces)
    assert(once.floor === again.floor)
    assert(once.pieces.map(_._1).distinct.size === once.pieces.size)
    // single characters always survive pruning (totality)
    val chars = once.pieces.map(_._1).filter(_.length == 1).toSet
    val corpusChars = docs.select(explode(TextSim.tokens(col("text")))
      .as("w")).collect().flatMap(_.getString(0)).toSet
    assert(corpusChars.map(_.toString).subsetOf(chars))
  }

  test("fixture: tiling round-trip + bounds contract is all-true") {
    val c = Unigram.tilingContract(spark, dir).cache()
    try {
      val docs = graft.core.Tables.load(spark, dir, "documents").count()
      assert(c.count() === docs)
      assert(c.filter(!col("roundtrip_ok") || !col("bounds_ok"))
        .count() === 0L)
    } finally c.unpersist()
  }

  test("encode compresses: learned pieces shorten the fixture corpus") {
    val t = Unigram.tokenizeUnigram(spark, dir)
      .agg(sum("n_pieces"), sum("n_words")).head()
    val (pcs, words) = (t.getLong(0), t.getLong(1))
    assert(pcs >= words)
    assert(pcs < words * 2,
      s"pieces learned nothing: $pcs pieces for $words words")
  }

  test("Viterbi prefers the dominant piece on a hand-built corpus " +
      "and handles unseen characters via the floor") {
    // 'abab' dominates: EM must concentrate mass on 'abab' (or its
    // halves) so the Viterbi tiling of "abab" uses 1-2 pieces, never 4
    val docs = (1 to 50).map(i => (i.toLong, "abab abab"))
      .toDF("doc_id", "text")
    val m = Unigram.train(docs, emIters = 3, keepSize = 20)
    val enc = docs.limit(1)
      .select(org.apache.spark.sql.graftbridge.Bridge.column(
        graft.functions.UnigramEncodeWord(
          org.apache.spark.sql.graftbridge.Bridge
            .expression(lit("abab")), m.pieces, m.floor)).as("p"))
      .head().getSeq[String](0)
    assert(enc.mkString("") === "abab")
    assert(enc.size <= 2, s"Viterbi ignored the trained pieces: $enc")
    // unseen character: still total, one floor-scored singleton
    val unseen = docs.limit(1)
      .select(org.apache.spark.sql.graftbridge.Bridge.column(
        graft.functions.UnigramEncodeWord(
          org.apache.spark.sql.graftbridge.Bridge
            .expression(lit("abzab")), m.pieces, m.floor)).as("p"))
      .head().getSeq[String](0)
    assert(unseen.mkString("") === "abzab")
    assert(unseen.contains("z"))
  }
}
