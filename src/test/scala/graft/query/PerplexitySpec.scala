package graft.query

import org.apache.spark.sql.functions._
import graft.{SparkSuite, TestSpark}

/** text_perplexity: the bigram-LM (CCNet-shape) filter signal.
  * Ties the distributed computation out against a direct driver-side
  * bigram LM on the fixture corpus, pins the conditional-model property
  * the operator exists for (templated text scores low even when its
  * tokens are rare), and pins bit-determinism across partitionings. */
class PerplexitySpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  private def log2(x: Double) = math.log(x) / math.log(2.0)

  test("ties out against a direct bigram-LM computation on the fixture") {
    val toks = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), TextSim.tokens(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val uni = toks.values.flatten.groupBy(identity)
      .map { case (t, occ) => t -> occ.size.toLong }
    val v = uni.size.toLong
    val bigrams = toks.values.toSeq.flatMap(ws => ws.zip(ws.drop(1)))
    val cbg = bigrams.groupBy(identity)
      .map { case (b, occ) => b -> occ.size.toLong }
    val out = TextQuality.textPerplexity(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_ => r.getDouble(2)),
          Option(r.get(3)).map(_ => r.getDouble(3))))).toMap
    assert(out.keySet === toks.keySet)
    toks.foreach { case (id, ws) =>
      val (nPairs, bits, ppl) = out(id)
      val pairs = ws.zip(ws.drop(1))
      assert(nPairs === pairs.size.toLong, s"doc $id pair count")
      if (pairs.isEmpty) assert(bits.isEmpty && ppl.isEmpty, s"doc $id")
      else {
        val want = pairs.map { case (w1, w2) =>
          log2((uni(w1) + v).toDouble) - log2((cbg((w1, w2)) + 1).toDouble)
        }.sum / pairs.size
        assert(math.abs(bits.get - want) < 1e-5,
          s"doc $id bits=${bits.get} want=$want")
        assert(math.abs(ppl.get - math.pow(2.0, bits.get)) < 1e-3,
          s"doc $id ppl")
        assert(bits.get > 0, s"doc $id nonpositive bits")
      }
    }
  }

  test("conditional model: templated text scores low even with rare tokens") {
    import spark.implicits._
    // 'zq yw' tokens appear ONLY here (rare unigrams) but in a fixed
    // repeated bigram pattern; the control doc uses the same-size
    // vocabulary with every bigram distinct. A unigram model scores
    // these identically-rare; the bigram model must separate them.
    val template = Seq.fill(30)("zq yw").mkString(" ")
    val varied = (0 until 60).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, template), (2L, varied)).toDF("doc_id", "text")
      .withColumn("toks", TextSim.tokens(col("text")))
    val got = TextQuality.textPerplexityOf(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(1L) < got(2L) / 2,
      s"templated ppl ${got(1L)} not well below varied ${got(2L)}")
  }

  test("hand corpus: exact smoothed values") {
    import spark.implicits._
    // corpus: "a b a" / "a b". uni: a=3, b=2; V=2.
    // bigrams: (a,b)x2, (b,a)x1.
    // doc 1 pairs (a,b),(b,a): bits = log2((3+2)/(2+1)) + log2((2+2)/(1+1))
    // doc 2 pair (a,b): bits = log2(5/3)
    val docs = Seq((1L, "a b a"), (2L, "a b")).toDF("doc_id", "text")
      .withColumn("toks", TextSim.tokens(col("text")))
    val got = TextQuality.textPerplexityOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
      .sortBy(_._1)
    val d1 = (log2(5.0 / 3) + log2(4.0 / 2)) / 2
    val d2 = log2(5.0 / 3)
    assert(got.map(_._2) === List(2L, 1L))
    assert(math.abs(got(0)._3 - d1) < 1e-6)
    assert(math.abs(got(1)._3 - d2) < 1e-6)
  }

  test("bit-determinism across partitionings") {
    val a = TextQuality.textPerplexity(spark, dir).collect().toSeq
    val b = TextQuality.textPerplexityOf(
      graft.core.Tables.load(spark, dir, "documents").repartition(7)
        .withColumn("toks", TextSim.tokens(col("text"))))
      .collect().toSeq
    assert(a === b)
  }
}
