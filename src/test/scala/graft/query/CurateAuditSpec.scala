package graft.query

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.{SparkSuite, TestSpark}

/** Unit checks for the curation drop-lineage audit. The fixture leaves
  * the `duplicate` branch idle at small SFs (canonical twins there fail
  * the quality gate first), so a constructed corpus drives EVERY stage
  * label; the fixture run is then pinned to the pipeline itself — the
  * audit's `kept` set must equal [[TextQuality.curateE2e]]'s survivors
  * exactly, which is the property that makes the audit trustworthy. */
class CurateAuditSpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** The constructed corpus's source is "s3" → mixing group 3 →
    * threshold "c0" (the [[Sampling.mixtureThreshold]] table). */
  private def mixedOut(id: Long): Boolean = md5hex(id.toString) >= "c0"

  test("every stage label is reachable, first-hit-wins, on a constructed corpus") {
    import spark.implicits._
    def words(prefix: String, n: Int): String =
      (1 to n).map(i => f"$prefix$i%02d").mkString(" ")
    val evalWords = words("e", 25)
    val shared = evalWords.split(" ").take(6).mkString(" ")
    val base = Seq(
      (290L, "s3", "just five tiny words here"),              // too_short
      (291L, "s3", Seq.fill(20)("dup").mkString(" ")),        // low_diversity
      // 40 tokens, 30 distinct (0.75 ≥ 0.45), top token 11/40 = 0.275
      (292L, "s3", (Seq.fill(11)("top") ++
        (1 to 29).map(i => f"r$i%02d")).mkString(" ")),       // repetitive
      (293L, "s3", "D01, " + words("d", 25).drop(4) + "."),   // canon rep (first)
      (294L, "s3", words("d", 25)),                           // duplicate (rn 2)
      (250L, "s3", evalWords),                                // eval_split (250 % 50 = 0)
      // quality-ok, shares a 6-word run (3 distinct 4-gram shingles ≥ 2)
      (295L, "s3", shared + " " + words("c", 20))             // contaminated
    )
    val filler = (301L to 340L)
      .map(id => (id, "s3", words(s"u${id}w", 25)))
    val docs = (base ++ filler).toDF("doc_id", "source", "text")

    val out = TextQuality.curateAuditOf(docs).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out.size === base.size + filler.size, "every doc accounted for")
    assert(out(290L) === "too_short")
    assert(out(291L) === "low_diversity")
    assert(out(292L) === "repetitive")
    assert(out(294L) === "duplicate")
    assert(out(250L) === "eval_split")
    assert(out(295L) === "contaminated")
    // the canon representative falls through to the mixture stage
    assert(out(293L) === (if (mixedOut(293L)) "mixture_sampled_out" else "kept"))
    filler.foreach { case (id, _, _) =>
      assert(out(id) === (if (mixedOut(id)) "mixture_sampled_out" else "kept"),
        s"filler doc $id")
    }
    // both mixture outcomes genuinely occur across the filler ids
    val fillerLabels = filler.map(f => out(f._1)).toSet
    assert(fillerLabels === Set("kept", "mixture_sampled_out"))
  }

  test("audit `kept` set equals the pipeline's survivor set on the fixture") {
    val kept = TextQuality.curateAudit(spark, dir)
      .filter(col("kept")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val survivors = TextQuality.curateE2e(spark, dir)
      .select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(kept === survivors)
    assert(kept.nonEmpty, "anti-vacuity: the pipeline keeps something")
  }

  test("fixture drop shares decompose: stage counts sum to the corpus") {
    val byStage = TextQuality.curateAudit(spark, dir)
      .groupBy("stage").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = graft.core.Tables.load(spark, dir, "documents").count()
    assert(byStage.values.sum === total)
    // the fixture exercises the gate, split, contamination and sampling
    // stages (duplicate twins exist only at larger SFs)
    Seq("too_short", "low_diversity", "repetitive", "eval_split",
      "contaminated", "mixture_sampled_out", "kept").foreach { s =>
      assert(byStage.getOrElse(s, 0L) > 0L, s"stage $s unexercised")
    }
  }
}
