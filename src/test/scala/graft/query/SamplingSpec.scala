package graft.query

import org.apache.spark.sql.functions._

import graft.{SparkSuite, TestSpark}

/** Deterministic sampling + packing invariants. */
class SamplingSpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  test("sample_hash: deterministic, rate near the hash threshold, stable under repartition") {
    val total = graft.core.Tables.load(spark, dir, "orders").count()
    val s1 = Sampling.sampleHash(spark, dir).collect().map(_.getLong(0))
    val s2 = Sampling.sampleHash(spark, dir).collect().map(_.getLong(0))
    assert(s1.toSeq === s2.toSeq)
    val rate = s1.length.toDouble / total
    assert(rate > 0.06 && rate < 0.15, s"rate $rate far from 0x1a/0x100")
  }

  test("sample_stratified: exactly k per stratum (when the stratum has k), disjoint ranks") {
    val out = Sampling.sampleStratified(spark, dir, k = 50)
    val perStratum = out.groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perStratum.values.forall(_ <= 50))
    val strata = graft.core.Tables.load(spark, dir, "orders")
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    strata.foreach { case (s, n) =>
      assert(perStratum.getOrElse(s, 0L) === math.min(n, 50L))
    }
  }

  test("doc_chunk: full coverage, fixed overlap, no redundant tails") {
    val win = 16
    val stride = 8
    val out = Sampling.docChunk(spark, dir, win, stride).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        size(TextSim.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet === docs.filter(_._2 > 0).keySet)
    out.foreach { case (docId, rows) =>
      val n = docs(docId)
      val sorted = rows.sortBy(_.getAs[Long]("chunk_idx"))
      val starts = sorted.map(_.getAs[Long]("chunk_start"))
      val lens = sorted.map(_.getAs[Long]("n_chunk_tokens"))
      // every token covered: chunks start at 0, consecutive starts gap
      // ≤ win (overlap ⇒ gap = stride), last chunk reaches the end
      assert(starts.head === 0L)
      assert(starts.zip(starts.tail).forall { case (a, b) => b - a == stride })
      assert(starts.last + lens.last === n, s"doc $docId tail uncovered")
      // no redundant tails: every non-first chunk adds > win-stride tokens
      assert(sorted.tail.forall(_.getAs[Long]("n_chunk_tokens") > win - stride))
      // interior chunks are full windows
      assert(lens.dropRight(1).forall(_ === win.toLong))
    }
  }

  test("doc_chunk: invariants hold across (win, stride) combos; bad strides rejected") {
    // stride == win (no overlap), stride < win (overlap), non-divisor
    // strides where float division would round the index wrong
    for ((win, stride) <- Seq((16, 16), (16, 8), (10, 3), (7, 5), (64, 32))) {
      val rows = Sampling.docChunk(spark, dir, win, stride).collect()
      assert(rows.nonEmpty, s"(win=$win stride=$stride) produced no chunks")
      rows.foreach { r =>
        val (start, idx) =
          (r.getAs[Long]("chunk_start"), r.getAs[Long]("chunk_idx"))
        assert(start % stride === 0L, s"start $start not a stride multiple")
        assert(idx === start / stride,
          s"(win=$win stride=$stride) idx $idx != $start div $stride")
        val len = r.getAs[Long]("n_chunk_tokens")
        assert(len >= 1L && len <= win.toLong)
      }
      // idx is dense per doc: 0..k with no gaps
      rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (d, rs) =>
        val idxs = rs.map(_.getAs[Long]("chunk_idx")).sorted.toSeq
        assert(idxs === (0L until idxs.length.toLong).toSeq,
          s"doc $d chunk_idx not dense: $idxs")
      }
    }
    intercept[IllegalArgumentException](Sampling.docChunk(spark, dir, 16, 0))
    intercept[IllegalArgumentException](Sampling.docChunk(spark, dir, 16, 17))
  }

  test("dedup_chunks: a stride-aligned shared passage dedups to its " +
      "first-seen location; unique chunks never surface") {
    import spark.implicits._
    val passage = (1 to 64).map(i => s"p$i").mkString(" ")
    val fillerA = (1 to 32).map(i => s"a$i").mkString(" ")
    val fillerB = (1 to 64).map(i => s"b$i").mkString(" ")
    // doc 1 and doc 2 carry the SAME 64-token passage at stride-aligned
    // offsets (0 and 64); doc 3 is all-unique
    val docs = Seq(
      (1L, s"$passage $fillerA"),
      (2L, s"$fillerB $passage"),
      (3L, (1 to 96).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
    val groups = Sampling.chunkOf(docs)
      .groupBy("chunk_md5")
      .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("c"),
        count(lit(1)).as("n_copies"))
      .filter(col("n_copies") >= 2)
      .select(col("c.doc_id"), col("c.chunk_idx"), col("n_copies"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(groups.contains((1L, 0L, 2L)),
      s"shared passage must dedup to doc 1 chunk 0: ${groups.mkString(",")}")
    assert(groups.forall(_._1 != 3L), "unique doc surfaced as dup")
    // the driver key's shape on the fixture: non-vacuous, canonical
    // is first-seen, n_copies >= 2 everywhere
    val fx = Sampling.dedupChunks(spark, dir).collect()
    assert(fx.nonEmpty)
    assert(fx.forall(_.getAs[Long]("n_copies") >= 2L))
  }

  test("mix_budget_plan: exact allocation invariants hold on the fixture") {
    val budget = 100000L
    val plan = Sampling.mixBudgetPlan(spark, dir, budget).collect()
    assert(plan.nonEmpty)
    val wTotal = plan.map(_.getAs[Long]("weight")).sum
    plan.foreach { r =>
      val (w, have, target, epochs) = (r.getAs[Long]("weight"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("target_tokens"),
        r.getAs[Long]("epochs_x1000"))
      assert(Set(5L, 15L, 35L, 75L)(w))
      assert(target === budget * w / wTotal, "floor-division drift")
      assert(epochs === target * 1000L / have)
      assert(r.getAs[Boolean]("oversubscribed") === (target > have))
    }
    // floor division can only under-allocate, never over
    assert(plan.map(_.getAs[Long]("target_tokens")).sum <= budget)
  }

  test("pack_sequences: offsets stay within capacity and bins are contiguous per shard") {
    val out = Sampling.packSequences(spark, dir, capacity = 512).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Long]("bin_offset") >= 0 &&
      r.getAs[Long]("bin_offset") < 512))
    // per shard: bin index never decreases in doc order, starts at 0
    out.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      val bins = rows.sortBy(_.getAs[Long]("doc_id")).map(_.getAs[Long]("bin"))
      assert(bins.head === 0L)
      assert(bins.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    }
  }
}
