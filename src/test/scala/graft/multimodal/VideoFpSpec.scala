package graft.multimodal

import graft.{SparkSuite, TestSpark}

/** Perceptual video dedup ([[VideoFp]]): the exactness theorem the
  * oracle leans on (8×8-aligned constant blocks survive a baseline
  * JPEG roundtrip bit-exactly — all 256 values, two generations), the
  * temporal-collapse invariance that makes the upsample / freeze-pad
  * disguises vanish, and full recall of the planted within-group
  * closure on the fixture. */
class VideoFpSpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  test("JPEG constant-block exactness: all 256 gray values survive " +
      "two encode generations bit-exactly") {
    // one 8x8 block per value, tiled into a 128x128 image (16x16
    // blocks = 256 cells) so a single roundtrip checks every value
    val w = 128; val h = 128
    val px = Array.tabulate(w * h) { i =>
      val bx = (i % w) / 8; val by = (i / w) / 8
      by * 16 + bx // 0..255, one constant block per value
    }
    val g1 = Multimodal.RealCodec.encode("jpg", w, h, px)
    val (w1, h1, d1) = Multimodal.RealCodec.decode(g1).get
    assert((w1, h1) === (w, h))
    assert(d1.sameElements(px), "generation 1 not bit-exact")
    val g2 = Multimodal.RealCodec.encode("jpg", w1, h1, d1)
    val (_, _, d2) = Multimodal.RealCodec.decode(g2).get
    assert(d2.sameElements(px), "generation 2 not bit-exact")
  }

  test("adjacent cells in a row never share a level (strict dHash " +
      "comparisons everywhere)") {
    for (anchor <- 0L until 40L by 4L; f <- 0 until VideoFp.nFrames(anchor);
         gy <- 0 until 8; gx <- 0 until 8) {
      assert(VideoFp.cellLevel(anchor, f, gy, gx) !=
        VideoFp.cellLevel(anchor, f, gy, gx + 1),
        s"tie at anchor=$anchor f=$f gy=$gy gx=$gx")
    }
  }

  test("collapse is load-bearing: the upsampled and freeze-padded " +
      "variants carry MORE raw frames but the same collapsed sequence") {
    import spark.implicits._
    val raw = graft.core.Tables.load(spark, dir, "documents")
      .select("doc_id").as[Long].collect().sorted.take(16)
    val byId = raw.map { id =>
      val mp4 = VideoFp.variantMp4(id)
      val track = Mp4.parse(mp4).get
      (id, track.nSamples)
    }.toMap
    byId.keys.groupBy(id => id - id % 4).foreach { case (a, ids) =>
      val n = VideoFp.nFrames(a)
      ids.foreach { id =>
        val expect = (id % 4) match {
          case 2 => 2 * n // temporal upsample
          case 3 => n + 2 // freeze pad
          case _ => n
        }
        assert(byId(id) === expect, s"doc $id raw frame count")
      }
    }
    // and the collapsed sequences agree within each group
    val seqs = VideoFp.vfps(spark, dir)
      .as[(Long, String, Long)].collect()
    seqs.groupBy(t => t._1 - t._1 % 4).foreach { case (a, g) =>
      assert(g.map(_._2).toSet.size === 1,
        s"group $a: variants collapse apart")
      g.foreach { case (id, _, n) =>
        assert(n === VideoFp.nFrames(a).toLong,
          s"doc $id: collapsed length $n") }
    }
  }

  test("recall and precision: the pair set is exactly the within-group " +
      "closure on the fixture") {
    import spark.implicits._
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select("doc_id").as[Long].collect().toSet
    val pairs = VideoFp.dedupVideo(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val groups = docs.groupBy(id => id - id % 4)
    val expected = groups.values.flatMap { members =>
      val ms = members.toSeq.sorted
      for (i <- ms.indices; j <- (i + 1) until ms.size)
        yield (ms(i), ms(j))
    }.toSet
    assert(pairs === expected,
      s"missing=${(expected -- pairs).take(5)} " +
        s"extra=${(pairs -- expected).take(5)}")
  }

  test("delta form == one-shot pairs with the newer side in the " +
      "delivery (per-item fingerprints make the store exact)") {
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val cut = docs.agg(org.apache.spark.sql.functions.max("doc_id"))
      .head().getLong(0) * 4 / 5 + 1
    val viaDelta = VideoFp.dedupVideoDelta(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val viaOneShot = VideoFp.dedupVideo(spark, dir)
      .filter(org.apache.spark.sql.functions.col("d2") >= cut)
      .collect().map(_.toString).sorted.toSeq
    assert(viaDelta === viaOneShot)
    assert(viaDelta.nonEmpty,
      "no delta pairs — vacuous (planted groups of 4 span the cutoff)")
  }

  test("drift gauge: a sequence-length migration flips occ_shift; " +
      "novelty stays quiet when sequences repeat") {
    import spark.implicits._
    // base: half the items 2-frame, half 3-frame; delta reuses ONLY
    // base sequences but all mass moves to the 3-frame one
    val base = (0L until 20L).map(i =>
      if (i % 2 == 0) (i, "a|b", 2L) else (i, "a|b|c", 3L))
      .toDF("doc_id", "vseq", "n_frames")
    val delta = (100L until 110L).map(i => (i, "a|b|c", 3L))
      .toDF("doc_id", "vseq", "n_frames")
    val p = VideoFp.videoDriftOf(base, delta).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(p(3L).getAs[Boolean]("occ_shift"),
      "3-frame share 0.5 -> 1.0 must flip occ_shift")
    assert(!p(3L).getAs[Boolean]("novelty_drift"))
    assert(p(3L).getAs[Double]("novel_rate") === 0.0)
    assert(p.values.forall(_.getAs[Boolean]("seq_retrain")))
  }

  test("drift gauge: all-new sequences flip the novelty arm with " +
      "length occupancy preserved") {
    import spark.implicits._
    val base = (0L until 20L).map(i => (i, s"x${i % 2}|y", 2L))
      .toDF("doc_id", "vseq", "n_frames")
    val delta = (100L until 120L).map(i => (i, s"n$i|m", 2L))
      .toDF("doc_id", "vseq", "n_frames")
    val p = VideoFp.videoDriftOf(base, delta).collect()
    assert(p.forall(_.getAs[Boolean]("novelty_drift")))
    assert(p.forall(_.getAs[Double]("novel_rate") === 1.0))
    assert(p.forall(!_.getAs[Boolean]("occ_shift")),
      "length occupancy is preserved — occ arm must stay quiet")
    assert(p.forall(_.getAs[Boolean]("seq_retrain")))
  }

  test("drift gauge on the fixture: store-served panel is internally " +
      "consistent") {
    val rows = VideoFp.videoDriftCheck(spark, dir).collect()
    assert(rows.nonEmpty)
    val any = rows.exists(_.getAs[Boolean]("occ_shift")) ||
      rows.head.getAs[Boolean]("novelty_drift")
    rows.foreach(r =>
      assert(r.getAs[Boolean]("seq_retrain") === any))
  }
}
