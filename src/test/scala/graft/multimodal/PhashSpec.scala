package graft.multimodal

import graft.{SparkSuite, TestSpark}

/** Perceptual-hash image dedup ([[Phash]]): the planted twins —
  * re-encoded (PNG/BMP/GIF), 2×-resized, brightness-shifted — must all
  * be recalled (hamming 0 against their anchor), the invariance
  * theorems hold in raw pixel space, and the pair set is exactly the
  * within-group closure on the fixture. */
class PhashSpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  test("invariance theorems: resize and brighten preserve dHash exactly") {
    (0L until 40L by 5L).foreach { anchor =>
      val base = Array.tabulate(Phash.W * Phash.H)(i =>
        Phash.basePixel(anchor, i))
      val hBase = Phash.dHash64(Phash.W, Phash.H, base)
      // 2x nearest-neighbor upscale
      val up = Array.tabulate(Phash.W * 2 * Phash.H * 2) { i =>
        val x = (i % (Phash.W * 2)) / 2
        val y = (i / (Phash.W * 2)) / 2
        base(y * Phash.W + x)
      }
      assert(Phash.dHash64(Phash.W * 2, Phash.H * 2, up) === hBase,
        s"anchor $anchor: upscale changed the hash")
      assert(Phash.dHash64(Phash.W, Phash.H, base.map(_ + 40)) === hBase,
        s"anchor $anchor: brightness shift changed the hash")
    }
  }

  test("recall: every planted twin pairs with its anchor at hamming 0") {
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val pairs = Phash.dedupPhash(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    // within-group closure: for every complete group of 5, all 10
    // pairs must be present with hamming 0 (recall = 100%)
    val groups = docs.groupBy(id => id - id % 5).filter(_._2.size == 5)
    assert(groups.nonEmpty)
    groups.foreach { case (_, members) =>
      val ms = members.toSeq.sorted
      for (i <- ms.indices; j <- (i + 1) until ms.size)
        assert(pairSet.contains((ms(i), ms(j))),
          s"missed twin pair (${ms(i)}, ${ms(j)})")
    }
    pairs.filter(p => p._1 - p._1 % 5 == p._2 - p._2 % 5)
      .foreach { case (d1, d2, h) =>
        assert(h === 0L, s"in-group pair ($d1,$d2) at hamming $h") }
    // precision on this fixture: distinct anchors produce distant
    // hashes — no cross-group pair sneaks under the bar
    val cross = pairs.filter(p => p._1 - p._1 % 5 != p._2 - p._2 % 5)
    assert(cross.isEmpty, s"cross-group collisions: ${cross.take(5).toSeq}")
  }

  test("the container roundtrip is load-bearing: hashes survive " +
      "re-encoding through all three lossless containers") {
    import spark.implicits._
    val hashes = Phash.phashes(spark, dir)
      .as[(Long, Long)].collect().toMap
    hashes.keys.groupBy(id => id - id % 5).foreach { case (a, ids) =>
      val hs = ids.map(hashes).toSet
      assert(hs.size === 1,
        s"group $a: variants hash apart — ${ids.map(hashes)}")
    }
  }

  test("delta form == one-shot pairs with the newer side in the " +
      "delivery (per-item hashes make the store exact)") {
    val dir = graft.TestSpark.sfDir
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val cut = docs.agg(org.apache.spark.sql.functions.max("doc_id"))
      .head().getLong(0) * 4 / 5 + 1
    val viaDelta = Phash.dedupPhashDelta(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val viaOneShot = Phash.dedupPhash(spark, dir)
      .filter(org.apache.spark.sql.functions.col("d2") >= cut)
      .collect().map(_.toString).sorted.toSeq
    assert(viaDelta === viaOneShot)
    assert(viaDelta.nonEmpty,
      "no delta pairs — vacuous (planted groups of 5 span the cutoff)")
  }

  test("drift gauge: a planted bit-occupancy migration flips " +
      "occ_shift; novelty stays quiet when fingerprints repeat") {
    import spark.implicits._
    // base: bit 0 set in half the items; delta reuses ONLY base
    // fingerprints (novelty quiet) but bit 0's share goes to 1.0
    val base = (0L until 20L).map(i => (i, if (i % 2 == 0) 1L else 0L))
      .toDF("doc_id", "phash")
    val delta = (100L until 110L).map(i => (i, 1L))
      .toDF("doc_id", "phash")
    val p = Phash.phashDriftOf(base, delta).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(p(0L).getAs[Boolean]("occ_shift"),
      "bit-0 share 0.5 -> 1.0 must flip occ_shift")
    assert(!p(0L).getAs[Boolean]("novelty_drift"),
      "delta fingerprints all exist in the base")
    assert(p(0L).getAs[Double]("novel_rate") === 0.0)
    assert(p.values.forall(_.getAs[Boolean]("fp_retrain")))
    assert(p.size === 64)
  }

  test("drift gauge: all-new fingerprints flip the novelty arm " +
      "even with occupancy preserved") {
    import spark.implicits._
    // delta mirrors the base's per-bit occupancy exactly (half the
    // items have bit 5 set) but every fingerprint value is new
    val base = (0L until 20L).map(i =>
      (i, if (i % 2 == 0) 32L else 0L)).toDF("doc_id", "phash")
    val delta = (100L until 120L).map(i =>
      (i, if (i % 2 == 0) 32L + 2L else 2L)).toDF("doc_id", "phash")
    val p = Phash.phashDriftOf(base, delta).collect()
    assert(p.forall(_.getAs[Boolean]("novelty_drift")))
    assert(p.forall(_.getAs[Double]("novel_rate") === 1.0))
    val bit5 = p.find(_.getLong(0) == 5L).get
    assert(!bit5.getAs[Boolean]("occ_shift"),
      "bit-5 share is preserved — occ arm must stay quiet")
    assert(p.forall(_.getAs[Boolean]("fp_retrain")))
  }

  test("drift gauge on the fixture: store-served panel is internally " +
      "consistent (decision = any occ flag OR novelty)") {
    val rows = Phash.phashDriftCheck(spark, graft.TestSpark.sfDir)
      .collect()
    assert(rows.length === 64)
    val any = rows.exists(_.getAs[Boolean]("occ_shift")) ||
      rows.head.getAs[Boolean]("novelty_drift")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("fp_retrain") === any)
      assert(r.getAs[Long]("n1_base") >= 0L)
      assert(r.getAs[Double]("novel_rate") ===
        rows.head.getAs[Double]("novel_rate"))
    }
  }
}
