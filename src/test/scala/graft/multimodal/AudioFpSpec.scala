package graft.multimodal

import graft.{SparkSuite, TestSpark}

/** Audio-fingerprint dedup ([[AudioFp]]): the planted twins — 8-bit
  * re-encode, gain ×2, DC offset, 2× upsample — must all be recalled
  * (hamming 0 against their anchor), the positive-linear invariance
  * theorems hold in raw sample space, and the pair set is exactly the
  * within-group closure on the fixture. */
class AudioFpSpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  test("invariance theorems: gain, DC, 8-bit map, upsample preserve " +
      "the fingerprint exactly") {
    (0L until 40L by 5L).foreach { anchor =>
      val base = Array.tabulate(AudioFp.N)(i => AudioFp.baseMag(anchor, i) * 256)
      val hBase = AudioFp.fingerprint64(base)
      assert(AudioFp.fingerprint64(base.map(_ * 2)) === hBase,
        s"anchor $anchor: gain x2 changed the hash")
      assert(AudioFp.fingerprint64(base.map(_ + 4096)) === hBase,
        s"anchor $anchor: DC offset changed the hash")
      assert(AudioFp.fingerprint64(base.map(_ / 256 + 128)) === hBase,
        s"anchor $anchor: the 8-bit linear map changed the hash")
      val up = Array.tabulate(AudioFp.N * 2)(i => base(i / 2))
      assert(AudioFp.fingerprint64(up) === hBase,
        s"anchor $anchor: 2x upsample changed the hash")
    }
  }

  test("cross-anchor separation: exhaustive Hamming floor over a " +
      "decade-past-fixture anchor set stays above the dedup bar") {
    val fps = (0 until 2000).map { a =>
      AudioFp.fingerprint64(
        Array.tabulate(AudioFp.N)(i => AudioFp.baseMag(a * 5L, i) * 256))
    }.toArray
    var floor = 64
    var i = 0
    while (i < fps.length) {
      var j = i + 1
      while (j < fps.length) {
        val h = java.lang.Long.bitCount(fps(i) ^ fps(j))
        if (h < floor) floor = h
        j += 1
      }
      i += 1
    }
    assert(floor > 3, s"cross-anchor Hamming floor $floor <= dedup bar 3")
  }

  test("recall and precision: the real-WAV-roundtrip pair set is " +
      "exactly the within-group closure") {
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val pairs = AudioFp.dedupAudio(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
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
    val cross = pairs.filter(p => p._1 - p._1 % 5 != p._2 - p._2 % 5)
    assert(cross.isEmpty, s"cross-group collisions: ${cross.take(5).toSeq}")
  }

  test("the WAV roundtrip is load-bearing: both PCM widths decode " +
      "through the JDK reader to the same fingerprint") {
    // v1 is the 8-bit container, v0/v2/v3/v4 are 16-bit — a group's
    // five fingerprints agreeing proves the 8-bit path decodes for
    // real (a byte-level stub fallback would diverge immediately)
    (0L until 20L by 5L).foreach { anchor =>
      val fps = (anchor until anchor + 5).map { id =>
        val wav = AudioFp.variantWav(id)
        assert(Multimodal.AudioCodec.isWav(wav))
        val (_, ch, s) = Multimodal.AudioCodec.decode(wav).get
        assert(ch === 1)
        AudioFp.fingerprint64(s)
      }
      assert(fps.distinct.size === 1,
        s"anchor $anchor: variant fingerprints diverge: $fps")
    }
  }

  test("delta form == one-shot pairs with the newer side in the " +
      "delivery (per-item fingerprints make the store exact)") {
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val cut = docs.agg(org.apache.spark.sql.functions.max("doc_id"))
      .head().getLong(0) * 4 / 5 + 1
    val viaDelta = AudioFp.dedupAudioDelta(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val viaOneShot = AudioFp.dedupAudio(spark, dir)
      .filter(org.apache.spark.sql.functions.col("d2") >= cut)
      .collect().map(_.toString).sorted.toSeq
    assert(viaDelta === viaOneShot)
    assert(viaDelta.nonEmpty,
      "no delta pairs — vacuous (planted groups of 5 span the cutoff)")
  }

  test("drift gauge on the fixture: store-served panel is internally " +
      "consistent (the shared bitDriftOf core; arm flips covered by " +
      "PhashSpec)") {
    val rows = AudioFp.audioDriftCheck(spark, dir).collect()
    assert(rows.length === 64)
    val any = rows.exists(_.getAs[Boolean]("occ_shift")) ||
      rows.head.getAs[Boolean]("novelty_drift")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("fp_retrain") === any)
      assert(r.getAs[Double]("novel_rate") ===
        rows.head.getAs[Double]("novel_rate"))
    }
  }
}
