package graft.multimodal

import graft.{SparkSuite, TestSpark}

/** The multimodal plumbing around the (clearly-marked) stub codec: the
  * distributed decode path must agree with a direct in-JVM run of the
  * same codec, proving the mapPartitions batch shape loses nothing. */
class MultimodalSpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  test("featureNorms matches a direct single-JVM decode of the same payloads") {
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = docs.map { case (id, text) =>
      val m = Multimodal.FakeCodec.decode(id, text.getBytes("UTF-8"))
      id -> BigDecimal(
        math.sqrt(m.features.map(f => f.toDouble * f).sum))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val actual = Multimodal.featureNorms(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(actual.keySet === expected.keySet)
    val mismatches = expected.collect {
      case (id, e) if math.abs(actual(id) - e) > 1e-6 => id
    }
    assert(mismatches.isEmpty, s"norm mismatch for docs $mismatches")
  }

  test("resizeFeatures average-pools exactly (distributed == direct)") {
    val out = Multimodal.resizeFeatures(spark, dir, outDim = 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    docs.foreach { case (id, text) =>
      val f = Multimodal.FakeCodec.decode(id, text.getBytes("UTF-8")).features
      val expected = f.grouped(2).map(g => g.sum / g.length).toSeq
      assert(out(id).length === 4)
      out(id).zip(expected).foreach { case (a, e) =>
        assert(math.abs(a - e) < 1e-5f, s"doc $id pooled value off")
      }
    }
  }

  test("featureLanes (exact integer algebra) agrees with the float codec path") {
    val exact = Multimodal.featureLanes(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val float = Multimodal.featureNorms(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(exact.keySet === float.keySet)
    exact.foreach { case (id, (nBytes, norm)) =>
      assert(nBytes === float(id)._1.toLong, s"doc $id byte count")
      // float32 accumulation vs exact longs: agree within float tolerance
      assert(math.abs(norm - float(id)._2) < 1e-2,
        s"doc $id norm exact=$norm float=${float(id)._2}")
    }
  }

  test("resizeDigest pooled scalars agree with the float average-pool path") {
    val exact = Multimodal.resizeDigest(spark, dir, outDim = 4).collect()
      .map(r => r.getLong(0) -> (2 to 5).map(r.getDouble)).toMap
    val float = Multimodal.resizeFeatures(spark, dir, outDim = 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(exact.keySet === float.keySet)
    exact.foreach { case (id, pooled) =>
      pooled.zip(float(id)).foreach { case (e, f) =>
        assert(math.abs(e - f) < 1e-2, s"doc $id pooled exact=$e float=$f")
      }
    }
    // driver-hashable contract: no array columns in the query output
    val schema = Multimodal.resizeDigest(spark, dir).schema
    assert(schema.fields.forall(f =>
      !f.dataType.typeName.contains("array")), "raw array column leaked")
  }

  test("decodeFeatures keeps the fixed feature dimension and byte counts") {
    val out = Multimodal.decodeFeatures(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.features.length === Multimodal.FakeCodec.FeatureDim))
    assert(out.forall(m => m.n_bytes > 0))
  }

  // ------------------------------------------------------- real codec

  private val testPx = Array.tabulate(12 * 9)(i => (i * 37 + 5) % 256)

  for (fmt <- Seq("png", "bmp", "gif"))
  test(s"RealCodec roundtrips a $fmt container losslessly " +
      "(encode -> sniff -> imageio decode -> identical raster)") {
    val bytes = Multimodal.RealCodec.encode(fmt, 12, 9, testPx)
    assert(Multimodal.RealCodec.canDecode(bytes), s"$fmt magic not sniffed")
    assert(fmt != "png" || Multimodal.RealCodec.isPng(bytes))
    assert(fmt != "bmp" || Multimodal.RealCodec.isBmp(bytes))
    assert(fmt != "gif" || Multimodal.RealCodec.isGif(bytes))
    val (w, h, px) = Multimodal.RealCodec.decode(bytes).get
    assert((w, h) === ((12, 9)))
    assert(px.toSeq === testPx.toSeq,
      s"$fmt decode must recover the exact grayscale raster")
  }

  test("decodeAny dispatches by content: real containers get pixel " +
      "features, text payloads the byte-level stub, corrupt containers " +
      "fall back deterministically") {
    // real PNG -> features are DECODED-PIXEL lane sums / 255
    val png = Multimodal.RealCodec.encode("png", 12, 9, testPx)
    val real = Multimodal.decodeAny(7L, png)
    val expected = new Array[Float](Multimodal.FakeCodec.FeatureDim)
    testPx.zipWithIndex.foreach { case (v, i) =>
      expected(i % expected.length) += v / 255.0f
    }
    real.features.zip(expected).foreach { case (a, e) =>
      assert(math.abs(a - e) < 1e-4f, "pixel-derived feature off")
    }
    assert(real.n_bytes === png.length)
    // a PNG's features come from pixels, NOT container bytes: the stub
    // on the same payload must disagree (else the dispatch is vacuous)
    val stubOnPng = Multimodal.FakeCodec.decode(7L, png)
    assert(!real.features.sameElements(stubOnPng.features))
    // text payload -> byte-identical to the stub
    val text = "plain text payload".getBytes("UTF-8")
    assert(Multimodal.decodeAny(7L, text).features.toSeq ===
      Multimodal.FakeCodec.decode(7L, text).features.toSeq)
    // PNG magic but torn body -> sniffed real, decode fails, falls back
    // to the stub on the SAME bytes (total, deterministic)
    val torn = png.take(20)
    assert(Multimodal.RealCodec.canDecode(torn))
    assert(Multimodal.RealCodec.decode(torn).isEmpty)
    assert(Multimodal.decodeAny(7L, torn).features.toSeq ===
      Multimodal.FakeCodec.decode(7L, torn).features.toSeq)
    // PNG magic + garbage body (valid-length chunks of junk): whatever
    // the JDK parser throws at it, decode stays total and falls back
    val garbage = png.take(8) ++ Array.tabulate(256)(i => (i * 97 + 13).toByte)
    assert(Multimodal.RealCodec.canDecode(garbage))
    assert(Multimodal.RealCodec.decode(garbage).isEmpty)
    assert(Multimodal.decodeAny(7L, garbage).features.toSeq ===
      Multimodal.FakeCodec.decode(7L, garbage).features.toSeq)
  }

  test("resizeRoundtrip's distributed decode+pool equals the formula " +
      "directly (the oracle's half, computed in-JVM)") {
    val out = Multimodal.resizeRoundtrip(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    assert(out.nonEmpty)
    out.foreach { case (id, (w2, h2, digest)) =>
      val w = ((id % 8 + 4) * 2).toInt
      val h = ((id % 4 + 4) * 2).toInt
      assert(w2 === w / 2 && h2 === h / 2, s"doc $id pooled dims")
      def px(x: Int, y: Int): Long = Multimodal.synthPixel(id, y * w + x, w)
      val lanes = new Array[Long](Multimodal.FakeCodec.FeatureDim)
      for (cy <- 0 until h / 2; cx <- 0 until w / 2) {
        val pooled = (px(2 * cx, 2 * cy) + px(2 * cx + 1, 2 * cy) +
          px(2 * cx, 2 * cy + 1) + px(2 * cx + 1, 2 * cy + 1)) / 4
        lanes((cy * (w / 2) + cx) % lanes.length) += pooled
      }
      val want = java.security.MessageDigest.getInstance("MD5")
        .digest(lanes.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(digest === want, s"doc $id pooled lane digest diverges")
    }
  }

  test("RealCodec decodes JPEG for real (lossy: dims exact, pixels " +
      "within codec tolerance, dispatch uses decoded pixels)") {
    val bytes = Multimodal.RealCodec.encode("jpg", 12, 9, testPx)
    assert(Multimodal.RealCodec.isJpeg(bytes), "JPEG magic not sniffed")
    assert(Multimodal.RealCodec.canDecode(bytes))
    val (w, h, px) = Multimodal.RealCodec.decode(bytes).get
    assert((w, h) === ((12, 9)), "JPEG dims must be exact")
    val errs = px.zip(testPx).map { case (a, e) => math.abs(a - e) }
    assert(errs.sum.toDouble / errs.length < 16,
      s"mean JPEG error ${errs.sum.toDouble / errs.length} too high")
    assert(errs.max < 64, s"max JPEG error ${errs.max} too high")
    // dispatch: features come from DECODED pixels, not container bytes
    val real = Multimodal.decodeAny(7L, bytes)
    assert(!real.features.sameElements(
      Multimodal.FakeCodec.decode(7L, bytes).features))
    val fromPx = new Array[Float](Multimodal.FakeCodec.FeatureDim)
    px.zipWithIndex.foreach { case (v, i) =>
      fromPx(i % fromPx.length) += v / 255.0f
    }
    real.features.zip(fromPx).foreach { case (a, e) =>
      assert(math.abs(a - e) < 1e-4f, "JPEG feature not pixel-derived")
    }
  }

  test("encodeAnimated/decodeFrames roundtrips every frame of an " +
      "animated GIF losslessly, in order") {
    val frames = (0 until 3).map(f =>
      Array.tabulate(10 * 7)(i => (f * 41 + i * 13 + 5) % 256))
    val gif = Multimodal.RealCodec.encodeAnimated(10, 7, frames)
    assert(Multimodal.RealCodec.isGif(gif), "animated GIF magic")
    val (w, h, dec) = Multimodal.RealCodec.decodeFrames(gif).get
    assert((w, h) === ((10, 7)))
    assert(dec.length === 3, "frame count")
    dec.zip(frames).zipWithIndex.foreach { case ((d, e), f) =>
      assert(d.toSeq === e.toSeq, s"frame $f diverges")
    }
    // a single-frame container decodes through the same API with n=1
    val png = Multimodal.RealCodec.encode("png", 12, 9, testPx)
    val (pw, ph, pf) = Multimodal.RealCodec.decodeFrames(png).get
    assert((pw, ph, pf.length) === ((12, 9, 1)))
    assert(pf.head.toSeq === testPx.toSeq)
    // totality: garbage behind a GIF magic → None
    val garbage = gif.take(6) ++ Array.tabulate(64)(i => (i * 31).toByte)
    assert(Multimodal.RealCodec.decodeFrames(garbage).isEmpty)
  }

  test("videoRoundtrip's distributed animated-GIF decode equals the " +
      "formula directly (the oracle's half, computed in-JVM)") {
    val out = Multimodal.videoRoundtrip(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out.nonEmpty)
    val ids = out.keys.map(_._1).toSet
    ids.foreach { id =>
      val nF = id % 4 + 2
      val w = id % 6 + 6
      val h = id % 3 + 6
      assert(out.keys.count(_._1 == id) === nF, s"doc $id frame count")
      (0L until nF).foreach { f =>
        val (ow, oh, digest) = out((id, f))
        assert((ow, oh) === ((w, h)), s"doc $id dims")
        val lanes = new Array[Long](Multimodal.FakeCodec.FeatureDim)
        (0L until w * h).foreach(i =>
          lanes((i % lanes.length).toInt) +=
            Multimodal.synthFramePixel(id, f, i, w))
        val want = java.security.MessageDigest.getInstance("MD5")
          .digest(lanes.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(digest === want, s"doc $id frame $f digest diverges")
      }
    }
  }

  // ------------------------------------------------------- audio codec

  private val testWave =
    Array.tabulate(96)(i => ((i * 523 + 11) % 4096) - 2048)

  for (ch <- Seq(1, 2))
  test(s"AudioCodec roundtrips a $ch-channel WAV losslessly " +
      "(encode -> sniff -> javax.sound decode -> identical samples)") {
    val wav = Multimodal.AudioCodec.encode(16000, ch, testWave)
    assert(Multimodal.AudioCodec.isWav(wav), "WAV magic not sniffed")
    assert(!Multimodal.RealCodec.canDecode(wav), "image sniff stole a WAV")
    val (rate, chans, dec) = Multimodal.AudioCodec.decode(wav).get
    assert(rate === 16000, "sample rate not recovered from the container")
    assert(chans === ch, "channel count not recovered from the container")
    assert(dec.toSeq === testWave.toSeq,
      s"$ch-channel decode must recover the exact interleaved samples")
  }

  test("AudioCodec decode is total: RIFF magic with a garbage body " +
      "returns None and decodeAny falls back to the stub") {
    val wav = Multimodal.AudioCodec.encode(8000, 1, testWave)
    // torn container: header cut mid-fmt-chunk
    val torn = wav.take(16)
    assert(Multimodal.AudioCodec.canDecode(torn))
    assert(Multimodal.AudioCodec.decode(torn).isEmpty)
    assert(Multimodal.decodeAny(9L, torn).features.toSeq ===
      Multimodal.FakeCodec.decode(9L, torn).features.toSeq)
    // valid RIFF/WAVE magic, junk body
    val garbage = wav.take(12) ++
      Array.tabulate(128)(i => (i * 89 + 7).toByte)
    assert(Multimodal.AudioCodec.canDecode(garbage))
    assert(Multimodal.AudioCodec.decode(garbage).isEmpty)
    assert(Multimodal.decodeAny(9L, garbage).features.toSeq ===
      Multimodal.FakeCodec.decode(9L, garbage).features.toSeq)
  }

  test("decodeAny dispatches WAV payloads to sample-derived features") {
    val wav = Multimodal.AudioCodec.encode(8000, 1, testWave)
    val real = Multimodal.decodeAny(9L, wav)
    val expected = new Array[Float](Multimodal.FakeCodec.FeatureDim)
    testWave.zipWithIndex.foreach { case (s, i) =>
      expected(i % expected.length) += (s + 32768) / 65535.0f
    }
    real.features.zip(expected).foreach { case (a, e) =>
      assert(math.abs(a - e) < 1e-3f, "sample-derived feature off")
    }
    assert(real.n_bytes === wav.length)
    // features must come from samples, NOT container bytes
    assert(!real.features.sameElements(
      Multimodal.FakeCodec.decode(9L, wav).features))
  }

  test("audioRoundtrip's distributed WAV decode equals the formula " +
      "directly (the oracle's half, computed in-JVM)") {
    val out = Multimodal.audioRoundtrip(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))).toMap
    assert(out.nonEmpty)
    out.foreach { case (id, (rate, ch, n, digest)) =>
      assert(rate === 8000 + (id % 3) * 4000, s"doc $id sample rate")
      assert(ch === id % 2 + 1, s"doc $id channels")
      assert(n === (id % 64 + 32) * (id % 2 + 1), s"doc $id sample count")
      val lanes = new Array[Long](Multimodal.FakeCodec.FeatureDim)
      (0L until n).foreach(i =>
        lanes((i % lanes.length).toInt) += Multimodal.synthSample(id, i))
      val want = java.security.MessageDigest.getInstance("MD5")
        .digest(lanes.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(digest === want, s"doc $id decoded sample digest diverges")
    }
  }

  test("audioFrames windows the decoded waveform exactly (energy + peak)") {
    val out = Multimodal.audioFrames(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.nonEmpty)
    val ids = out.keys.map(_._1).toSet
    ids.foreach { id =>
      val n = ((id % 64 + 32) * (id % 2 + 1)).toInt
      val s = Array.tabulate(n)(i => Multimodal.synthSample(id, i))
      val frames = (n + 15) / 16
      assert(out.keys.count(_._1 == id) === frames, s"doc $id frame count")
      s.grouped(16).zipWithIndex.foreach { case (win, fi) =>
        val want = (win.length.toLong, win.map(x => x * x).sum,
          win.map(math.abs).max)
        assert(out((id, fi.toLong)) === want, s"doc $id frame $fi diverges")
      }
    }
  }

  test("decodeRoundtrip's distributed PNG decode equals the formula " +
      "directly (the oracle's half, computed in-JVM)") {
    val out = Multimodal.decodeRoundtrip(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    assert(out.nonEmpty)
    out.foreach { case (id, (w, h, digest)) =>
      assert(w === id % 16 + 8)
      assert(h === id % 8 + 8)
      val lanes = new Array[Long](Multimodal.FakeCodec.FeatureDim)
      (0L until w * h).foreach(i =>
        lanes((i % lanes.length).toInt) += Multimodal.synthPixel(id, i, w))
      val want = java.security.MessageDigest.getInstance("MD5")
        .digest(lanes.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(digest === want, s"doc $id decoded lane digest diverges")
    }
  }
}
