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

  for (fmt <- Seq("png", "bmp"))
  test(s"RealCodec roundtrips a $fmt container losslessly " +
      "(encode -> sniff -> imageio decode -> identical raster)") {
    val bytes = Multimodal.RealCodec.encode(fmt, 12, 9, testPx)
    assert(Multimodal.RealCodec.canDecode(bytes), s"$fmt magic not sniffed")
    assert(fmt != "png" || Multimodal.RealCodec.isPng(bytes))
    assert(fmt != "bmp" || Multimodal.RealCodec.isBmp(bytes))
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
