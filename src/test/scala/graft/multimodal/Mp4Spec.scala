package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The ISO-BMFF codec on its own (no Spark): mux → demux must be a
  * BYTE-EXACT container roundtrip — the demuxed sample ranges return
  * the muxed JPEG bytes verbatim (container transport is lossless even
  * though the JPEG inside is not), sample tables resolve correctly,
  * and torn/foreign payloads degrade to None, never throw. */
class Mp4Spec extends AnyFunSuite {

  private def jpeg(seed: Int, w: Int, h: Int): Array[Byte] =
    Multimodal.RealCodec.encode("jpg", w, h,
      Array.tabulate(w * h)(i => (seed * 41 + i * 13) % 256))

  test("mux -> parse roundtrips the sample table byte-exactly") {
    val frames = (0 until 5).map(jpeg(_, 12, 9))
    val mp4 = Mp4.mux(12, 9, frames, fps = 30, syncEvery = 2)
    assert(Mp4.isMp4(mp4))
    val t = Mp4.parse(mp4).get
    assert(t.codec === "jpeg")
    assert((t.width, t.height) === ((12, 9)))
    assert(t.timescale === 30L && t.duration === 5L)
    assert(t.nSamples === 5)
    assert(t.syncSamples === IndexedSeq(0, 2, 4), "stss walk")
    (0 until 5).foreach { i =>
      assert(t.sample(mp4, i).toSeq === frames(i).toSeq,
        s"sample $i bytes drifted through the container")
    }
    // every extracted keyframe decodes as a real JPEG
    t.syncSamples.foreach { i =>
      val (w, h, _) = Multimodal.RealCodec.decode(t.sample(mp4, i)).get
      assert((w, h) === ((12, 9)))
    }
  }

  test("single-frame and no-sync-subsampling edge shapes") {
    val one = Mp4.mux(6, 6, Seq(jpeg(7, 6, 6)), syncEvery = 1)
    val t = Mp4.parse(one).get
    assert(t.nSamples === 1 && t.syncSamples === IndexedSeq(0))
  }

  test("torn or foreign payloads parse to None, never throw") {
    val mp4 = Mp4.mux(8, 8, (0 until 3).map(jpeg(_, 8, 8)))
    assert(Mp4.parse(mp4.take(40)) === None, "truncated mid-mdat")
    assert(Mp4.parse(Array[Byte](1, 2, 3)) === None, "garbage")
    assert(Mp4.parse(jpeg(1, 8, 8)) === None, "a bare JPEG is not BMFF")
    // flip a byte inside moov's stsz region: either torn (None) or
    // still structurally parseable — must not throw either way
    val broken = mp4.clone()
    broken(broken.length - 20) = 0x7F.toByte
    Mp4.parse(broken)
  }

  test("size==0 final box (extends-to-EOF, ISO 14496-12 §4.2) demuxes") {
    val frames = (0 until 3).map(jpeg(_, 8, 8))
    val mp4 = Mp4.mux(8, 8, frames)
    // this muxer writes mdat-then-moov, so the FINAL top-level box is
    // moov — rewrite ITS size field to the legal extends-to-EOF 0 form
    // (same parser path a streaming muxer's final mdat would hit)
    val idx = (0 to mp4.length - 8).findLast(i =>
      mp4(i + 4) == 'm' && mp4(i + 5) == 'o' && mp4(i + 6) == 'o' &&
        mp4(i + 7) == 'v' &&
        i + java.nio.ByteBuffer.wrap(mp4, i, 4).getInt == mp4.length)
      .getOrElse(fail("test precondition: no EOF-terminal moov found"))
    val eof = mp4.clone()
    (0 until 4).foreach(j => eof(idx + j) = 0)
    val t = Mp4.parse(eof).getOrElse(
      fail("size==0 final mdat fell to None despite a parseable moov"))
    assert(t.nSamples === 3)
    (0 until 3).foreach { i =>
      assert(t.sample(eof, i).toSeq === frames(i).toSeq,
        s"sample $i drifted under the size==0 mdat form")
    }
  }

  test("decodeAny dispatches MP4 to the first keyframe's pixels") {
    val w = 10; val h = 8
    val px0 = Array.tabulate(w * h)(i => (i * 13 + 5) % 256)
    val mp4 = Mp4.mux(w, h, Seq(
      Multimodal.RealCodec.encode("jpg", w, h, px0),
      jpeg(3, w, h)))
    val feats = Multimodal.decodeAny(11L, mp4)
    assert(feats.n_bytes === mp4.length)
    // features must be pixel-derived (≈ decoded keyframe lanes), not
    // the byte-level stub's
    val stub = Multimodal.FakeCodec.decode(11L, mp4)
    assert(!feats.features.sameElements(stub.features),
      "MP4 fell through to the stub")
    val decoded = Multimodal.RealCodec.decode(
      Mp4.parse(mp4).get.sample(mp4, 0)).get._3
    val want = new Array[Float](Multimodal.FakeCodec.FeatureDim)
    decoded.zipWithIndex.foreach { case (v, i) =>
      want(i % want.length) += v / 255.0f
    }
    feats.features.zip(want).foreach { case (a, e) =>
      assert(math.abs(a - e) < 1e-4f, "features not keyframe-derived")
    }
  }

  test("a non-JPEG (avc1-style) track still demuxes; pixels go to stub") {
    // splice the stsd fourcc to 'avc1': the demux must still resolve
    // the track and samples (REAL metadata), while decodeAny falls to
    // the labeled stub for pixels it cannot decode
    val mp4 = Mp4.mux(8, 8, (0 until 2).map(jpeg(_, 8, 8)))
    val idx = {
      val pat = "jpeg".getBytes("US-ASCII")
      (0 until mp4.length - 4).find(i => pat.indices.forall(j =>
        mp4(i + j) == pat(j))).get
    }
    val spliced = mp4.clone()
    "avc1".getBytes("US-ASCII").zipWithIndex.foreach { case (b, j) =>
      spliced(idx + j) = b
    }
    val t = Mp4.parse(spliced).get
    assert(t.codec === "avc1" && t.nSamples === 2)
    val feats = Multimodal.decodeAny(5L, spliced)
    assert(feats.features.sameElements(
      Multimodal.FakeCodec.decode(5L, spliced).features),
      "undecodable codec must fall to the deterministic stub")
  }
}
