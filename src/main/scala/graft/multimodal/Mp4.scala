package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/** Minimal REAL ISO-BMFF (MP4) container codec — the demux step of a
  * video training pipeline, hand-built from the PUBLIC box grammar
  * (ISO/IEC 14496-12: ftyp/mdat/moov, trak → mdia → minf → stbl, with
  * the stsd/stts/stsc/stsz/stco/stss sample tables; the same layout
  * every public demuxer parses). The JDK ships no video-container
  * parser, so this closes the reference's video path with REAL
  * container decode:
  *
  *  - [[parse]] walks the box tree of ANY ISO-BMFF payload and
  *    reconstructs the first video track's codec fourcc, dimensions,
  *    timescale/duration, per-sample byte ranges (the stsc×stco×stsz
  *    walk) and sync-sample (keyframe) list — a real demux, whatever
  *    the codec.
  *  - Frame PIXEL decode is then real exactly where a pure-JDK decoder
  *    exists: motion-JPEG tracks (sample entry 'jpeg' — each sample a
  *    complete JPEG, decoded via [[RealCodec]]/javax.imageio). For
  *    compressed codecs the JDK cannot decode (avc1/hevc), the demuxed
  *    sample bytes and metadata are real and the PIXEL stage falls
  *    back to the labeled stub — same honesty contract as compressed
  *    audio.
  *  - [[mux]] writes the fixture side: synthetic JPEG frames into a
  *    spec-shaped ftyp+mdat+moov file any standards demuxer agrees on.
  *
  * Everything is driver-free byte algebra inside `mapPartitions` (the
  * codec layer's sanctioned tool — no Catalyst expression form
  * exists for byte-level container walks). */
object Mp4 {

  /** One parsed video track: sample table fully resolved to absolute
    * (offset, size) byte ranges; `syncSamples` are 0-BASED indices
    * (stss stores 1-based; absent stss ⇒ every sample is sync). */
  case class Track(codec: String, width: Int, height: Int,
      timescale: Long, duration: Long,
      sampleOffsets: IndexedSeq[Long], sampleSizes: IndexedSeq[Int],
      syncSamples: IndexedSeq[Int]) {
    def nSamples: Int = sampleSizes.length
    def sample(payload: Array[Byte], i: Int): Array[Byte] =
      java.util.Arrays.copyOfRange(payload,
        sampleOffsets(i).toInt, sampleOffsets(i).toInt + sampleSizes(i))
  }

  def isMp4(payload: Array[Byte]): Boolean =
    payload.length >= 12 && payload(4) == 'f' && payload(5) == 't' &&
      payload(6) == 'y' && payload(7) == 'p'

  // ------------------------------------------------------------- mux

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def box(typ: String, parts: Array[Byte]*): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write(be32(8L + parts.map(_.length).sum))
    o.write(typ.getBytes(US_ASCII))
    parts.foreach(o.write)
    o.toByteArray
  }

  /** version-0 FullBox header. */
  private def vf(flags: Int = 0): Array[Byte] = be32(flags & 0xFFFFFF)

  private val identityMatrix: Array[Byte] =
    Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
      .toArray.flatMap(be32)

  /** Mux pre-encoded JPEG frames into one spec-shaped MP4 (single
    * motion-JPEG video track, one chunk, `fps` ticks/s with one tick
    * per frame, every `syncEvery`-th sample listed in stss). */
  def mux(w: Int, h: Int, frames: Seq[Array[Byte]], fps: Int = 30,
      syncEvery: Int = 2): Array[Byte] = {
    require(frames.nonEmpty, "muxing an empty track")
    val ftyp = box("ftyp", "isom".getBytes(US_ASCII), be32(0x200),
      "isomiso2mp41".getBytes(US_ASCII))
    val mdat = box("mdat", frames.toArray: _*)
    val firstSample = ftyp.length + 8L // mdat payload = chunk 1 offset
    val n = frames.length

    val mvhd = box("mvhd", vf(), be32(0), be32(0), be32(1000),
      be32(n.toLong * 1000 / fps), be32(0x00010000), be16(0x0100),
      be16(0), be32(0), be32(0), identityMatrix,
      Array.fill(6 * 4)(0.toByte), be32(2))
    val tkhd = box("tkhd", be32(7) /* v0, enabled|in-movie|in-preview */,
      be32(0), be32(0), be32(1), be32(0), be32(n.toLong * 1000 / fps),
      be32(0), be32(0), be16(0), be16(0), be16(0), be16(0),
      identityMatrix, be32(w.toLong << 16), be32(h.toLong << 16))
    val mdhd = box("mdhd", vf(), be32(0), be32(0), be32(fps), be32(n.toLong),
      be16(0x55C4) /* und */, be16(0))
    val hdlr = box("hdlr", vf(), be32(0), "vide".getBytes(US_ASCII),
      be32(0), be32(0), be32(0), "graft".getBytes(US_ASCII) :+ 0.toByte) // null-terminated name
    // VisualSampleEntry 'jpeg' (motion-JPEG: every sample a full JPEG)
    val compressor = {
      val name = "Motion-JPEG".getBytes(US_ASCII)
      (Array(name.length.toByte) ++ name).padTo(32, 0.toByte)
    }
    val entry = box("jpeg", Array.fill(6)(0.toByte), be16(1),
      be16(0), be16(0), be32(0), be32(0), be32(0),
      be16(w), be16(h), be32(0x00480000), be32(0x00480000), be32(0),
      be16(1), compressor, be16(0x0018), be16(0xFFFF))
    val stsd = box("stsd", vf(), be32(1), entry)
    val stts = box("stts", vf(), be32(1), be32(n.toLong), be32(1))
    val syncs = (0 until n).filter(_ % syncEvery == 0)
    val stss = box("stss", vf(), be32(syncs.length.toLong),
      syncs.toArray.flatMap(s => be32(s + 1L))) // 1-based
    val stsc = box("stsc", vf(), be32(1), be32(1), be32(n.toLong), be32(1))
    val stsz = box("stsz", vf(), be32(0), be32(n.toLong),
      frames.toArray.flatMap(f => be32(f.length.toLong)))
    val stco = box("stco", vf(), be32(1), be32(firstSample))
    val stbl = box("stbl", stsd, stts, stss, stsc, stsz, stco)
    val dref = box("dref", vf(), be32(1),
      box("url ", vf(flags = 1))) // self-contained
    val minf = box("minf",
      box("vmhd", vf(flags = 1), be16(0), be16(0), be16(0), be16(0)),
      box("dinf", dref), stbl)
    val moov = box("moov", mvhd,
      box("trak", tkhd, box("mdia", mdhd, hdlr, minf)))
    ftyp ++ mdat ++ moov
  }

  // ----------------------------------------------------------- demux

  private case class B(typ: String, start: Int, end: Int)

  /** Child boxes of [start, end): (fourcc, payload range). Tolerates
    * 64-bit largesize; bails (partial list) on torn headers. */
  private def children(p: Array[Byte], start: Int, end: Int): Seq[B] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[B]
    var i = start
    while (i + 8 <= end) {
      val size32 = u32(p, i)
      val typ = new String(p, i + 4, 4, US_ASCII)
      // size==1 ⇒ 64-bit largesize follows the TYPE field;
      // size==0 ⇒ box extends to the END of the enclosing range
      // (ISO/IEC 14496-12 §4.2 — legal, and common for a final mdat)
      val (size, hdr) =
        if (size32 == 1 && i + 16 <= end)
          (ByteBuffer.wrap(p, i + 8, 8).order(ByteOrder.BIG_ENDIAN)
            .getLong(), 16)
        else if (size32 == 0) ((end - i).toLong, 8)
        else (size32, 8)
      if (size < hdr || i + size > end) return out.toSeq // torn
      out += B(typ, i + hdr, i + size.toInt)
      i += size.toInt
    }
    out.toSeq
  }

  private def u32(p: Array[Byte], i: Int): Long =
    ByteBuffer.wrap(p, i, 4).order(ByteOrder.BIG_ENDIAN).getInt() &
      0xFFFFFFFFL
  private def u16(p: Array[Byte], i: Int): Int =
    ByteBuffer.wrap(p, i, 2).order(ByteOrder.BIG_ENDIAN).getShort() &
      0xFFFF

  /** Parse the FIRST video track ('vide' handler) of an ISO-BMFF
    * payload. None on anything torn or track-less — totality contract
    * of every codec here. */
  def parse(payload: Array[Byte]): Option[Track] =
    try {
      if (!isMp4(payload)) return None
      val top = children(payload, 0, payload.length)
      val moov = top.find(_.typ == "moov").getOrElse(return None)
      children(payload, moov.start, moov.end).filter(_.typ == "trak")
        .flatMap(parseTrack(payload, _)).headOption
    } catch { case scala.util.control.NonFatal(_) => None }

  private def parseTrack(p: Array[Byte], trak: B): Option[Track] = {
    val mdia = children(p, trak.start, trak.end).find(_.typ == "mdia")
      .getOrElse(return None)
    val mc = children(p, mdia.start, mdia.end)
    val hdlr = mc.find(_.typ == "hdlr").getOrElse(return None)
    if (new String(p, hdlr.start + 8, 4, US_ASCII) != "vide") return None
    val mdhd = mc.find(_.typ == "mdhd").getOrElse(return None)
    val v = p(mdhd.start) & 0xFF
    val (timescale, duration) =
      if (v == 1)
        (u32(p, mdhd.start + 20),
          ByteBuffer.wrap(p, mdhd.start + 24, 8).getLong())
      else (u32(p, mdhd.start + 12), u32(p, mdhd.start + 16))
    val minf = mc.find(_.typ == "minf").getOrElse(return None)
    val stbl = children(p, minf.start, minf.end).find(_.typ == "stbl")
      .getOrElse(return None)
    val sc = children(p, stbl.start, stbl.end)
    def tbl(t: String): Option[B] = sc.find(_.typ == t)

    // stsd: first sample entry's fourcc + VisualSampleEntry dims
    val stsd = tbl("stsd").getOrElse(return None)
    val entry = children(p, stsd.start + 8, stsd.end).headOption
      .getOrElse(return None)
    val codec = entry.typ
    val width = u16(p, entry.start + 24)
    val height = u16(p, entry.start + 26)

    // stsz: per-sample sizes (uniform-size form included)
    val stsz = tbl("stsz").getOrElse(return None)
    val uniform = u32(p, stsz.start + 4)
    val n = u32(p, stsz.start + 8).toInt
    val sizes: IndexedSeq[Int] =
      if (uniform != 0) IndexedSeq.fill(n)(uniform.toInt)
      else (0 until n).map(i => u32(p, stsz.start + 12 + 4 * i).toInt)

    // chunk offsets: stco (32-bit) or co64
    val offsets: IndexedSeq[Long] = tbl("stco") match {
      case Some(b) =>
        (0 until u32(p, b.start + 4).toInt)
          .map(i => u32(p, b.start + 8 + 4 * i))
      case None =>
        val b = tbl("co64").getOrElse(return None)
        (0 until u32(p, b.start + 4).toInt).map(i =>
          ByteBuffer.wrap(p, b.start + 8 + 8 * i, 8).getLong())
    }

    // stsc: expand (first_chunk, samples_per_chunk) runs, then walk
    // chunk by chunk accumulating sizes into absolute sample offsets
    val stsc = tbl("stsc").getOrElse(return None)
    val runs = (0 until u32(p, stsc.start + 4).toInt).map { i =>
      val base = stsc.start + 8 + 12 * i
      (u32(p, base).toInt, u32(p, base + 4).toInt)
    }
    if (!offsets.indices.forall(ci => runs.exists(_._1 <= ci + 1)))
      return None // a chunk precedes every stsc run — torn container
    val perChunk = offsets.indices.map(ci =>
      runs.takeWhile(_._1 <= ci + 1).last._2)
    val sampleOffsets = IndexedSeq.newBuilder[Long]
    var s = 0
    perChunk.zip(offsets).foreach { case (cnt, base) =>
      var off = base
      var j = 0
      while (j < cnt && s < n) {
        sampleOffsets += off
        off += sizes(s)
        s += 1; j += 1
      }
    }
    if (s != n) return None // sample tables disagree — torn container

    val syncs: IndexedSeq[Int] = tbl("stss") match {
      case Some(b) => (0 until u32(p, b.start + 4).toInt)
        .map(i => u32(p, b.start + 8 + 4 * i).toInt - 1)
      case None => 0 until n // no stss ⇒ every sample is sync
    }
    Some(Track(codec, width, height, timescale, duration,
      sampleOffsets.result(), sizes, syncs))
  }
}
