package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Multimodal column plumbing (builder directive): media ride along as
  * opaque BINARY columns with typed metadata; decode / feature-extract are
  * per-partition batch operations.
  *
  * Two codecs behind one dispatch ([[decodeAny]]), selected by CONTENT
  * SNIFFING on the payload's magic bytes:
  *  - [[RealCodec]] — actual PNG/BMP container decode via the JDK's own
  *    `javax.imageio` (public, in-JDK — no external codec libs needed):
  *    payload → BufferedImage → row-major raster samples. Proven under
  *    the driver's hash gate by [[decodeRoundtrip]]: a synthetic
  *    grayscale image with an oracle-shared pixel formula goes through a
  *    real PNG encode → sniff → decode cycle, and the decoded raster's
  *    lane sums must equal what DuckDB computes from the formula alone
  *    (PNG is lossless, so any container mis-parse diverges the hash).
  *  - [[AudioCodec]] — actual WAV (RIFF/WAVE) PCM container decode via
  *    the JDK's own `javax.sound.sampled` (public, in-JDK): payload →
  *    AudioInputStream → interleaved signed samples plus the container's
  *    own rate/channel metadata. Proven under the driver's hash gate by
  *    [[audioRoundtrip]] the same way as the image path: PCM is
  *    lossless, so the decoded samples' lane sums must equal what DuckDB
  *    computes from the shared waveform formula alone.
  *  - [[FakeCodec]] — the DETERMINISTIC STUB for formats the JDK cannot
  *    decode (compressed audio, real video codecs): plausible metadata
  *    and a fixed-shape feature vector derived from the raw bytes. The
  *    batch-shape plumbing (BinaryType column, typed result schema,
  *    partition-wise batching via mapPartitions — the Scala analogue of
  *    mapInPandas) is identical either way, so swapping in further real
  *    codecs is a dispatch-table entry, not a pipeline change.
  */
object Multimodal {

  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
      n_frames: Int)

  case class MediaFeatures(doc_id: Long, n_bytes: Int,
      features: Array[Float])

  /** STUB CODEC — replace `decode` with a real image/audio decoder. */
  object FakeCodec {
    val FeatureDim = 8

    /** Deterministic fake decode: metadata from byte length, features from
      * a rolling byte checksum. A real decoder would parse the container
      * format here. */
    def decode(docId: Long, payload: Array[Byte]): MediaFeatures = {
      val feats = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) {
        feats(i % FeatureDim) += (payload(i) & 0xFF) / 255.0f
        i += 1
      }
      MediaFeatures(docId, payload.length, feats)
    }
  }

  /** REAL image codec: PNG/BMP/GIF/JPEG via the JDK's `javax.imageio`.
    * Grayscale rasters only (band 0) — exactly what the roundtrip
    * fixture writes; a multi-band image would still decode (band 0 =
    * red), the fixture just has no use for it. Memory-only (no ImageIO
    * disk cache). */
  object RealCodec {
    javax.imageio.ImageIO.setUseCache(false)

    private val pngMagic =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    def isPng(payload: Array[Byte]): Boolean =
      payload.length >= 8 && pngMagic.indices.forall(i =>
        payload(i) == pngMagic(i))

    def isBmp(payload: Array[Byte]): Boolean =
      payload.length >= 2 && payload(0) == 'B'.toByte &&
        payload(1) == 'M'.toByte

    def isGif(payload: Array[Byte]): Boolean =
      payload.length >= 6 && payload(0) == 'G'.toByte &&
        payload(1) == 'I'.toByte && payload(2) == 'F'.toByte

    def isJpeg(payload: Array[Byte]): Boolean =
      payload.length >= 3 && (payload(0) & 0xFF) == 0xFF &&
        (payload(1) & 0xFF) == 0xD8 && (payload(2) & 0xFF) == 0xFF

    /** Content sniff: does this payload carry a container the JDK can
      * actually decode here? PNG/BMP/GIF are lossless for 8-bit
      * grayscale (hash-gated via the roundtrip keys); JPEG decodes for
      * real too but is LOSSY, so it is tolerance-tested in the spec and
      * kept out of the exact-roundtrip fixtures. */
    def canDecode(payload: Array[Byte]): Boolean =
      isPng(payload) || isBmp(payload) || isGif(payload) ||
        isJpeg(payload)

    /** Decode container bytes → (width, height, row-major band-0
      * samples). None when the container is unreadable (truncated or
      * corrupt despite a valid magic) — the dispatch then falls back to
      * the byte-level stub, keeping the pipeline total. */
    def decode(payload: Array[Byte]): Option[(Int, Int, Array[Int])] =
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (img == null) None
        else Some((img.getWidth, img.getHeight, readRaster(img)))
      } catch {
        // NonFatal, not just IOException: the JDK's format parsers can
        // throw RuntimeExceptions (negative array sizes, bad index
        // math) on malformed-but-magic'd bodies, and the documented
        // contract is totality — any unreadable container falls back
        // to the stub rather than failing the task.
        case scala.util.control.NonFatal(_) => None
      }

    /** Row-major band-0 read of one decoded image. Indexed images
      * (GIF): band-0 samples are PALETTE INDICES, not gray values —
      * read through the color model instead (getRGB is palette-exact
      * for indexed; for TYPE_BYTE_GRAY it would apply a colorspace
      * transform, so keep raw samples there). */
    private def readRaster(img: java.awt.image.BufferedImage): Array[Int] = {
      val (w, h) = (img.getWidth, img.getHeight)
      val indexed = img.getColorModel
        .isInstanceOf[java.awt.image.IndexColorModel]
      val raster = img.getRaster
      val px = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          px(y * w + x) =
            if (indexed) img.getRGB(x, y) & 0xFF
            else raster.getSample(x, y, 0)
          x += 1
        }
        y += 1
      }
      px
    }

    /** MULTI-FRAME decode — the video-like path: every frame of an
      * animated GIF (or the single frame of any other readable
      * container), via the JDK's ImageReader sequence API. None on
      * anything unreadable, same totality contract as [[decode]]. */
    def decodeFrames(payload: Array[Byte])
        : Option[(Int, Int, Seq[Array[Int]])] =
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) { iis.close(); None }
        else {
          val rd = readers.next()
          try {
            rd.setInput(iis)
            val n = rd.getNumImages(true)
            if (n <= 0) None
            else {
              val imgs = (0 until n).map(rd.read)
              Some((imgs.head.getWidth, imgs.head.getHeight,
                imgs.map(readRaster)))
            }
          } finally { rd.dispose(); iis.close() }
        }
      } catch {
        case scala.util.control.NonFatal(_) => None
      }

    /** Encode grayscale frames into one ANIMATED GIF container — the
      * fixture side of the multi-frame roundtrip. */
    def encodeAnimated(w: Int, h: Int, frames: Seq[Array[Int]])
        : Array[Byte] = {
      require(frames.nonEmpty && frames.forall(_.length == w * h),
        s"every frame must be $w x $h")
      val bos = new java.io.ByteArrayOutputStream()
      val wr = javax.imageio.ImageIO
        .getImageWritersByFormatName("gif").next()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        wr.setOutput(ios)
        wr.prepareWriteSequence(null)
        frames.foreach { px =>
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { raster.setSample(x, y, 0, px(y * w + x)); x += 1 }
            y += 1
          }
          wr.writeToSequence(
            new javax.imageio.IIOImage(img, null, null),
            wr.getDefaultWriteParam)
        }
        wr.endWriteSequence()
      } finally { wr.dispose(); ios.close() }
      bos.toByteArray
    }

    /** Encode row-major grayscale pixels into a real container
      * (`format`: "png" or "bmp") — the test/fixture side of the
      * roundtrip; production payloads arrive already encoded. */
    def encode(format: String, w: Int, h: Int, px: Array[Int])
        : Array[Byte] = {
      require(px.length == w * h, s"need $w x $h pixels, got ${px.length}")
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, px(y * w + x)); x += 1 }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, format, out),
        s"JDK has no writer for format '$format'")
      out.toByteArray
    }
  }

  /** REAL audio codec: WAV (RIFF/WAVE) PCM via the JDK's own
    * `javax.sound.sampled`. Decodes the uncompressed PCM encodings the
    * JDK's WAVE reader actually parses (signed 16-bit either endian,
    * 8-bit signed/unsigned); anything else — compressed audio, torn
    * container — returns None and the dispatch falls back to the stub,
    * keeping the pipeline total. */
  object AudioCodec {

    /** RIFF....WAVE container sniff (bytes 0-3 and 8-11). */
    def isWav(payload: Array[Byte]): Boolean =
      payload.length >= 12 &&
        payload(0) == 'R'.toByte && payload(1) == 'I'.toByte &&
        payload(2) == 'F'.toByte && payload(3) == 'F'.toByte &&
        payload(8) == 'W'.toByte && payload(9) == 'A'.toByte &&
        payload(10) == 'V'.toByte && payload(11) == 'E'.toByte

    def canDecode(payload: Array[Byte]): Boolean = isWav(payload)

    /** Decode WAV bytes → (sampleRate, channels, interleaved signed
      * samples in frame order). None when the JDK can't parse the
      * container or the encoding isn't plain PCM. */
    def decode(payload: Array[Byte])
        : Option[(Int, Int, Array[Int])] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = in.getFormat
          val enc = fmt.getEncoding
          val bits = fmt.getSampleSizeInBits
          import javax.sound.sampled.AudioFormat.Encoding._
          val supported =
            (enc == PCM_SIGNED && (bits == 16 || bits == 8)) ||
              (enc == PCM_UNSIGNED && bits == 8)
          if (!supported) None
          else {
            val bytes = in.readAllBytes()
            val n = bytes.length / (bits / 8)
            val out = new Array[Int](n)
            var i = 0
            if (bits == 16) {
              val be = fmt.isBigEndian
              while (i < n) {
                val b0 = bytes(2 * i) & 0xFF
                val b1 = bytes(2 * i + 1) & 0xFF
                out(i) =
                  (if (be) (b0 << 8) | b1 else (b1 << 8) | b0).toShort.toInt
                i += 1
              }
            } else {
              val signed = enc == PCM_SIGNED
              while (i < n) {
                out(i) = if (signed) bytes(i).toInt else bytes(i) & 0xFF
                i += 1
              }
            }
            Some((fmt.getSampleRate.toInt, fmt.getChannels, out))
          }
        } finally in.close()
      } catch {
        // NonFatal for the same totality contract as RealCodec: a
        // magic'd-but-malformed container degrades to the stub instead
        // of failing the Spark task.
        case scala.util.control.NonFatal(_) => None
      }

    /** Encode interleaved signed 16-bit samples into a real WAV
      * container — the test/fixture side of the roundtrip; production
      * payloads arrive already encoded. */
    def encode(sampleRate: Int, channels: Int, samples: Array[Int])
        : Array[Byte] = {
      require(channels > 0 && samples.length % channels == 0,
        s"${samples.length} samples not a whole number of $channels-channel frames")
      val data = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        val s = samples(i)
        require(s >= Short.MinValue && s <= Short.MaxValue,
          s"sample $s outside signed 16-bit range")
        data(2 * i) = (s & 0xFF).toByte            // little-endian PCM
        data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        sampleRate.toFloat, 16, channels, channels * 2, sampleRate.toFloat,
        false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt,
        (samples.length / channels).toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    /** Encode unsigned 8-bit PCM WAV (the WAV spec's 8-bit form is
      * unsigned). `samples8` are the UNSIGNED byte values 0..255 the
      * decoder will hand back verbatim — the caller owns the width
      * reduction (e.g. `x/256 + 128` for 16-bit material whose samples
      * are exact multiples of 256, which makes the re-encode lossless
      * up to one linear map — the invariance [[AudioFp]] leans on). */
    def encode8(sampleRate: Int, channels: Int, samples8: Array[Int])
        : Array[Byte] = {
      require(channels > 0 && samples8.length % channels == 0,
        s"${samples8.length} samples not a whole number of $channels-channel frames")
      val data = new Array[Byte](samples8.length)
      var i = 0
      while (i < samples8.length) {
        val s = samples8(i)
        require(s >= 0 && s <= 255, s"sample $s outside unsigned 8-bit range")
        data(i) = (s & 0xFF).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
        sampleRate.toFloat, 8, channels, channels, sampleRate.toFloat,
        false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt,
        (samples8.length / channels).toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
  }

  /** Codec dispatch by content sniffing: real container formats decode
    * for real ([[RealCodec]] — features from DECODED PIXELS;
    * [[AudioCodec]] — features from DECODED SAMPLES), everything else
    * (and any corrupt-but-magic'd container) flows through the
    * deterministic byte-level stub. Same result shape either way — the
    * distributed plumbing cannot tell codecs apart. */
  def decodeAny(docId: Long, payload: Array[Byte]): MediaFeatures =
    if (RealCodec.canDecode(payload))
      RealCodec.decode(payload) match {
        case Some((_, _, px)) =>
          val feats = new Array[Float](FakeCodec.FeatureDim)
          var i = 0
          while (i < px.length) {
            feats(i % FakeCodec.FeatureDim) += px(i) / 255.0f
            i += 1
          }
          MediaFeatures(docId, payload.length, feats)
        case None => FakeCodec.decode(docId, payload)
      }
    else if (AudioCodec.canDecode(payload))
      AudioCodec.decode(payload) match {
        case Some((_, _, samples)) =>
          val feats = new Array[Float](FakeCodec.FeatureDim)
          var i = 0
          while (i < samples.length) {
            // signed sample mapped to [0,1], mirroring the pixel path
            feats(i % FakeCodec.FeatureDim) +=
              (samples(i) + 32768) / 65535.0f
            i += 1
          }
          MediaFeatures(docId, payload.length, feats)
        case None => FakeCodec.decode(docId, payload)
      }
    else if (Mp4.isMp4(payload))
      // REAL ISO-BMFF demux ([[Mp4.parse]]); pixel decode is real for
      // motion-JPEG tracks (first keyframe through the JPEG codec —
      // the keyframe-extraction shape); codecs the JDK cannot decode
      // (avc1/hevc) fall to the labeled stub like compressed audio
      (for {
        track <- Mp4.parse(payload)
        if track.codec == "jpeg" && track.syncSamples.nonEmpty
        px <- RealCodec.decode(
          track.sample(payload, track.syncSamples.head)).map(_._3)
      } yield {
        val feats = new Array[Float](FakeCodec.FeatureDim)
        var i = 0
        while (i < px.length) {
          feats(i % FakeCodec.FeatureDim) += px(i) / 255.0f
          i += 1
        }
        MediaFeatures(docId, payload.length, feats)
      }).getOrElse(FakeCodec.decode(docId, payload))
    else FakeCodec.decode(docId, payload)

  /** The pixel formula the roundtrip fixture and the DuckDB oracle
    * SHARE — Spark writes these pixels into a real PNG and decodes them
    * back; the oracle recomputes them in pure SQL. */
  def synthPixel(docId: Long, i: Long, w: Long): Long =
    (docId * 31 + (i % w) * 7 + (i / w) * 13) % 256

  /** REAL decode under the driver's hash gate: per document, a synthetic
    * grayscale image (dims and pixels from oracle-shared formulas) is
    * encoded into a genuine container — PNG, BMP, or GIF by
    * `doc_id % 3`, so ALL THREE real container paths sit under the one
    * hash — content-sniffed, decoded by [[RealCodec]], and reduced to
    * exact-integer lane sums over the DECODED raster. All three formats
    * are lossless for 8-bit grayscale, so the sums must equal the
    * oracle's formula-only computation — a container mis-parse, band or
    * palette mixup, row-order bug, or sniff failure diverges the hash.
    * One imageio encode+decode per row, partition-batched; image size
    * is bounded (≤ 23×15), so the per-row cost is fixed and small. */
  def decodeRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nLanes = FakeCodec.FeatureDim
    val formats = Array("png", "bmp", "gif")
    Tables.fanOut(Tables.load(spark, dir, "documents"))
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (id % 16 + 8).toInt
        val h = (id % 8 + 8).toInt
        val px = Array.tabulate(w * h)(i => synthPixel(id, i, w).toInt)
        val fmt = formats((id % 3).toInt)
        val png = RealCodec.encode(fmt, w, h, px)
        require(RealCodec.canDecode(png),
          s"doc $id: encoder produced unsniffable $fmt")
        val (dw, dh, dec) = RealCodec.decode(png).getOrElse(
          sys.error(s"doc $id: JDK failed to decode its own $fmt"))
        val lanes = new Array[Long](nLanes)
        var i = 0
        while (i < dec.length) { lanes(i % nLanes) += dec(i); i += 1 }
        (id, dw.toLong, dh.toLong, lanes.toSeq)
      })
      .toDF("doc_id", "width", "height", "lanes")
      .select(col("doc_id"), col("width"), col("height"),
        md5(concat_ws(" ",
          expr("transform(lanes, x -> cast(x as string))")))
          .as("decoded_lane_digest"))
      .orderBy("doc_id")
  }

  /** REAL pixel-space resize under the driver's hash gate — the "resize
    * to model input shape" step with actual decoded pixels, not stub
    * byte-features ([[resizeDigest]] keeps the stub twin for non-image
    * payloads). Per document: synthetic even-dimension grayscale pixels
    * → real PNG encode → sniff → [[RealCodec]] decode → 2×2 average
    * pool in EXACT integer space (sum of the 4 source pixels DIV 4) →
    * lane sums over the pooled raster. The oracle recomputes the pool
    * from the pixel formula alone, so a decode, row-order, or pooling
    * bug diverges the hash. */
  def resizeRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nLanes = FakeCodec.FeatureDim
    Tables.fanOut(Tables.load(spark, dir, "documents"))
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = ((id % 8 + 4) * 2).toInt // even dims: the pool is exact
        val h = ((id % 4 + 4) * 2).toInt
        val px = Array.tabulate(w * h)(i => synthPixel(id, i, w).toInt)
        val png = RealCodec.encode("png", w, h, px)
        val (dw, dh, dec) = RealCodec.decode(png).getOrElse(
          sys.error(s"doc $id: JDK failed to decode its own PNG"))
        require(dw == w && dh == h, s"doc $id: decoded dims drifted")
        val (w2, h2) = (w / 2, h / 2)
        val lanes = new Array[Long](nLanes)
        var cy = 0
        while (cy < h2) {
          var cx = 0
          while (cx < w2) {
            val pooled = (dec(2 * cy * w + 2 * cx) +
              dec(2 * cy * w + 2 * cx + 1) +
              dec((2 * cy + 1) * w + 2 * cx) +
              dec((2 * cy + 1) * w + 2 * cx + 1)) / 4
            lanes((cy * w2 + cx) % nLanes) += pooled
            cx += 1
          }
          cy += 1
        }
        (id, w2.toLong, h2.toLong, lanes.toSeq)
      })
      .toDF("doc_id", "out_w", "out_h", "lanes")
      .select(col("doc_id"), col("out_w"), col("out_h"),
        md5(concat_ws(" ",
          expr("transform(lanes, x -> cast(x as string))")))
          .as("pooled_lane_digest"))
      .orderBy("doc_id")
  }

  /** The per-frame pixel formula of the VIDEO roundtrip (frame index in
    * the formula, shared with the oracle). */
  def synthFramePixel(docId: Long, frame: Long, i: Long, w: Long): Long =
    (docId * 31 + frame * 41 + (i % w) * 7 + (i / w) * 13) % 256

  /** REAL multi-frame (video-like) decode under the driver's hash
    * gate — [[frameSample]]'s char-range frames upgraded to an actual
    * container: per document, `doc_id % 4 + 2` synthetic grayscale
    * frames are encoded into ONE genuine animated-GIF container,
    * decoded back frame-by-frame through the JDK's ImageReader
    * sequence API ([[RealCodec.decodeFrames]]), and reduced to
    * per-frame exact-integer lane sums — one output row per (doc,
    * frame), the frame-extraction shape of a video training pipeline.
    * GIF is lossless for 8-bit grayscale, so a frame-order, palette,
    * or frame-count bug diverges the hash. */
  def videoRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nLanes = FakeCodec.FeatureDim
    Tables.fanOut(Tables.load(spark, dir, "documents"))
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap { id =>
        val nF = (id % 4 + 2).toInt
        val w = (id % 6 + 6).toInt
        val h = (id % 3 + 6).toInt
        val frames = (0 until nF).map(f =>
          Array.tabulate(w * h)(i => synthFramePixel(id, f, i, w).toInt))
        val gif = RealCodec.encodeAnimated(w, h, frames)
        require(RealCodec.isGif(gif), s"doc $id: non-GIF animated output")
        val (dw, dh, dec) = RealCodec.decodeFrames(gif).getOrElse(
          sys.error(s"doc $id: JDK failed to decode its own animated GIF"))
        require(dec.length == nF, s"doc $id: frame count drifted")
        dec.zipWithIndex.map { case (px, f) =>
          val lanes = new Array[Long](nLanes)
          var i = 0
          while (i < px.length) { lanes(i % nLanes) += px(i); i += 1 }
          (id, f.toLong, dw.toLong, dh.toLong, lanes.toSeq)
        }
      })
      .toDF("doc_id", "frame_idx", "width", "height", "lanes")
      .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
        md5(concat_ws(" ",
          expr("transform(lanes, x -> cast(x as string))")))
          .as("frame_digest"))
      .orderBy("doc_id", "frame_idx")
  }

  /** REAL VIDEO CONTAINER roundtrip under the driver's hash gate —
    * [[videoRoundtrip]]'s animated-GIF frames upgraded to a genuine
    * MP4: per document, `doc_id % 4 + 2` synthetic grayscale frames
    * are JPEG-encoded, muxed into one ISO-BMFF file ([[Mp4.mux]] —
    * ftyp/mdat/moov with full stsd/stts/stss/stsc/stsz/stco sample
    * tables), then DEMUXED back ([[Mp4.parse]]): codec fourcc, track
    * dimensions, timescale, sample count and the stss keyframe list
    * are all read from the container, each keyframe's byte range is
    * resolved through the stsc×stco×stsz walk, and the extracted
    * JPEG decodes through the real image codec. One output row per
    * KEYFRAME — the keyframe-extraction shape of a video training
    * pipeline. JPEG is lossy, so the pixel stage is a tolerance gate
    * (the spec's measured JPEG bounds: mean err < 16, max < 64) and
    * the hash-gated columns are the container-derived metadata plus
    * the boolean — a box-layout, sample-table, or keyframe-walk bug
    * flips a count or the flag and the hash diverges. */
  def mp4Roundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.fanOut(Tables.load(spark, dir, "documents"))
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap { id =>
        val nF = (id % 4 + 2).toInt
        val w = (id % 6 + 6).toInt
        val h = (id % 3 + 6).toInt
        val frames = (0 until nF).map(f =>
          Array.tabulate(w * h)(i => synthFramePixel(id, f, i, w).toInt))
        val mp4 = Mp4.mux(w, h,
          frames.map(RealCodec.encode("jpg", w, h, _)))
        require(Mp4.isMp4(mp4), s"doc $id: non-BMFF mux output")
        val track = Mp4.parse(mp4).getOrElse(
          sys.error(s"doc $id: demux failed on own mux output"))
        val metaOk = track.codec == "jpeg" && track.width == w &&
          track.height == h && track.nSamples == nF &&
          track.timescale == 30 && track.duration == nF
        track.syncSamples.map { f =>
          val px = RealCodec.decode(track.sample(mp4, f))
          val ok = metaOk && px.exists { case (dw, dh, p) =>
            val errs = p.zip(frames(f)).map(t => math.abs(t._1 - t._2))
            dw == w && dh == h &&
              errs.sum.toDouble / errs.length < 16 && errs.max < 64
          }
          (id, f.toLong, w.toLong, h.toLong, nF.toLong, ok)
        }
      })
      .toDF("doc_id", "frame_idx", "width", "height", "n_samples",
        "sync_ok")
      .orderBy("doc_id", "frame_idx")
  }

  /** The waveform formula the audio roundtrip fixture and the DuckDB
    * oracle SHARE — Spark writes these samples into a real WAV container
    * and decodes them back; the oracle recomputes them in pure SQL.
    * Range [-2048, 2047]: well inside signed 16-bit, never clipped. */
  def synthSample(docId: Long, i: Long): Long =
    (docId * 37 + i * 11) % 4096 - 2048

  /** REAL audio decode under the driver's hash gate — the
    * [[decodeRoundtrip]] pattern on the WAV path. Per document: a
    * synthetic PCM waveform (channel count, frame count, sample rate and
    * every sample from oracle-shared formulas) is encoded into a genuine
    * RIFF/WAVE container, content-sniffed, decoded by [[AudioCodec]],
    * and reduced to exact-integer lane sums over the DECODED interleaved
    * samples. PCM is lossless, so the sums — and the rate/channel
    * metadata read back from the container — must equal the oracle's
    * formula-only computation; a header mis-parse, endianness or
    * sign-extension bug, or channel de-interleave error diverges the
    * hash. One encode+decode per row, partition-batched; waveform length
    * is bounded (≤ 190 samples), so per-row cost is fixed and small. */
  def audioRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nLanes = FakeCodec.FeatureDim
    // NOT fanOut (r20 measured: the JDK audio stack serializes
    // provider lookup — parallel WAV decodes contend, ×2.7-3.7 slower)
    Tables.load(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val channels = (id % 2 + 1).toInt
        val frames = (id % 64 + 32).toInt
        val rate = (8000 + (id % 3) * 4000).toInt
        val samples =
          Array.tabulate(frames * channels)(i => synthSample(id, i).toInt)
        val wav = AudioCodec.encode(rate, channels, samples)
        require(AudioCodec.isWav(wav), s"doc $id: encoder produced non-WAV")
        val (dRate, dCh, dec) = AudioCodec.decode(wav).getOrElse(
          sys.error(s"doc $id: JDK failed to decode its own WAV"))
        val lanes = new Array[Long](nLanes)
        var i = 0
        while (i < dec.length) { lanes(i % nLanes) += dec(i); i += 1 }
        (id, dRate.toLong, dCh.toLong, dec.length.toLong, lanes.toSeq)
      })
      .toDF("doc_id", "sample_rate", "channels", "n_samples", "lanes")
      .select(col("doc_id"), col("sample_rate"), col("channels"),
        col("n_samples"),
        md5(concat_ws(" ",
          expr("transform(lanes, x -> cast(x as string))")))
          .as("decoded_sample_digest"))
      .orderBy("doc_id")
  }

  /** REAL audio frame features under the driver's hash gate: the
    * windowed feature-extraction step of an audio pipeline (VAD /
    * loudness normalization run on exactly this shape) over DECODED
    * samples. Per document, the [[audioRoundtrip]] waveform goes
    * through a real WAV encode → decode cycle, then per non-overlapping
    * 16-sample window: exact integer energy (Σ s²) and peak |s| — one
    * row per (doc, frame), Generate fan-out bounded by the fixed
    * waveform length. The oracle recomputes both from the formula, so
    * any decode or windowing bug diverges the hash. */
  def audioFrames(spark: SparkSession, dir: String, window: Int = 16)
      : DataFrame = {
    import spark.implicits._
    // NOT fanOut (r20 measured: the JDK audio stack serializes
    // provider lookup — parallel WAV decodes contend, ×2.7-3.7 slower)
    Tables.load(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap { id =>
        val channels = (id % 2 + 1).toInt
        val frames = (id % 64 + 32).toInt
        val rate = (8000 + (id % 3) * 4000).toInt
        val samples =
          Array.tabulate(frames * channels)(i => synthSample(id, i).toInt)
        val wav = AudioCodec.encode(rate, channels, samples)
        val (_, _, dec) = AudioCodec.decode(wav).getOrElse(
          sys.error(s"doc $id: JDK failed to decode its own WAV"))
        dec.grouped(window).zipWithIndex.map { case (win, fi) =>
          var energy = 0L; var peak = 0L
          var i = 0
          while (i < win.length) {
            val s = win(i).toLong
            energy += s * s
            if (math.abs(s) > peak) peak = math.abs(s)
            i += 1
          }
          (id, fi.toLong, win.length.toLong, energy, peak)
        }
      })
      .toDF("doc_id", "frame_idx", "frame_len", "energy", "peak")
      .orderBy("doc_id", "frame_idx")
  }

  /** documents.text reinterpreted as an opaque binary payload column —
    * stands in for an image/audio blob. */
  // NOT fanOut (r20 measured ×1.4-3.8 WITH it): the payload consumers
  // are cheap column algebra — the exchange costs more than the work
  def withPayload(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .withColumn("payload", encode(col("text"), "UTF-8"))

  /** Oracle-checkable metadata extraction: pure column algebra over the
    * binary payload (what a metadata-only probe would return). */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    withPayload(spark, dir)
      .select(col("doc_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        (octet_length(col("payload")).cast("long") % 640).as("width"),
        (octet_length(col("payload")).cast("long") * 7 % 480).as("height"),
        (octet_length(col("payload")).cast("long") % 30 + 1).as("n_frames"))
      .orderBy("doc_id")

  /** Frame sampling: every `stride`-th frame of each "video" payload,
    * as one row per sampled frame with a content digest. Frames here
    * are fixed-size CHARACTER ranges of the text payload (frame
    * count/size derived from character length — intentionally
    * char-based so the DuckDB oracle's substring matches byte-for-byte
    * on the ASCII fixtures; a real container format swaps in
    * codec-aware byte extraction here). The pipeline shape (metadata →
    * per-frame generate → per-frame digest) is exactly what a video
    * training-data pipeline runs, oracle-checkable. The stride is
    * pushed INTO the sequence step — only sampled indices are ever
    * generated, so the Generate fan-out is 1/stride of the frame count
    * (no generate-all-then-filter waste at scale). */
  def frameSample(spark: SparkSession, dir: String, stride: Int = 2)
      : DataFrame =
    Tables.load(spark, dir, "documents") // cheap algebra: no fanOut (r20)
      .withColumn("n_bytes", length(col("text")).cast("long"))
      .withColumn("n_frames", col("n_bytes") % 30 + 1)
      .withColumn("frame_size",
        expr("(n_bytes + n_frames - 1) DIV n_frames")) // exact int ceil
      .select(col("doc_id"), col("text"), col("frame_size"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong)))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        md5(expr("substring(text, cast(frame_idx * frame_size + 1 as int), cast(frame_size as int))"))
          .as("frame_md5"))
      .orderBy("doc_id", "frame_idx")

  /** Partition-batched decode: the distributed feature-extraction path.
    * One codec invocation per record — [[decodeAny]] sniffs each
    * payload, so real PNG/BMP blobs decode for real and everything else
    * hits the stub — batched per partition (no per-row JVM↔driver
    * traffic, no collect). */
  def decodeFeatures(spark: SparkSession, dir: String)
      : Dataset[MediaFeatures] = {
    import spark.implicits._
    withPayload(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeAny(id, bytes) })
  }

  /** Resize (downsample) the decoded feature vector by average-pooling —
    * the "resize to model input shape" step of an image pipeline,
    * applied to the stub codec's features (a real codec would resize
    * pixels before feature extraction; the partition-batched plumbing
    * and output contract are identical). outDim must divide the codec's
    * FeatureDim. Rows-only (stub features); MultimodalSpec checks the
    * pooling against a direct computation. */
  def resizeFeatures(spark: SparkSession, dir: String, outDim: Int = 4)
      : DataFrame = {
    import spark.implicits._
    require(FakeCodec.FeatureDim % outDim == 0,
      s"outDim $outDim must divide ${FakeCodec.FeatureDim}")
    val factor = FakeCodec.FeatureDim / outDim
    decodeFeatures(spark, dir)
      .map { m =>
        val pooled = Array.tabulate(outDim) { i =>
          var s = 0.0f; var j = 0
          while (j < factor) { s += m.features(i * factor + j); j += 1 }
          s / factor
        }
        (m.doc_id, pooled)
      }
      .toDF("doc_id", "features_resized")
      .orderBy("doc_id")
  }

  /** Per-lane byte sums as EXACT integer arithmetic — the same rolling
    * checksum [[FakeCodec.decode]] accumulates, but in longs (no float
    * accumulation order), so the result is bit-deterministic and
    * DuckDB-twinnable (byte offsets == char positions on the ASCII
    * fixtures, same convention as [[frameSample]]). One native
    * single-pass expression for ALL lanes
    * ([[graft.functions.LaneSums]], O(len) with zero boxing) — the
    * composed filter+aggregate form costs a pass per lane. */
  private def laneSumsExpr(nLanes: Int, group: Int): org.apache.spark.sql.Column =
    graft.functions.lane_sums(col("text"), nLanes, group)

  /** The hash-checkable form of the feature-extraction key: per-doc lane
    * sums (exact longs), their digest, and the feature norm derived in
    * exact integer space (norm of feats = sqrt(Σ laneSum²)/255 since
    * feats[j] = laneSum[j]/255). Agrees with the float codec path within
    * float tolerance (MultimodalSpec ties them); the oracle twin runs the
    * identical list algebra in DuckDB. */
  def featureLanes(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents") // cheap algebra: no fanOut (r20)
      .withColumn("lanes", laneSumsExpr(FakeCodec.FeatureDim, 1))
      .select(col("doc_id"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        round(sqrt(expr("aggregate(lanes, 0L, (a, x) -> a + x * x)")
          .cast("double")) / lit(255.0), 6).as("feature_norm"),
        md5(concat_ws(" ",
          expr("transform(lanes, x -> cast(x as string))"))).as("lane_digest"))
      .orderBy("doc_id")

  /** The hash-checkable form of the resize key: average-pooled lane sums
    * (outDim groups of FeatureDim/outDim lanes) as rounded doubles plus
    * an integer-space digest — the embed_quantize pattern (driver-sortable
    * scalars, never a raw float array). pooled[i] = Σ bytes in lane group
    * i / (255 · group) — exactly the average-pool of the codec's lane
    * features, computed without float accumulation. */
  def resizeDigest(spark: SparkSession, dir: String, outDim: Int = 4)
      : DataFrame = {
    require(FakeCodec.FeatureDim % outDim == 0,
      s"outDim $outDim must divide ${FakeCodec.FeatureDim}")
    val group = FakeCodec.FeatureDim / outDim
    val pooled = (0 until outDim).map(i =>
      round(expr(s"element_at(psums, ${i + 1})").cast("double") /
        lit(255.0 * group), 6).as(s"pooled_$i"))
    Tables.load(spark, dir, "documents") // cheap algebra: no fanOut (r20)
      .withColumn("psums", laneSumsExpr(outDim, group))
      .select(Seq(col("doc_id"),
        octet_length(encode(col("text"), "UTF-8")).cast("long")
          .as("n_bytes")) ++ pooled :+
        md5(concat_ws(" ",
          expr("transform(psums, x -> cast(x as string))")))
          .as("resize_digest"): _*)
      .orderBy("doc_id")
  }

  /** Aggregate over decoded features — demonstrates the decode path inside
    * a distributed plan (MultimodalSpec checks the norms against a direct
    * in-JVM computation; no SQL oracle for the codec stub's features). */
  def featureNorms(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeFeatures(spark, dir)
      .map(m => (m.doc_id, m.n_bytes,
        math.sqrt(m.features.map(f => f.toDouble * f).sum)))
      .toDF("doc_id", "n_bytes", "feature_norm")
      .withColumn("feature_norm", round(col("feature_norm"), 6))
      .orderBy("doc_id")
  }
}
