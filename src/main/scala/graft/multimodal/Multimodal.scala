package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Multimodal column plumbing (builder directive): media ride along as
  * opaque BINARY columns with typed metadata; decode / feature-extract are
  * per-partition batch operations.
  *
  * The container has no image/audio codecs, so [[FakeCodec.decode]] is a
  * clearly-marked DETERMINISTIC STUB — it derives plausible metadata and a
  * fixed-shape feature vector from the bytes. Everything around it — the
  * BinaryType column, the typed result schema, partition-wise batching via
  * mapPartitions (the Scala analogue of mapInPandas' batch shape), and the
  * oracle-checkable metadata query — is real Spark plumbing that a real
  * codec would drop into unchanged.
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

  /** documents.text reinterpreted as an opaque binary payload column —
    * stands in for an image/audio blob. */
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
    Tables.load(spark, dir, "documents")
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
    * One codec invocation per record, batched per partition (no
    * per-row JVM↔driver traffic, no collect). */
  def decodeFeatures(spark: SparkSession, dir: String)
      : Dataset[MediaFeatures] = {
    import spark.implicits._
    withPayload(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => FakeCodec.decode(id, bytes) })
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
    Tables.load(spark, dir, "documents")
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
    Tables.load(spark, dir, "documents")
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
