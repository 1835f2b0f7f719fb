package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.multimodal.Multimodal

/** Streaming twin of the multimodal decode path: media blobs arriving
  * on a stream (doc_id + opaque binary payload) are decoded per
  * micro-batch with EXACTLY the batch dispatch
  * ([[Multimodal.decodeAny]] — content sniffing picks the real
  * PNG/BMP/GIF/JPEG or WAV codec, anything else the deterministic
  * stub), so a media-ingest pipeline gets the same features whether a
  * payload arrives in a backfill scan or on the live stream.
  *
  * Decode is per-row stateless — no state store, no watermark; the
  * replay contract is the [[DocChunkStream]] sink shape: foreachBatch
  * is at-least-once, so each batch overwrites ONLY its own
  * `batch_id=<n>` partition (dynamic partition overwrite) and a
  * replayed batch rewrites identical rows instead of appending
  * duplicates. At scale the codec cost rides inside each micro-batch
  * partition; nothing accumulates between triggers. */
object DecodeStream {

  /** Start decoding `media` (a STREAMING frame with doc_id + payload)
    * into `outPath`. `name` must be unique per active stream. */
  def start(media: DataFrame, outPath: String, checkpointDir: String,
      name: String = "graft-decode-stream"): StreamingQuery =
    media.writeStream
      .queryName(name)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        decodeBatch(batch)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(outPath)
      }
      .start()

  /** The shared per-batch plan — also the batch-equivalence surface
    * the spec compares against. Feature digest: md5 over the codec's
    * float lanes printed at fixed precision (each payload's fold is
    * sequential inside [[Multimodal.decodeAny]], so the floats — and
    * the digest — are deterministic regardless of partitioning). */
  def decodeBatch(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val m = Multimodal.decodeAny(id, bytes)
        // Locale.ROOT: the f-interpolator formats with the JVM default
        // locale, so a comma-decimal locale would change every lane
        // (and the digest) across differently-configured JVMs
        (m.doc_id, m.n_bytes.toLong,
          m.features.map(f => String.format(java.util.Locale.ROOT,
            "%.5f", Float.box(f))).mkString(" "))
      })
      .toDF("doc_id", "n_bytes", "feature_sig")
      .withColumn("feature_sig", md5(col("feature_sig")))
  }
}
