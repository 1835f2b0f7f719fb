package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.streaming.StreamingQuery

import graft.query.Sampling

/** Streaming twin of the document chunker (`doc_chunk`): documents
  * arriving on a stream are chunked per micro-batch with EXACTLY the
  * batch operator's plan ([[Sampling.chunkOf]] is per-row stateless
  * column algebra — no state store, no watermark needed) and written
  * to a parquet sink partitioned by micro-batch id.
  *
  * Effectively-once story: foreachBatch is at-least-once (a crash
  * between the sink write and the checkpoint offset commit replays the
  * batch), so the write must be REPLAY-IDEMPOTENT: each batch
  * overwrites ONLY its own `batch_id=<n>` partition (dynamic partition
  * overwrite) — a replayed batch rewrites the same partition with the
  * same rows instead of appending duplicates. Same guarantee shape as
  * IngestStream's idempotent merge, keyed here by the deterministic
  * batch id. At scale the chunk fan-out (⌈n/stride⌉ per doc) happens
  * inside each micro-batch partition; nothing accumulates between
  * triggers. */
object DocChunkStream {

  /** Start chunking `docs` (a STREAMING frame with doc_id + text) into
    * `outPath`. foreachBatch (rather than a direct writeStream) so the
    * chunker slots into the landing pipeline next to the other
    * per-batch stages — and the test can assert per-micro-batch
    * results. `name` must be unique per active stream on the session. */
  def start(docs: DataFrame, outPath: String, checkpointDir: String,
      win: Int = 64, stride: Int = 32,
      name: String = "graft-doc-chunk"): StreamingQuery = {
    // fail at start(), not asynchronously at the first trigger
    require(stride > 0 && stride <= win,
      s"stride must be in (0, win]: stride=$stride win=$win")
    docs.writeStream
      .queryName(name)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Sampling.chunkOf(batch, win, stride)
          .withColumn("batch_id", lit(batchId))
          .write
          .mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(outPath)
      }
      .start()
  }
}
