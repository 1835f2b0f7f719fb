package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.query.Sampling

/** Streaming twin of the document chunker (`doc_chunk`): documents
  * arriving on a stream are chunked per micro-batch with EXACTLY the
  * batch operator's plan ([[Sampling.chunkOf]] is per-row stateless
  * column algebra — no state store, no watermark needed) and appended
  * to a parquet sink.
  *
  * Exactly-once story: the checkpointed source replays a failed batch,
  * and the parquet append is committed through the streaming sink's
  * batch-id manifest — the same landing-pipeline guarantee IngestStream
  * documents. At scale the chunk fan-out (⌈n/stride⌉ per doc) happens
  * inside each micro-batch partition; nothing accumulates between
  * triggers. */
object DocChunkStream {

  /** Start chunking `docs` (a STREAMING frame with doc_id + text) into
    * `outPath`. foreachBatch (rather than a direct writeStream) so the
    * chunker slots into the landing pipeline next to the other
    * per-batch stages — and the test can assert per-micro-batch
    * results. */
  def start(docs: DataFrame, outPath: String, checkpointDir: String,
      win: Int = 64, stride: Int = 32): StreamingQuery =
    docs.writeStream
      .queryName("graft-doc-chunk")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Sampling.chunkOf(batch, win, stride)
          .write.mode("append").parquet(outPath)
      }
      .start()
}
