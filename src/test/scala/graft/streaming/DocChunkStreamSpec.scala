package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSuite, TestSpark}
import graft.query.Sampling

/** Streaming doc_chunk twin: chunks produced per micro-batch over a
  * MemoryStream must be EXACTLY the batch operator's rows (md5s and
  * positions) for the same documents — chunking is stateless, so
  * micro-batch boundaries must not show in the output. */
class DocChunkStreamSpec extends SparkSuite {

  import spark.implicits._

  test("per-micro-batch chunks match the batch form's md5s") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.core.Tables.load(spark, TestSpark.sfDir, "documents")
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(docs.size >= 4, "fixture too small to split into batches")

    val out = Files.createTempDirectory("graft-chunk-out").toString
    val ckpt = Files.createTempDirectory("graft-chunk-ckpt").toString
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = DocChunkStream.start(stream, out, ckpt, win = 16, stride = 8)
    try {
      // three uneven micro-batches; chunk boundaries must not care
      val (a, rest) = docs.splitAt(docs.size / 3)
      val (b, c) = rest.splitAt(rest.size / 2)
      Seq(a, b, c).foreach { part =>
        mem.addData(part)
        q.processAllAvailable()
      }
    } finally q.stop()

    val key = Seq("doc_id", "chunk_idx", "chunk_start",
      "n_chunk_tokens", "chunk_md5")
    val streamed = spark.read.parquet(out)
      .select(key.head, key.tail: _*)
      .collect().map(_.toSeq).toSet
    val batch = Sampling.docChunk(spark, TestSpark.sfDir,
        win = 16, stride = 8)
      .select(key.head, key.tail: _*)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch,
      "streamed chunks must be exactly the batch operator's rows")
    assert(batch.nonEmpty)
  }
}
