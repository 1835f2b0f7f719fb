package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSuite, TestSpark}
import graft.query.Sampling

/** Streaming doc_chunk twin: chunks produced per micro-batch over a
  * MemoryStream must be EXACTLY the batch operator's rows (md5s and
  * positions) for the same documents — chunking is stateless, so
  * micro-batch boundaries must not show in the output. Compared as
  * MULTISETS (sorted seqs, not sets): an at-least-once sink that
  * duplicated a batch must fail here, not be collapsed away. */
class DocChunkStreamSpec extends SparkSuite {

  import spark.implicits._

  private val key = Seq("doc_id", "chunk_idx", "chunk_start",
    "n_chunk_tokens", "chunk_md5")

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.select(key.head, key.tail: _*)
      .collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq

  test("per-micro-batch chunks match the batch form; replay is idempotent") {
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
    val (a, rest) = docs.splitAt(docs.size / 3)
    try {
      // three uneven micro-batches; chunk boundaries must not care
      val (b, c) = rest.splitAt(rest.size / 2)
      Seq(a, b, c).foreach { part =>
        mem.addData(part)
        q.processAllAvailable()
      }
    } finally q.stop()

    val batch = sortedRows(Sampling.docChunk(spark, TestSpark.sfDir,
      win = 16, stride = 8))
    assert(batch.nonEmpty)
    assert(sortedRows(spark.read.parquet(out)) === batch,
      "streamed chunks must be exactly the batch operator's rows")

    // replay: foreachBatch is at-least-once — re-running a batch's write
    // (same batch_id) must overwrite its own partition, not append dups
    Sampling.chunkOf(a.toDF("doc_id", "text"), win = 16, stride = 8)
      .withColumn("batch_id", lit(0L))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(out)
    assert(sortedRows(spark.read.parquet(out)) === batch,
      "replaying batch 0 must leave the sink unchanged (idempotent)")
  }

  test("misconfigured stride fails at start(), not at the first trigger") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    intercept[IllegalArgumentException] {
      DocChunkStream.start(mem.toDF().toDF("doc_id", "text"),
        "/tmp/unused", "/tmp/unused-ckpt", win = 16, stride = 0)
    }
  }
}
