package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSuite, TestSpark}
import graft.multimodal.Multimodal

/** Streaming decode twin: payloads spanning EVERY dispatch arm — real
  * PNG, real WAV, real GIF, and plain text (stub) — fed through a
  * MemoryStream in uneven micro-batches must produce exactly the batch
  * plan's rows, and a replayed batch must leave the sink unchanged.
  * Compared as MULTISETS so an at-least-once duplicate fails loudly. */
class DecodeStreamSpec extends SparkSuite {

  import spark.implicits._

  /** One payload per dispatch arm, cycling by id; pixel/sample content
    * derived from the id so every payload is distinct. */
  private def payloadFor(id: Long, text: String): Array[Byte] =
    (id % 4) match {
      case 0 =>
        val (w, h) = (10, 8)
        Multimodal.RealCodec.encode("png", w, h,
          Array.tabulate(w * h)(i => Multimodal.synthPixel(id, i, w).toInt))
      case 1 =>
        Multimodal.AudioCodec.encode(8000, 1,
          Array.tabulate(48)(i => Multimodal.synthSample(id, i).toInt))
      case 2 =>
        val (w, h) = (9, 6)
        Multimodal.RealCodec.encode("gif", w, h,
          Array.tabulate(w * h)(i => Multimodal.synthPixel(id, i, w).toInt))
      case _ => text.getBytes("UTF-8")
    }

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "n_bytes", "feature_sig")
      .collect().map(_.toSeq.map(String.valueOf))
      .sortBy(_.mkString("|")).toSeq

  test("streamed decode == batch decode across all dispatch arms; " +
      "replay is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.core.Tables.load(spark, TestSpark.sfDir, "documents")
      .select("doc_id", "text").limit(40)
      .collect().map(r => (r.getLong(0), payloadFor(r.getLong(0), r.getString(1))))
      .toSeq
    assert(docs.map(_._1 % 4).toSet.size === 4,
      "fixture must exercise all four dispatch arms")

    val out = Files.createTempDirectory("graft-decode-out").toString
    val ckpt = Files.createTempDirectory("graft-decode-ckpt").toString
    val mem = MemoryStream[(Long, Array[Byte])]
    val q = DecodeStream.start(
      mem.toDF().toDF("doc_id", "payload"), out, ckpt)
    val (a, rest) = docs.splitAt(docs.size / 3)
    try {
      val (b, c) = rest.splitAt(rest.size / 2)
      Seq(a, b, c).foreach { part =>
        mem.addData(part)
        q.processAllAvailable()
      }
    } finally q.stop()

    val batch = sortedRows(
      DecodeStream.decodeBatch(docs.toDF("doc_id", "payload")))
    assert(batch.nonEmpty)
    assert(sortedRows(spark.read.parquet(out)) === batch,
      "streamed decode must be exactly the batch plan's rows")

    // replay batch 0's write: the sink must not change (idempotent)
    DecodeStream.decodeBatch(a.toDF("doc_id", "payload"))
      .withColumn("batch_id", lit(0L))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(out)
    assert(sortedRows(spark.read.parquet(out)) === batch,
      "replaying batch 0 must leave the sink unchanged")

    // anti-vacuity: a real-container payload must NOT decode like the
    // stub (the dispatch is doing something on the stream)
    val realArm = docs.filter(_._1 % 4 == 0).head
    assert(!Multimodal.decodeAny(realArm._1, realArm._2).features
      .sameElements(Multimodal.FakeCodec.decode(realArm._1, realArm._2)
        .features),
      "PNG payload decoded by the stub — dispatch inert on the stream")
  }
}
