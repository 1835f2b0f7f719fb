package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ingest.SnapshotStore
import graft.multimodal.VideoFp

/** STREAMING maintenance of the persisted VIDEO-sequence store — the
  * EIGHTH `foreachBatch` + `appendOnce` family (r19 verdict task 3):
  * each delivery of videos pays the mux→demux→JPEG-decode roundtrip
  * ([[VideoFp.vfpsOf]]) for ITS OWN items only, exactly once, and the
  * duplicate-footage query equality-joins delivery sequences against
  * the persisted store with zero demux work.
  *
  * The collapsed frame-hash sequence is a PER-ITEM computation, so
  * the post-stream store content is independent of arrival order and
  * micro-batch boundaries and bit-equal to the batch-built
  * [[VideoFp.ensureIndex]] chain — the key runs under
  * `dedup_video_delta`'s exact sequence-recomputation oracle (the
  * shared-val identity).
  *
  * Exactly-once: a replayed micro-batch re-appending its sequences
  * would duplicate its doc_ids and double-count every exact-match
  * pair they anchor. `appendOnce` with the batch id as tag closes it;
  * VideoMaintainSpec replays a delivery verbatim and pins the store
  * bit-unchanged.
  *
  * State at scale: NONE — stateless foreachBatch; the store IS the
  * state, each commit O(its delivery's videos × frames). */
object VideoMaintain {

  private type Staged = (String, String, Long,
    org.apache.spark.sql.types.StructType)

  /** Bootstrap + staging, once per (session, dir, chunks): the
    * pristine base-sequence store (the one-time base demux) and the
    * immutable delivery files; each drive run copies the store and
    * appends to the copy ([[DriveSupport.stagedOnce]]). */
  private def stagedBootstrap(spark: SparkSession, dir: String,
      chunks: Int): Staged =
    DriveSupport.stagedOnce(spark, s"vfm|$dir|$chunks") { ws =>
      val ids = Tables.load(spark, dir, "documents").select("doc_id")
      val maxId = ids.agg(max(col("doc_id"))).head().getLong(0)
      val cut = maxId * 4 / 5 + 1
      val idxDir = ws.resolve("idx").toString
      new SnapshotStore(s"$idxDir/seqs")
        .overwrite(VideoFp.vfpsOf(ids.filter(col("doc_id") < cut)))
      val inDir = ws.resolve("deliveries").toString
      DriveSupport.stageIdRangeDeliveries(
        ids.filter(col("doc_id") >= cut), "doc_id", cut, maxId,
        chunks, inDir)
      (idxDir, inDir, cut, ids.schema)
    }

  /** Driver key `stream_video_delta`: the delivery slice arrives as
    * `chunks` micro-batches that each demux their own videos and
    * append-once their collapsed sequences; the result is the
    * duplicate-footage pairs the delivery introduces
    * ([[VideoFp.dedupVideoDelta]]'s shape) served from the PERSISTED
    * store only — zero demux/decode at serve time. */
  def dedupVideoStream(spark: SparkSession, dir: String,
      chunks: Int = 4): DataFrame =
    DriveSupport.withWorkspace("graft-vfm") { ws =>
      val (pristineIdx, inDir, cut, schema) =
        stagedBootstrap(spark, dir, chunks)
      DriveSupport.stageStoreCopy(pristineIdx, ws.resolve("idx"))
      val store = new SnapshotStore(ws.resolve("idx/seqs").toString)

      DriveSupport.withStreamConfs(spark) {
        val q = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(inDir)
          .writeStream
          .option("checkpointLocation", ws.resolve("ckpt").toString)
          .foreachBatch { (b: DataFrame, id: Long) =>
            appendDelivery(b, store, id)
          }.start()
        DriveSupport.draining(q)(q.processAllAvailable())
      }

      DriveSupport.pin(spark,
        VideoFp.seqPairs(store.read(spark).get, Some(cut)))
    }

  /** One delivery's sequence maintenance — demuxes the BATCH's videos
    * only; public so the replay spec can drive it verbatim with a
    * repeated batch id. */
  def appendDelivery(batch: DataFrame, store: SnapshotStore,
      batchId: Long): Unit = {
    if (batch.isEmpty) return
    store.appendOnce(VideoFp.vfpsOf(batch.select("doc_id")),
      batchId.toString)
  }
}
