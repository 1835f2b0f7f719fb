package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ingest.SnapshotStore
import graft.multimodal.{AudioFp, Phash}

/** STREAMING maintenance of the persisted AUDIO-fingerprint store —
  * the SEVENTH `foreachBatch` + `appendOnce` family (r19 verdict task
  * 3), completing the streamed symmetry for the perceptual stores:
  * each delivery of recordings pays the WAV decode
  * ([[AudioFp.afpsOf]]) for ITS OWN items only, exactly once, and the
  * near-dup query serves candidates from the persisted fingerprint
  * table with zero decode work.
  *
  * The 64-bit H-K-style fingerprint is a PER-ITEM computation, so the
  * post-stream store content is independent of arrival order and
  * micro-batch boundaries and bit-equal to the batch-built
  * [[AudioFp.ensureIndex]] chain — which is what lets this key run
  * under `dedup_audio_delta`'s exact full-hash-recomputation oracle
  * (the shared-val identity).
  *
  * Exactly-once: a replayed micro-batch re-appending its fingerprints
  * would duplicate its doc_ids in the store and double-count every
  * pair they anchor. `appendOnce` with the batch id as tag closes it;
  * AudioMaintainSpec replays a delivery verbatim and pins the store
  * bit-unchanged.
  *
  * State at scale: NONE — stateless foreachBatch; the store IS the
  * state, each commit O(its delivery's recordings). */
object AudioMaintain {

  private type Staged = (String, String, Long,
    org.apache.spark.sql.types.StructType)

  /** Bootstrap + staging, once per (session, dir, chunks): the
    * pristine base-fingerprint store (the one-time base decode) and
    * the immutable delivery files; each drive run copies the store
    * and appends to the copy ([[DriveSupport.stagedOnce]]). */
  private def stagedBootstrap(spark: SparkSession, dir: String,
      chunks: Int): Staged =
    DriveSupport.stagedOnce(spark, s"afm|$dir|$chunks") { ws =>
      val ids = Tables.load(spark, dir, "documents").select("doc_id")
      val maxId = ids.agg(max(col("doc_id"))).head().getLong(0)
      val cut = maxId * 4 / 5 + 1
      val idxDir = ws.resolve("idx").toString
      new SnapshotStore(s"$idxDir/hashes")
        .overwrite(AudioFp.afpsOf(ids.filter(col("doc_id") < cut)))
      val inDir = ws.resolve("deliveries").toString
      DriveSupport.stageIdRangeDeliveries(
        ids.filter(col("doc_id") >= cut), "doc_id", cut, maxId,
        chunks, inDir)
      (idxDir, inDir, cut, ids.schema)
    }

  /** Driver key `stream_audio_delta`: the delivery slice arrives as
    * `chunks` micro-batches that each decode their own recordings and
    * append-once their fingerprints; the result is the near-dup
    * recording pairs the delivery introduces ([[AudioFp
    * .dedupAudioDelta]]'s shape) served from the PERSISTED store only
    * — the delivery's chunk buckets probed against the full
    * fingerprint table, zero decode at serve time. */
  def dedupAudioStream(spark: SparkSession, dir: String,
      chunks: Int = 4, maxHamming: Int = 3): DataFrame =
    DriveSupport.withWorkspace("graft-afm") { ws =>
      val (pristineIdx, inDir, cut, schema) =
        stagedBootstrap(spark, dir, chunks)
      DriveSupport.stageStoreCopy(pristineIdx, ws.resolve("idx"))
      val store = new SnapshotStore(ws.resolve("idx/hashes").toString)

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

      DriveSupport.pin(spark, Phash.chunkLshPairs(
        store.read(spark).get, "afp", Some(cut), maxHamming))
    }

  /** One delivery's fingerprint maintenance — decodes the BATCH's
    * recordings only; public so the replay spec can drive it verbatim
    * with a repeated batch id. */
  def appendDelivery(batch: DataFrame, store: SnapshotStore,
      batchId: Long): Unit = {
    if (batch.isEmpty) return
    store.appendOnce(AudioFp.afpsOf(batch.select("doc_id")),
      batchId.toString)
  }
}
