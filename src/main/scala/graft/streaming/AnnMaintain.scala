package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ingest.SnapshotStore
import graft.query.{EmbeddingIndex, SemanticIndex, TextSim}

/** STREAMING maintenance of the persisted embedding-LSH bucket store —
  * the FIFTH store family on the `foreachBatch` + `appendOnce` pattern
  * (minhash: [[IndexMaintain]]; chunk digests: [[ChunkMaintain]];
  * vocabulary: [[VocabMaintain]]; perceptual fingerprints:
  * [[PhashMaintain]]), closing the r18 verdict's gap #3: the ledger
  * had deferred this leg on the argument that the family's keys are
  * rows-only so a streamed variant "would add no hash-green evidence"
  * — undercounting its own machinery, since the planted-twin recall
  * contract (`dedup_embedding_ann_delta_recall`'s literal-TRUE
  * oracle) gates the streamed path exactly as it gates the batch one
  * (`stream_ann_delta_recall`).
  *
  * Like minhash — and unlike frozen-centroid IVF — maintenance is
  * EXACT forever: an LSH signature is a per-vector computation
  * ([[TextSim.annBuckets]]), so the post-stream store content is
  * independent of arrival order and micro-batch boundaries and
  * bit-equal to the batch-built [[EmbeddingIndex.ensureIndex]]
  * (AnnMaintainSpec pins streamed == batch row-for-row and boundary
  * independence).
  *
  * Exactly-once: a replayed micro-batch re-appending its (vec_id, t,
  * bucket) rows would not change WHICH pairs verify (the exact-cosine
  * verify dedups by construction) but WOULD double the bucket-size
  * mass the `maxBucket` skew cap reads — a bucket straddling the cap
  * could silently flip from served to dropped. `appendOnce` with the
  * batch id as tag closes it; the replay-verbatim spec pins the store
  * bit-unchanged.
  *
  * State at scale: NONE — stateless foreachBatch; the store IS the
  * state, each commit O(its delivery's vectors × nTables). */
object AnnMaintain {

  private type Staged = (String, String, Long,
    org.apache.spark.sql.types.StructType)

  /** Bootstrap + staging for the driver key, once per (session, dir,
    * params): the pristine base bucket store and the immutable
    * delivery files; each drive run copies the store and appends to
    * the copy ([[DriveSupport.stagedOnce]]). */
  private def stagedBootstrap(spark: SparkSession, dir: String,
      nPlanes: Int, nTables: Int, seed: Long, chunks: Int): Staged =
    DriveSupport.stagedOnce(spark,
        s"annm|$dir|$nPlanes|$nTables|$seed|$chunks") { ws =>
      val e = Tables.load(spark, dir, "embeddings")
      val cut = SemanticIndex.deltaCutoff(e)
      val idxDir = ws.resolve("idx").toString
      new SnapshotStore(s"$idxDir/buckets").overwrite(TextSim.annBuckets(
        e.filter(col("vec_id") < cut), nPlanes, nTables, seed))
      val inDir = ws.resolve("deliveries").toString
      stageDeliveries(e, cut, chunks, inDir)
      (idxDir, inDir, cut, e.schema)
    }

  /** Write the delta slice as `chunks` vec_id-range files — one file
    * per trigger = one delivery per micro-batch (the shared stager,
    * keyed on vec_id). */
  private def stageDeliveries(e: DataFrame, cut: Long, chunks: Int,
      inDir: String): Unit =
    DriveSupport.stageIdRangeDeliveries(e, "vec_id", cut,
      e.agg(max(col("vec_id"))).head().getLong(0), chunks, inDir)

  /** Driver key `stream_ann_delta`: the standard delivery slice
    * arrives as `chunks` micro-batches that each append-once their
    * vectors' LSH bucket rows; the result is the delivery's near-dup
    * pairs ([[EmbeddingIndex.dedupEmbeddingAnnDelta]]'s exact output
    * contract) served from the PERSISTED store only. Rows-only key
    * (engine-specific signatures); `stream_ann_delta_recall` is its
    * hash gate. */
  def dedupAnnStream(spark: SparkSession, dir: String,
      threshold: Double = 0.35, nPlanes: Int = 8, nTables: Int = 8,
      maxBucket: Int = 10000, seed: Long = 7L, chunks: Int = 4)
      : DataFrame =
    DriveSupport.withWorkspace("graft-annm") { ws =>
      val (pristineIdx, inDir, cut, schema) =
        stagedBootstrap(spark, dir, nPlanes, nTables, seed, chunks)
      DriveSupport.stageStoreCopy(pristineIdx, ws.resolve("idx"))
      val store = new SnapshotStore(ws.resolve("idx/buckets").toString)
      drain(spark, ws, inDir, schema, store, nPlanes, nTables, seed)
      DriveSupport.pin(spark, EmbeddingIndex.deltaPairs(
        store.read(spark).get, Tables.load(spark, dir, "embeddings"),
        cut, threshold, maxBucket))
    }

  /** Frame-parameterized streamed core — the recall contract's path
    * (a twin-augmented corpus is not a loadable dir): fresh workspace,
    * fresh base commit, the delivery streamed through the SAME
    * foreachBatch + appendOnce maintenance, pairs served from the
    * persisted store. Identical dataflow to [[dedupAnnStream]] minus
    * the cross-run staging reuse. */
  def annStreamPairsOf(e: DataFrame, threshold: Double = 0.35,
      nPlanes: Int = 8, nTables: Int = 8, maxBucket: Int = 10000,
      seed: Long = 7L, chunks: Int = 4): DataFrame = {
    val spark = e.sparkSession
    DriveSupport.withWorkspace("graft-annm-c") { ws =>
      // pin the (possibly union-derived) corpus once: the staging
      // writes, the stream and the serve all read it repeatedly
      val eC = e.localCheckpoint()
      val cut = SemanticIndex.deltaCutoff(eC)
      val store = new SnapshotStore(ws.resolve("idx/buckets").toString)
      store.overwrite(TextSim.annBuckets(
        eC.filter(col("vec_id") < cut), nPlanes, nTables, seed))
      val inDir = ws.resolve("deliveries").toString
      stageDeliveries(eC, cut, chunks, inDir)
      drain(spark, ws, inDir, eC.schema, store, nPlanes, nTables, seed)
      DriveSupport.pin(spark, EmbeddingIndex.deltaPairs(
        store.read(spark).get, eC, cut, threshold, maxBucket))
    }
  }

  /** The shared stream drive: one file per trigger, each micro-batch
    * appended exactly once. */
  private def drain(spark: SparkSession, ws: java.nio.file.Path,
      inDir: String, schema: org.apache.spark.sql.types.StructType,
      store: SnapshotStore, nPlanes: Int, nTables: Int, seed: Long)
      : Unit =
    DriveSupport.withStreamConfs(spark) {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
        .writeStream
        .option("checkpointLocation", ws.resolve("ckpt").toString)
        .foreachBatch { (b: DataFrame, id: Long) =>
          appendDelivery(b, store, id, nPlanes, nTables, seed)
        }.start()
      DriveSupport.draining(q)(q.processAllAvailable())
    }

  /** One delivery's store maintenance — public so the replay spec can
    * drive it verbatim with a repeated batch id. */
  def appendDelivery(batch: DataFrame, store: SnapshotStore,
      batchId: Long, nPlanes: Int = 8, nTables: Int = 8,
      seed: Long = 7L): Unit = {
    if (batch.isEmpty) return
    store.appendOnce(TextSim.annBuckets(batch, nPlanes, nTables, seed),
      batchId.toString)
  }
}
