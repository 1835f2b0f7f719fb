package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ingest.SnapshotStore
import graft.query.{ChunkIndex, Sampling}

/** STREAMING maintenance of the persisted CHUNK-digest store — the
  * [[IndexMaintain]] pattern (stateless `foreachBatch` +
  * [[SnapshotStore.appendOnce]]) applied to a SECOND store family
  * (r17 verdict task #2): deliveries stream into the chunk-dedup index
  * continuously, and the nightly dedup reads the store, not the
  * stream.
  *
  * Two stores ride the stream:
  *   - `digests` — digest-grain first occurrences: the base corpus's
  *     table committed v0 at bootstrap, each delivery's appended as
  *     one O(delta) commit (the [[ChunkIndex]] store layout);
  *   - `occurrences` — the delivery chunks at OCCURRENCE grain
  *     (doc_id, chunk_idx, chunk_md5): what the served dedup needs to
  *     name every duplicate location, exactly the minhash maintainer's
  *     postings-store role.
  *
  * Exactly-once: `foreachBatch` is at-least-once — a crashed driver
  * replays the last uncommitted micro-batch, and a blind append would
  * double-count the replayed delivery's occurrences (every extra copy
  * of a chunk row fabricates a duplicate). `appendOnce` with the batch
  * id as the tag closes it; ChunkMaintainSpec replays a delivery
  * verbatim and pins both stores bit-unchanged.
  *
  * Determinism: chunking is PER-DOCUMENT ([[Sampling.chunkOf]]), so
  * the final store content is independent of arrival order and
  * micro-batch boundaries — the served result is bit-identical to the
  * batch-built [[ChunkIndex.dedupChunksDelta]]'s and runs under the
  * same exact DuckDB oracle (`dedup_chunks_delta`'s SQL).
  *
  * State at scale: NONE — stateless foreachBatch; the store IS the
  * state, and each micro-batch's write cost is O(its delivery). */
object ChunkMaintain {

  private type Staged = (String, String,
    org.apache.spark.sql.types.StructType)

  /** Bootstrap + staging, once per (session, dir, params): the
    * PRISTINE pre-stream digest store (base table committed v0) and
    * the immutable delivery files — each drive run copies the
    * pristine store and appends to the copy
    * ([[DriveSupport.stagedOnce]]). */
  private def stagedBootstrap(spark: SparkSession, dir: String,
      win: Int, stride: Int, chunks: Int): Staged =
    DriveSupport.stagedOnce(spark,
        s"chkm|$dir|$win|$stride|$chunks") { ws =>
      val docs = Tables.load(spark, dir, "documents")
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      val cut = maxId * 4 / 5 + 1
      val base = docs.filter(col("doc_id") < cut)
      val delta = docs.filter(col("doc_id") >= cut)
      val idxDir = ws.resolve("idx").toString
      new SnapshotStore(s"$idxDir/digests")
        .overwrite(ChunkIndex.digestsOfFrame(base, win, stride))
      // occurrences store starts EMPTY: deliveries stream in
      val inDir = ws.resolve("deliveries").toString
      DriveSupport.stageIdRangeDeliveries(delta, "doc_id", cut, maxId,
        chunks, inDir)
      (idxDir, inDir, delta.schema)
    }

  /** Driver key `stream_chunks_delta`: the standard delivery slice
    * arrives as `chunks` micro-batches that each append-once to a
    * fresh copy of the bootstrapped digest store; the result is the
    * post-stream chunk dedup — every delivery chunk duplicating
    * earlier content, with its canonical location — served from the
    * PERSISTED stores only. */
  def dedupChunksStream(spark: SparkSession, dir: String,
      win: Int = 64, stride: Int = 32, chunks: Int = 4): DataFrame =
    DriveSupport.withWorkspace("graft-chkm") { ws =>
      val (pristineIdx, inDir, deltaSchema) =
        stagedBootstrap(spark, dir, win, stride, chunks)
      DriveSupport.stageStoreCopy(pristineIdx, ws.resolve("idx"))
      val dStore = new SnapshotStore(ws.resolve("idx/digests").toString)
      val oStore = new SnapshotStore(
        ws.resolve("idx/occurrences").toString)

      DriveSupport.withStreamConfs(spark) {
        val q = spark.readStream.schema(deltaSchema)
          .option("maxFilesPerTrigger", "1").parquet(inDir)
          .writeStream
          .option("checkpointLocation", ws.resolve("ckpt").toString)
          .foreachBatch { (b: DataFrame, id: Long) =>
            appendDelivery(b, dStore, oStore, id, win, stride)
          }.start()
        DriveSupport.draining(q)(q.processAllAvailable())
      }

      DriveSupport.pin(spark, dupsFromStores(spark, dStore, oStore))
    }

  /** One delivery's store maintenance — public so the replay spec can
    * drive it verbatim with a repeated batch id. Chunks once, feeds
    * both stores, appends EXACTLY ONCE per (store, batch id). */
  def appendDelivery(batch: DataFrame, dStore: SnapshotStore,
      oStore: SnapshotStore, batchId: Long, win: Int = 64,
      stride: Int = 32): Unit = {
    if (batch.isEmpty) return
    val ch = Sampling.chunkOf(batch, win, stride)
      .select("doc_id", "chunk_idx", "chunk_md5").localCheckpoint()
    dStore.appendOnce(ChunkIndex.digestsOfChunks(ch), batchId.toString)
    oStore.appendOnce(ch, batchId.toString)
  }

  /** The served chunk dedup from the persisted stores only: corpus
    * canon = per-digest min over the whole digest chain (base commit +
    * one per delivery — min of per-commit firsts IS the global first,
    * and base doc_ids precede delivery doc_ids by the cutoff rule), a
    * delivery occurrence is a duplicate iff it is not its digest's
    * canon. Identical to [[ChunkIndex.dedupChunksDelta]]'s rule with
    * the internal-first fold replayed through the store. */
  def dupsFromStores(spark: SparkSession, dStore: SnapshotStore,
      oStore: SnapshotStore): DataFrame = {
    val canon = dStore.read(spark).get
      .groupBy("chunk_md5")
      .agg(min(struct(col("canon_doc_id"), col("canon_chunk_idx")))
        .as("c"))
      .select(col("chunk_md5"), col("c.canon_doc_id"),
        col("c.canon_chunk_idx"))
    // an all-empty delivery stream never creates the occurrences store
    // (appendDelivery early-returns) — serve the empty dedup, don't
    // crash on a .get (the VocabMaintain/PhashMaintain empty-delta
    // convention; r18 advice)
    val occurrences = oStore.read(spark).getOrElse(
      canon.limit(0).select(col("canon_doc_id").as("doc_id"),
        col("canon_chunk_idx").as("chunk_idx"), col("chunk_md5")))
    occurrences.join(canon, Seq("chunk_md5"))
      .filter(col("doc_id") =!= col("canon_doc_id") ||
        col("chunk_idx") =!= col("canon_chunk_idx"))
      .select("doc_id", "chunk_idx", "chunk_md5", "canon_doc_id",
        "canon_chunk_idx")
      .orderBy("doc_id", "chunk_idx")
  }
}
