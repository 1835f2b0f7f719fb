package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ingest.SnapshotStore
import graft.query.{TextQuality, TextSim}

/** STREAMING maintenance of the persisted VOCABULARY-count store — the
  * THIRD store family on the `foreachBatch` + `appendOnce` pattern
  * (minhash: [[IndexMaintain]]; chunk digests: [[ChunkMaintain]]):
  * deliveries stream their token counts into the store a tokenizer
  * pipeline watches, and the retrain gauge reads the PERSISTED counts
  * instead of re-tokenizing the corpus.
  *
  * Two stores:
  *   - `base` — the base corpus's per-token occurrence counts,
  *     committed v0 at bootstrap (the frozen vocabulary's training
  *     mass);
  *   - `delta` — one per-token count table appended PER DELIVERY.
  *     Token counts are ADDITIVE, so the post-stream delta mass is the
  *     per-token SUM over the chain — independent of arrival order and
  *     micro-batch boundaries by associativity, which is what makes
  *     the served gauge bit-equal to the batch
  *     [[TextQuality.vocabDriftCheck]] and lets the key run under its
  *     exact DuckDB oracle.
  *
  * Exactly-once: a replayed micro-batch re-appending its count frame
  * would DOUBLE its tokens' delta mass — additive state is exactly
  * where at-least-once hurts silently (no structural corruption, just
  * wrong numbers). `appendOnce` with the batch id as tag closes it;
  * VocabMaintainSpec replays a delivery verbatim and pins the store
  * and the served panel bit-unchanged.
  *
  * State at scale: NONE — stateless foreachBatch; the store IS the
  * state at VOCAB grain (each commit is a distinct-token-sized count
  * frame, map-side combined before it is written), and the serve-side
  * re-aggregation is vocab-grain, never corpus-grain. */
object VocabMaintain {

  private type Staged = (String, String,
    org.apache.spark.sql.types.StructType)

  /** Per-token occurrence counts of a docs frame. */
  private def countsOf(docs: DataFrame): DataFrame =
    docs.select(explode(TextSim.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))

  /** Bootstrap + staging, once per (session, dir, chunks): the
    * pristine base-count store and the immutable delivery files;
    * each drive run copies the store and appends to the copy
    * ([[DriveSupport.stagedOnce]]). */
  private def stagedBootstrap(spark: SparkSession, dir: String,
      chunks: Int): Staged =
    DriveSupport.stagedOnce(spark, s"vocm|$dir|$chunks") { ws =>
      val docs = Tables.load(spark, dir, "documents")
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      val cut = maxId * 4 / 5 + 1
      val idxDir = ws.resolve("idx").toString
      new SnapshotStore(s"$idxDir/base")
        .overwrite(countsOf(docs.filter(col("doc_id") < cut)))
      val delta = docs.filter(col("doc_id") >= cut)
      val inDir = ws.resolve("deliveries").toString
      DriveSupport.stageIdRangeDeliveries(delta, "doc_id", cut, maxId,
        chunks, inDir)
      (idxDir, inDir, delta.schema)
    }

  /** Driver key `stream_vocab_delta`: the standard delivery slice
    * arrives as `chunks` micro-batches that each append-once their
    * token counts; the result is the vocabulary retrain-gauge panel
    * ([[TextQuality.vocabDriftCheck]]'s exact shape) served from the
    * PERSISTED stores only. */
  def vocabDriftStream(spark: SparkSession, dir: String,
      topV: Int = 32, chunks: Int = 4): DataFrame =
    DriveSupport.withWorkspace("graft-vocm") { ws =>
      val (pristineIdx, inDir, deltaSchema) =
        stagedBootstrap(spark, dir, chunks)
      DriveSupport.stageStoreCopy(pristineIdx, ws.resolve("idx"))
      val bStore = new SnapshotStore(ws.resolve("idx/base").toString)
      val dStore = new SnapshotStore(ws.resolve("idx/delta").toString)

      DriveSupport.withStreamConfs(spark) {
        val q = spark.readStream.schema(deltaSchema)
          .option("maxFilesPerTrigger", "1").parquet(inDir)
          .writeStream
          .option("checkpointLocation", ws.resolve("ckpt").toString)
          .foreachBatch { (b: DataFrame, id: Long) =>
            appendDelivery(b, dStore, id)
          }.start()
        DriveSupport.draining(q)(q.processAllAvailable())
      }

      DriveSupport.pin(spark,
        panelFromStores(spark, bStore, dStore, topV))
    }

  /** One delivery's count maintenance — public so the replay spec can
    * drive it verbatim with a repeated batch id. */
  def appendDelivery(batch: DataFrame, dStore: SnapshotStore,
      batchId: Long): Unit = {
    if (batch.isEmpty) return
    dStore.appendOnce(countsOf(batch), batchId.toString)
  }

  /** The gauge panel from the persisted stores only: base counts from
    * the bootstrap commit, delta mass as the per-token sum over the
    * delivery chain (an empty chain is an empty delivery), zero-filled
    * full-outer merge into the (w, n_base, n_delta) table
    * [[TextQuality.vocabDriftFromCounts]] panels. */
  def panelFromStores(spark: SparkSession, bStore: SnapshotStore,
      dStore: SnapshotStore, topV: Int = 32): DataFrame = {
    val base = bStore.read(spark).get
      .select(col("w"), col("n").as("n_base"))
    val delta = dStore.read(spark)
      .map(_.groupBy("w").agg(sum(col("n")).as("n_delta")))
      .getOrElse(base.limit(0)
        .select(col("w"), col("n_base").as("n_delta")))
    val counts = base.join(delta, Seq("w"), "full_outer")
      .select(col("w"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_delta"), lit(0L)).as("n_delta"))
    TextQuality.vocabDriftFromCounts(counts, topV)
  }
}
