package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ingest.SnapshotStore
import graft.query.{MinhashIndex, SubstringIndex}

/** STREAMING maintenance of the persisted substring GRAM store — the
  * NINTH `foreachBatch` + `appendOnce` family (r19 verdict task 3),
  * completing the streamed symmetry for every exactly-appendable
  * store: each delivery's gram counts are aggregated and appended
  * exactly once as they arrive, so the NEXT delivery's span-clean
  * probes an up-to-date gram table without re-tokenizing anything.
  *
  * Two stores, the [[PhashMaintain]] layout: `base` holds the base
  * corpus's gram counts (committed v0 at bootstrap) — the
  * PRE-delivery state THIS delivery is cleaned against, exactly the
  * batch [[SubstringIndex.dedupSubstringDelta]]'s probe rule ("the
  * version before the live one") — and `grams` accumulates the
  * streamed deliveries' counts, the state FUTURE deliveries would
  * probe (base ∪ grams), mirroring what the batch `ensureStore`
  * appends for the same reason. Gram counts are ADDITIVE
  * (the VocabStore argument), so the streamed chain's content is
  * independent of arrival order and micro-batch boundaries and
  * bit-equal to the batch chain's delta commit — and the served
  * clean, probing the same base table, is bit-equal to the batch
  * key's, which is what lets this run under `dedup_substring_delta`'s
  * exact oracle (the shared-val identity).
  *
  * Exactly-once: a replayed micro-batch re-appending its counts would
  * double them — a gram the next delivery sees as occ=2 when the
  * corpus holds one occurrence flips its primary-occurrence rule, a
  * SILENT over-cut. `appendOnce` with the batch id as tag closes it;
  * SubstringMaintainSpec replays a delivery verbatim and pins the
  * store bit-unchanged.
  *
  * State at scale: NONE — stateless foreachBatch; the store IS the
  * state, each commit O(its delivery's distinct grams). */
object SubstringMaintain {

  private type Staged = (String, String, Long,
    org.apache.spark.sql.types.StructType)

  /** One micro-batch's gram counts — the store's append grain. */
  private def countsOf(batch: DataFrame, gramLen: Int): DataFrame =
    SubstringIndex.gramsOf(batch, gramLen)
      .groupBy("gh").agg(count(lit(1)).as("occ"))

  /** Bootstrap + staging, once per (session, dir, gramLen, chunks):
    * the pristine base gram store (one tokenize pass over the base)
    * and the immutable delivery files; each drive run copies the
    * store and appends to the copy ([[DriveSupport.stagedOnce]]). */
  private def stagedBootstrap(spark: SparkSession, dir: String,
      gramLen: Int, chunks: Int): Staged =
    DriveSupport.stagedOnce(spark, s"ssm|$dir|$gramLen|$chunks") { ws =>
      val docs = Tables.load(spark, dir, "documents")
        .select("doc_id", "text")
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      val cut = MinhashIndex.deltaCutoff(docs)
      val idxDir = ws.resolve("idx").toString
      new SnapshotStore(s"$idxDir/base").overwrite(
        countsOf(docs.filter(col("doc_id") < cut), gramLen))
      val inDir = ws.resolve("deliveries").toString
      DriveSupport.stageIdRangeDeliveries(
        docs.filter(col("doc_id") >= cut), "doc_id", cut, maxId,
        chunks, inDir)
      (idxDir, inDir, cut, docs.schema)
    }

  /** Driver key `stream_substring_delta`: the delivery slice arrives
    * as `chunks` micro-batches that each append-once their gram
    * counts into the streamed store; the result is the delivery
    * span-cleaned against the persisted PRE-delivery gram table
    * ([[SubstringIndex.dedupSubstringDelta]]'s output grain) — no
    * base text read, no re-tokenize of anything but the delivery. */
  def dedupSubstringStream(spark: SparkSession, dir: String,
      gramLen: Int = 5, chunks: Int = 4): DataFrame =
    DriveSupport.withWorkspace("graft-ssm") { ws =>
      val (pristineIdx, inDir, _, schema) =
        stagedBootstrap(spark, dir, gramLen, chunks)
      DriveSupport.stageStoreCopy(pristineIdx, ws.resolve("idx"))
      val baseStore = new SnapshotStore(ws.resolve("idx/base").toString)
      val gramStore = new SnapshotStore(ws.resolve("idx/grams").toString)

      DriveSupport.withStreamConfs(spark) {
        val q = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(inDir)
          .writeStream
          .option("checkpointLocation", ws.resolve("ckpt").toString)
          .foreachBatch { (b: DataFrame, id: Long) =>
            appendDelivery(b, gramStore, id, gramLen)
          }.start()
        DriveSupport.draining(q)(q.processAllAvailable())
      }

      DriveSupport.pin(spark, SubstringIndex.cleanDeltaAgainst(
        spark.read.parquet(inDir), baseStore.read(spark).get, gramLen))
    }

  /** One delivery's gram-count maintenance — tokenizes the BATCH
    * only; public so the replay spec can drive it verbatim with a
    * repeated batch id. */
  def appendDelivery(batch: DataFrame, store: SnapshotStore,
      batchId: Long, gramLen: Int = 5): Unit = {
    if (batch.isEmpty) return
    store.appendOnce(countsOf(batch, gramLen), batchId.toString)
  }
}
