package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ingest.SnapshotStore
import graft.query.{FuzzyIndex, FuzzyJoin}

/** STREAMING maintenance of the persisted FastSS deletion-signature
  * store — the SIXTH `foreachBatch` + `appendOnce` family, landed in
  * the same round as the store itself ([[graft.query.FuzzyIndex]], the
  * r18 verdict's top task): new master-table rows (fresh catalog
  * parts) stream their deletion signatures into the index
  * continuously, and the entity-resolution query serves dirty probes
  * from the store, never re-exploding the reference.
  *
  * Maintenance is EXACT forever: a deletion neighborhood is a
  * PER-STRING computation ([[FuzzyJoin.signaturesOf]]), so the
  * post-stream store content is independent of arrival order and
  * micro-batch boundaries and bit-equal to the batch-built
  * [[FuzzyIndex.ensureIndex]] — which is what lets this key run under
  * `join_fuzzy_delta`'s exact UNBLOCKED oracle (full levenshtein
  * truth over delivery probes × part).
  *
  * Exactly-once: a replayed micro-batch re-appending its signature
  * rows cannot change WHICH matches verify (the banded levenshtein is
  * exact and the candidate set is `distinct`-ed), but it doubles the
  * candidate mass the equality join pays for — the silent cost
  * corruption `appendOnce` exists to prevent. The replay spec pins
  * the store bit-unchanged.
  *
  * State at scale: NONE — stateless foreachBatch; the store IS the
  * state, each commit O(its delivery's strings × variants). */
object FuzzyMaintain {

  private type Staged = (String, String, Long,
    org.apache.spark.sql.types.StructType)

  /** Bootstrap + staging, once per (session, dir, k, chunks): the
    * pristine base signature store and the immutable delivery files;
    * each drive run copies the store and appends to the copy
    * ([[DriveSupport.stagedOnce]]). */
  private def stagedBootstrap(spark: SparkSession, dir: String,
      k: Int, chunks: Int): Staged =
    DriveSupport.stagedOnce(spark, s"fzym|$dir|$k|$chunks") { ws =>
      val parts = Tables.load(spark, dir, "part")
        .select(col("p_partkey"), col("p_name"))
      val cut = FuzzyIndex.deltaCutoff(parts)
      val idxDir = ws.resolve("idx").toString
      new SnapshotStore(s"$idxDir/sig").overwrite(
        FuzzyJoin.signaturesOf(parts.filter(col("p_partkey") < cut), k))
      val inDir = ws.resolve("deliveries").toString
      DriveSupport.stageIdRangeDeliveries(parts, "p_partkey", cut,
        parts.agg(max(col("p_partkey"))).head().getLong(0), chunks,
        inDir)
      (idxDir, inDir, cut, parts.schema)
    }

  /** Driver key `stream_fuzzy_delta`: the delivery slice of `part`
    * arrives as `chunks` micro-batches that each append-once their
    * names' deletion signatures; the result is the fuzzy delta join —
    * dirty delivery probes best-matched against the full reference —
    * served from the PERSISTED store only, under `join_fuzzy_delta`'s
    * exact oracle. */
  def joinFuzzyStream(spark: SparkSession, dir: String, k: Int = 2,
      chunks: Int = 4): DataFrame =
    DriveSupport.withWorkspace("graft-fzym") { ws =>
      val (pristineIdx, inDir, cut, schema) =
        stagedBootstrap(spark, dir, k, chunks)
      DriveSupport.stageStoreCopy(pristineIdx, ws.resolve("idx"))
      val store = new SnapshotStore(ws.resolve("idx/sig").toString)

      DriveSupport.withStreamConfs(spark) {
        val q = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(inDir)
          .writeStream
          .option("checkpointLocation", ws.resolve("ckpt").toString)
          .foreachBatch { (b: DataFrame, id: Long) =>
            appendDelivery(b, store, id, k)
          }.start()
        DriveSupport.draining(q)(q.processAllAvailable())
      }

      val parts = Tables.load(spark, dir, "part")
        .select(col("p_partkey"), col("p_name"))
      val probes = FuzzyJoin.probesOf(
        parts.filter(col("p_partkey") >= cut), 20)
      DriveSupport.withServeCoalesceFloor(spark) {
        DriveSupport.pin(spark,
          FuzzyJoin.matchProbes(probes, store.read(spark).get, parts, k))
      }
    }

  /** One delivery's store maintenance — public so the replay spec can
    * drive it verbatim with a repeated batch id. */
  def appendDelivery(batch: DataFrame, store: SnapshotStore,
      batchId: Long, k: Int = 2): Unit = {
    if (batch.isEmpty) return
    store.appendOnce(FuzzyJoin.signaturesOf(batch, k), batchId.toString)
  }

  /** Driver key `fuzzy_compact_check`: the signature store's FULL
    * lifecycle, which [[FuzzyIndex.ensureIndex]]'s single
    * "delivery-1" append does not exercise (r19 verdict task 4) —
    * append the delivery slice as `chunks` tagged commits (the
    * N-delivery chain), [[SnapshotStore.compact]] the chain to one
    * commit (the dir-name tags fold into the `_applied_tags`
    * sidecar), REPLAY delivery #1 post-compaction (the sidecar must
    * no-op it — a re-append cannot change which matches verify, the
    * banded levenshtein is exact, but it doubles the candidate mass
    * the equality join pays), then serve the fuzzy delta join from
    * the compacted store. Per-string signature exactness makes the
    * post-lifecycle store content bit-equal to the one-shot build, so
    * the key runs under `join_fuzzy_delta`'s exact UNBLOCKED oracle —
    * the measured path includes the chain build, the compaction and
    * the replayed no-op. The `index_compact_check` shape applied to
    * the fuzzy family. */
  def fuzzyCompactCheck(spark: SparkSession, dir: String, k: Int = 2,
      chunks: Int = 4): DataFrame =
    DriveSupport.withWorkspace("graft-fzyc") { ws =>
      val (pristineIdx, inDir, cut, _) =
        stagedBootstrap(spark, dir, k, chunks)
      DriveSupport.stageStoreCopy(pristineIdx, ws.resolve("idx"))
      val store = new SnapshotStore(ws.resolve("idx/sig").toString)

      val staged = spark.read.parquet(inDir)
      val maxId = staged.agg(max(col("p_partkey"))).head().getLong(0)
      val span = DriveSupport.deliverySpan(maxId, cut, chunks)
      (0 until chunks).foreach { c =>
        appendDelivery(staged.filter(
          col("p_partkey") >= cut + c * span &&
          col("p_partkey") < cut + (c + 1) * span), store, c.toLong, k)
      }
      store.compact(spark)
      // the replay beat: delivery #1 again, post-compaction
      appendDelivery(staged.filter(col("p_partkey") >= cut &&
        col("p_partkey") < cut + span), store, 0L, k)

      val parts = Tables.load(spark, dir, "part")
        .select(col("p_partkey"), col("p_name"))
      val probes = FuzzyJoin.probesOf(
        parts.filter(col("p_partkey") >= cut), 20)
      DriveSupport.withServeCoalesceFloor(spark) {
        DriveSupport.pin(spark,
          FuzzyJoin.matchProbes(probes, store.read(spark).get, parts, k))
      }
    }
}
