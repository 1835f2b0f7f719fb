package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ingest.SnapshotStore
import graft.query.TextSim

/** STREAMING maintenance of the persisted minhash index — the missing
  * third leg of the delta-index story. The batch leg
  * ([[graft.query.MinhashIndex]]) appends a delivery as one O(delta)
  * manifest commit; the online leg ([[MinhashStream]]) holds the
  * bucket postings in streaming state and flags pairs at arrival; this
  * leg keeps the DURABLE [[SnapshotStore]] index current from a
  * delivery STREAM — the shape a production pipeline actually runs
  * (deliveries arrive continuously; the nightly dedup reads the
  * store, not the stream).
  *
  * Exactly-once: structured streaming's `foreachBatch` is
  * at-least-once — a crashed driver REPLAYS the last uncommitted
  * micro-batch — and a blind [[SnapshotStore.append]] would
  * double-append the replayed delivery's postings (the corruption the
  * store's own commit protocol cannot see, because each retry is a
  * structurally valid commit). [[SnapshotStore.appendOnce]] closes it:
  * the batch id is embedded in the version dir name, so a replay
  * finds its own delivery already referenced by the live manifest and
  * appends nothing. IndexMaintainSpec replays a batch body verbatim
  * and pins the store content unchanged.
  *
  * Determinism: shingle/band rows are PER-DOCUMENT aggregations, so
  * the final store content is independent of chunking, arrival order,
  * and micro-batch boundaries — the served result is bit-identical to
  * the batch-built index's (`dedup_minhash_delta`'s oracle gates this
  * key under the same SQL).
  *
  * State at scale: NONE — unlike [[MinhashStream]] the stream holds no
  * state store at all (stateless foreachBatch); the index IS the
  * state, sharded on disk by the store layout, and each micro-batch's
  * write cost is O(its delivery). */
object IndexMaintain {

  /** Driver key `stream_index_delta`: the standard delivery slice
    * (newest ~20% of doc_ids) arrives as `chunks` micro-batches that
    * each append-once to a fresh persisted index bootstrapped from the
    * base slice; the result is the post-stream delta dedup — verified
    * near-dup pairs with the newer side in the delivery — computed
    * from the PERSISTED stores only. */
  private type Staged = (String, String, Long,
    org.apache.spark.sql.types.StructType)

  /** Bootstrap + staging, once per (session, dir, params): the
    * PRISTINE pre-stream index (base postings committed once) and the
    * immutable delivery files. Both are read-only after creation —
    * each drive run COPIES the pristine store into its own workspace
    * (an O(store-bytes) file copy instead of an O(base-corpus)
    * shingle+commit recompute per measured pass;
    * [[DriveSupport.stagedOnce]]) and appends to the copy. */
  private def stagedBootstrap(spark: SparkSession, dir: String,
      nHashes: Int, bands: Int, chunks: Int): Staged =
    DriveSupport.stagedOnce(spark,
        s"idxm|$dir|$nHashes|$bands|$chunks") { ws =>
      val docs = Tables.load(spark, dir, "documents")
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      val cut = maxId * 4 / 5 + 1
      val base = docs.filter(col("doc_id") < cut)
      val delta = docs.filter(col("doc_id") >= cut)
      val idxDir = ws.resolve("idx").toString
      val bStore = new SnapshotStore(s"$idxDir/buckets")
      val pStore = new SnapshotStore(s"$idxDir/postings")
      val baseSh = TextSim.shingleHashesOf(base).localCheckpoint()
      bStore.overwrite(TextSim.bandBucketsOf(baseSh, nHashes, bands))
      pStore.overwrite(baseSh)
      // stage the delivery as `chunks` doc_id-range files; one file
      // per trigger = one delivery per micro-batch
      val inDir = ws.resolve("deliveries").toString
      DriveSupport.stageIdRangeDeliveries(delta, "doc_id", cut, maxId,
        chunks, inDir)
      (idxDir, inDir, cut, delta.schema)
    }

  def dedupDelta(spark: SparkSession, dir: String,
      threshold: Double = 0.8, nHashes: Int = 32, bands: Int = 8,
      chunks: Int = 4): DataFrame =
    DriveSupport.withWorkspace("graft-idxm") { ws =>
      val (pristineIdx, inDir, cut, deltaSchema) =
        stagedBootstrap(spark, dir, nHashes, bands, chunks)
      // this run's OWN index: a file copy of the pristine bootstrap —
      // the stream below appends to the copy, the pristine state
      // serves the next run (SnapshotStore manifests reference version
      // dirs by RELATIVE name, so a copied root is self-contained)
      DriveSupport.stageStoreCopy(pristineIdx, ws.resolve("idx"))
      val bStore = new SnapshotStore(ws.resolve("idx/buckets").toString)
      val pStore = new SnapshotStore(ws.resolve("idx/postings").toString)

      DriveSupport.withStreamConfs(spark) {
        val q = spark.readStream.schema(deltaSchema)
          .option("maxFilesPerTrigger", "1").parquet(inDir)
          .writeStream
          .option("checkpointLocation", ws.resolve("ckpt").toString)
          .foreachBatch { (b: DataFrame, id: Long) =>
            appendDelivery(b, bStore, pStore, id, nHashes, bands)
          }.start()
        DriveSupport.draining(q)(q.processAllAvailable())
      }

      // the served result, from the PERSISTED stores only — the exact
      // dedup_minhash_delta shape (newer side in the delivery)
      DriveSupport.pin(spark,
        pairsFromStores(spark, bStore, pStore, cut, threshold))
    }

  /** One delivery's index maintenance — public so the replay spec can
    * drive it verbatim with a repeated batch id. Shingles once, feeds
    * both stores, appends EXACTLY ONCE per (store, batch id). */
  def appendDelivery(batch: DataFrame, bStore: SnapshotStore,
      pStore: SnapshotStore, batchId: Long, nHashes: Int = 32,
      bands: Int = 8): Unit = {
    if (batch.isEmpty) return
    val sh = TextSim.shingleHashesOf(batch).localCheckpoint()
    bStore.appendOnce(TextSim.bandBucketsOf(sh, nHashes, bands),
      batchId.toString)
    pStore.appendOnce(sh, batchId.toString)
  }

  /** Delta near-dup pairs from the persisted index (the
    * [[graft.query.MinhashIndex.dedupMinhashDelta]] query shape). */
  def pairsFromStores(spark: SparkSession, bStore: SnapshotStore,
      pStore: SnapshotStore, cut: Long, threshold: Double): DataFrame = {
    val buckets = bStore.read(spark).get
    val postings = pStore.read(spark).get
    val cand = buckets.filter(col("doc_id") >= cut).as("y")
      .join(buckets.as("x"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    TextSim.verifyJaccard(cand, postings, threshold)
  }

  /** The PRISTINE post-append chain (base commit + one appendOnce per
    * delivery), staged once per session on top of [[stagedBootstrap]]:
    * the 4-delivery rebuild is store-construction fixture work, not
    * the maintenance operation `index_compact_check` measures — the
    * stream_index_delta staging precedent (r17 verdict task #7). The
    * chain is read-only after creation; each measured run compacts a
    * COPY. */
  private def stagedAppendedChain(spark: SparkSession, dir: String,
      nHashes: Int, bands: Int, chunks: Int): (String, String, Long) =
    DriveSupport.stagedOnce(spark,
        s"idxc|$dir|$nHashes|$bands|$chunks") { ws =>
      val (pristineIdx, inDir, cut, _) =
        stagedBootstrap(spark, dir, nHashes, bands, chunks)
      DriveSupport.stageStoreCopy(pristineIdx, ws.resolve("idx"))
      val bStore = new SnapshotStore(ws.resolve("idx/buckets").toString)
      val pStore = new SnapshotStore(ws.resolve("idx/postings").toString)
      val staged = spark.read.parquet(inDir)
      val maxId = staged.agg(max(col("doc_id"))).head().getLong(0)
      val span = DriveSupport.deliverySpan(maxId, cut, chunks)
      (0 until chunks).foreach(c =>
        appendDelivery(staged.filter(
          col("doc_id") >= cut + c * span &&
            col("doc_id") < cut + (c + 1) * span),
          bStore, pStore, c.toLong, nHashes, bands))
      (ws.resolve("idx").toString, inDir, cut)
    }

  /** Driver key `index_compact_check`: the store-lifecycle maintenance
    * pass proven correct under the full hash gate. A long-lived delta
    * chain (base + one appendOnce commit per delivery) accumulates
    * version dirs until reads pay an N-way union;
    * [[SnapshotStore.compact]] rewrites the live content as ONE
    * commit. Each run copies the staged post-append chain, COMPACTS
    * both stores, then REPLAYS a delivery — the replay must be a
    * no-op even though compaction erased the tag-bearing dirs (the
    * in-dir `_applied_tags` sidecar is the memory) — and serves the
    * delta pairs from the compacted stores. The measured path is the
    * compaction rewrite + replay probe + serve; the chain build rides
    * the untimed staging. The oracle is `dedup_minhash_delta`'s exact
    * SQL: bit-identical content or the gate fails. */
  def dedupDeltaCompacted(spark: SparkSession, dir: String,
      threshold: Double = 0.8, nHashes: Int = 32, bands: Int = 8,
      chunks: Int = 4): DataFrame =
    DriveSupport.withWorkspace("graft-idxc") { ws =>
      val (chainIdx, inDir, cut) =
        stagedAppendedChain(spark, dir, nHashes, bands, chunks)
      DriveSupport.stageStoreCopy(chainIdx, ws.resolve("idx"))
      val bStore = new SnapshotStore(ws.resolve("idx/buckets").toString)
      val pStore = new SnapshotStore(ws.resolve("idx/postings").toString)
      bStore.compact(spark); pStore.compact(spark)
      // the replay beat: delivery #1 again, post-compaction — the
      // sidecar must make it a no-op or the pairs below double-count
      val staged = spark.read.parquet(inDir)
      val maxId = staged.agg(max(col("doc_id"))).head().getLong(0)
      val span = DriveSupport.deliverySpan(maxId, cut, chunks)
      appendDelivery(staged.filter(
        col("doc_id") >= cut + span && col("doc_id") < cut + 2 * span),
        bStore, pStore, 1L, nHashes, bands)
      DriveSupport.pin(spark,
        pairsFromStores(spark, bStore, pStore, cut, threshold))
    }
}
