package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables
import graft.functions.cosine_sim

/** IVF-style approximate nearest neighbor: the classic inverted-file
  * index (Sivic & Zisserman '03 "Video Google"; the IVF of FAISS) —
  * k-means-partition the corpus into `nlist` cells, then answer a query
  * by exact-scoring only the `nprobe` nearest cells. The complement to
  * [[TextSim.similarityLsh]]: hash-agnostic, adapts to the data's
  * density, and the natural layout for a partitioned 100 TB corpus
  * (one cell ↔ one partition bucket; queries touch nprobe partitions
  * instead of the full scan).
  *
  * Training is Lloyd's algorithm expressed as DataFrame ops: assignment
  * is a broadcast-crossJoin argmin over `nlist` centroids (the model is
  * tiny — nlist·dim doubles — only the corpus side is big); the update
  * step re-averages per (cell, dimension) via posexplode + two hash
  * aggregations. Determinism: seeding picks the `nlist` vectors with the
  * smallest xxhash64(vec_id, seed), and centroid means go through exact
  * DECIMAL sums, so every engine/partitioning produces bit-identical
  * centroids (same reasoning as [[Tables.moneySum]]). Rows-only oracle
  * (centroids are engine-internal); recall vs the brute-force baseline
  * is asserted in IvfRecallSpec.
  *
  * Default probe budget: the fixture embeddings are uniform-random, the
  * WORST case for IVF — with no cluster structure, recall ≈ the probed
  * corpus fraction, so nprobe/nlist = 1/2 buys recall ≈ 0.7 (measured:
  * 0.52 @ 4/16, 0.72 @ 8/16, 1.0 @ 8/8). On clustered corpora — the
  * premise of IVF — the same recall costs nprobe/nlist ≈ 1/16: measured
  * on the mixture-of-Gaussians twin fixture (IvfClusteredRecallSpec),
  * recall is 0.94 @ 1/16 and saturates at 1.0 from 2/16, spec-gated at
  * ≥ 0.9 by 4/16. Tune against a recall budget like
  * [[TextSim.similarityLsh]].
  *
  * Miscalibration (measured, r11 — real corpora don't announce k):
  * against the same 16-cluster fixture, nlist wrong by 2× in either
  * direction still reaches recall ≥ 0.9 inside a ≤ 1/4 probe budget
  * (nlist 8: 0.94 @ 1 probe, 1.0 from 2; nlist 32: 0.86 @ 1, 1.0 from
  * 4). MASS skew is the parameter that actually moves the budget: with
  * half the corpus in one cluster, k-means shards the heavy cluster
  * across ~its mass share of the cells (7/16 measured) and recall ≈
  * the probed fraction of the QUERY CLUSTER's cells (0.20/0.42/0.78/
  * 1.00 at nprobe 1/2/4/7) — so under skew, size nprobe against the
  * largest cluster's cell count (equivalently its mass share), the
  * standard IVF operating rule; cell counts come free from the
  * persisted inverted file ([[ensureIndex]]).
  */
object Ivf {

  /** Probe budget for recall-critical queries: measured on the
    * uniform-random worst-case fixture (IvfRecallSpec's curve — no
    * cluster structure, recall ≈ probed fraction plus the
    * nearest-cells edge), this nprobe holds recall ≥ 0.9 at nlist=16,
    * where the fast default (nprobe=8) trades to ≥ 0.6 for half the
    * scan. On the clustered twin fixture both settings are saturated
    * (recall 1.0 from nprobe=2; IvfClusteredRecallSpec) — the measured
    * premise of IVF. */
  val HighRecallNprobe = 12

  /** Train centroids and return them as a small DataFrame (cid, cvec).
    * package-visible: IvfDeltaSpec trains held-out side models for the
    * out-of-sample drift measure. */
  private[query] def trainCentroids(e: DataFrame, nlist: Int, iters: Int,
      seed: Long): DataFrame = {
    val seedRank = Window.orderBy(col("h").asc, col("vec_id").asc)
    var cent = e
      .withColumn("h", xxhash64(col("vec_id"), lit(seed)))
      .orderBy(col("h").asc, col("vec_id").asc).limit(nlist)
      // nlist rows: the single-partition window is on the tiny model side
      .withColumn("cid", row_number().over(seedRank).cast("long"))
      .select(col("cid"), col("embedding").as("cvec"))
      .localCheckpoint()
    for (_ <- 0 until iters) {
      val assigned = assign(e, cent)
      cent = assigned
        .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cid", "pos")
        // exact decimal mean -> order-independent, engine-deterministic
        .agg((sum(col("v").cast(DecimalType(27, 10))).cast("double") /
          count(lit(1))).as("m"))
        .groupBy("cid")
        .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
          .as("dims"))
        .select(col("cid"), transform(col("dims"), d => d("m")).as("cvec"))
        .localCheckpoint() // keep each Lloyd round's plan flat
    }
    cent
  }

  /** Nearest-centroid assignment: broadcast the model, argmin per row.
    * max_by (not a row_number window): the window form shuffles the
    * corpus×nlist expansion to sort each vec_id group; max_by reduces it
    * with map-side partial aggregation — only one (cid, embedding) pair
    * per vector reaches the shuffle. Tie-break: highest cos, then lowest
    * cid (hence -cid in the ordering struct). */
  private def assign(e: DataFrame, cent: DataFrame): DataFrame =
    e.crossJoin(broadcast(cent))
      .withColumn("cos", cosine_sim(col("embedding"), col("cvec")))
      .groupBy("vec_id")
      .agg(max_by(struct(col("cid"), col("embedding")),
        struct(col("cos"), -col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"),
        col("m.embedding").as("embedding"))

  // ---------------------------------------------------------------- index
  //
  // Training is an OFFLINE indexing job, not a query cost: the trained
  // model (centroids) and the inverted file (cell assignments) persist
  // via SnapshotStore and are memoized per session. A query pays only
  // the probe join. Keyed by (dir, params) — training is deterministic,
  // so a concurrently-built index is bit-identical and a lost commit
  // race simply reads the winner's copy.

  private val indexMemo = new graft.core.Caches.PerSession[
    scala.collection.mutable.Map[String, (DataFrame, DataFrame)]]

  /** Tag includes the corpus fingerprint ([[Tables.fingerprint]]): a
    * regenerated fixture at the same path must miss the old index.
    * `layout` versions the ON-DISK shape (L2 = cells partitioned by
    * cid + schema sidecar): bumping it orphans pre-layout indexes
    * instead of misreading them. */
  private val LayoutVersion = "L2"
  private def indexTag(spark: SparkSession, dir: String, nlist: Int,
      iters: Int, seed: Long, variant: String = ""): String =
    graft.core.Caches.md5Tag(
      s"$dir|$nlist|$iters|$seed|$LayoutVersion|$variant|" +
      Tables.fingerprint(spark, dir, "embeddings"))

  /** Build-or-load the IVF index for (dir, params): returns
    * (centroids, cell assignments). Disk-persistent across JVMs,
    * memoized within a session. */
  def ensureIndex(spark: SparkSession, dir: String, nlist: Int = 16,
      iters: Int = 2, seed: Long = 7L): (DataFrame, DataFrame) = {
    val tag = indexTag(spark, dir, nlist, iters, seed)
    val memo = indexMemo.get(spark)(
      scala.collection.mutable.Map.empty[String, (DataFrame, DataFrame)])
    memo.synchronized {
      memo.getOrElseUpdate(tag, {
        val root = s"target/graft-ivf/$tag"
        // the inverted file is PHYSICALLY laid out by cell: one cid ↔
        // one partition directory, so a probe touches nprobe dirs'
        // files instead of scanning the corpus — the on-disk form of
        // the scaladoc's 100 TB story (IvfLayoutSpec proves file-level
        // pruning; the schema sidecar keeps cid a LongType on re-read)
        new graft.ingest.StoreBootstrap(root).ensure(spark)(
            graft.ingest.StoreBootstrap.chains(spark,
              "centroids" -> 1, "cells" -> 1)) { b =>
          val e = Tables.load(spark, dir, "embeddings")
          val cent = trainCentroids(e, nlist, iters, seed)
          new graft.ingest.SnapshotStore(s"$b/centroids").overwrite(cent)
          new graft.ingest.SnapshotStore(s"$b/cells",
            partition = Some("cid")).overwrite(assign(e, cent))
        }
        (new graft.ingest.SnapshotStore(s"$root/centroids")
            .read(spark).get,
          new graft.ingest.SnapshotStore(s"$root/cells",
            partition = Some("cid")).read(spark).get)
      })
    }
  }

  /** ANN top-k for the fixed query set (vec_id < 10), probing the
    * `nprobe` nearest cells per query against the PERSISTED index
    * ([[ensureIndex]]) — query-time cost is the probe join only. Same
    * output contract as [[TextSim.similarityTopk]]. */
  def similarityIvf(spark: SparkSession, dir: String, k: Int = 5,
      nlist: Int = 16, nprobe: Int = 8, iters: Int = 2, seed: Long = 7L)
      : DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
    val (cent, cells) = ensureIndex(spark, dir, nlist, iters, seed)
    probeScore(spark, e, cent, cells, k, nprobe)
  }

  /** The probe stage alone: the nearest `nprobe` cells per query from
    * the broadcast centroid model, collected to (a broadcastable
    * (query_id, qv, probe_cid) frame, the sorted distinct probed cid
    * list). The probe set is a MODEL SCALAR (≤ queries × nprobe rows —
    * the nlist-centroid precedent): collecting it lets the probed cids
    * become LITERAL partition filters on the cell-partitioned store,
    * so the scan's file index selects only the probed cells' dirs —
    * static pruning, visible as `PartitionFilters: cid IN (…)` and
    * independent of dynamic-pruning heuristics. Shared by the exact
    * probe path and the IVF-PQ composition ([[Pq.similarityIvfPq]]). */
  private[query] def probeSet(spark: SparkSession, e: DataFrame,
      cent: DataFrame, nprobe: Int): (DataFrame, Seq[Long]) = {
    val probeW = Window.partitionBy("query_id")
      .orderBy(col("qcos").desc, col("cid").asc)
    val probePlan = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .crossJoin(broadcast(cent))
      .withColumn("qcos", cosine_sim(col("qv"), col("cvec")))
      .withColumn("prn", row_number().over(probeW))
      .filter(col("prn") <= nprobe)
      // fresh name: cells and probes share cent's lineage, so joining
      // cid===cid would resolve self-referentially (trivially true)
      .select(col("query_id"), col("qv"), col("cid").as("probe_cid"))
    val collected = probePlan.collect().toIndexedSeq
    val probes = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(collected).asJava,
      probePlan.schema)
    (probes,
      collected.map(_.getAs[Long]("probe_cid")).distinct.sorted)
  }

  /** The shared probe-and-score stage: nearest `nprobe` cells per
    * query from the broadcast centroid model, then exact scoring of
    * ONLY those cells' rows against the cell-partitioned inverted
    * file. */
  private def probeScore(spark: SparkSession, e: DataFrame,
      cent: DataFrame, cells: DataFrame, k: Int, nprobe: Int)
      : DataFrame = {
    val (probes, probeCids) = probeSet(spark, e, cent, nprobe)
    val scored = cells
      .filter(col("cid").isin(probeCids: _*))
      .join(broadcast(probes),
        cells("cid") === probes("probe_cid") &&
          col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine_sim(col("qv"), col("embedding")), 4).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
      .orderBy("query_id", "rank")
  }

  // ------------------------------------------------- incremental index
  //
  // The weekly-delivery regime (the reference's own cadence) applied
  // to ANN: a delivery of new embeddings must NOT retrain the index —
  // the delta is assigned to the EXISTING centroids and appended to
  // the inverted file as one O(delta) SnapshotStore commit (a new
  // manifest referencing the old cell dirs plus one delta dir; no
  // base file rewritten). Queries then probe the merged corpus
  // through the same cell-pruned path.
  //
  // Drift bound (when to retrain): frozen centroids mis-cluster the
  // delta exactly as much as the delta's distribution departs from
  // the training corpus. The fixture's delta (the newest 20% of
  // vec_ids) is distribution-identical, and the measured per-query
  // recall at HighRecallNprobe holds the retrained index's floors
  // (the delta contract key runs at the same floors as the base one).
  // The operating rule at scale: compare the delta's mean
  // nearest-centroid cosine against an OUT-OF-SAMPLE base holdout's
  // under the same frozen model (a cheap side assignment; NOT
  // base-vs-delta or frozen-vs-retrained on the delta — both bake in
  // k-means's in-sample advantage, which even iid data shows).
  // Retrain when that gap stops being noise-sized or the appended
  // mass approaches the training mass (IvfDeltaSpec measures the
  // identical-distribution gap at ~0 and the recall floors holding).

  /** The delta split point: the newest ~20% of vec_ids model the
    * un-indexed weekly delivery (deterministic, data-derived). */
  private def deltaCutoff(e: DataFrame): Long =
    e.agg(max(col("vec_id"))).head().getLong(0) * 4 / 5 + 1

  /** Build-or-load the INCREMENTALLY-MAINTAINED index: centroids
    * trained on the base slice only (vec_id < cutoff), base cells
    * committed as v0, the delta ASSIGNED (not retrained) and appended
    * as an O(delta) manifest commit. Returns (centroids, merged
    * cells). Single-publish across processes via
    * [[graft.ingest.StoreBootstrap]]: the two-commit build stages
    * under one root and renames into place atomically, so a crashed or
    * racing builder can never publish a base-only index or a
    * double-appended delta. */
  def ensureDeltaIndex(spark: SparkSession, dir: String, nlist: Int = 16,
      iters: Int = 2, seed: Long = 7L): (DataFrame, DataFrame) = {
    val tag = indexTag(spark, dir, nlist, iters, seed, variant = "delta")
    val memo = indexMemo.get(spark)(
      scala.collection.mutable.Map.empty[String, (DataFrame, DataFrame)])
    memo.synchronized {
      memo.getOrElseUpdate(tag, {
        val root = s"target/graft-ivf/$tag"
        new graft.ingest.StoreBootstrap(root).ensure(spark)(
            graft.ingest.StoreBootstrap.chains(spark,
              "centroids" -> 1, "cells" -> 2)) { b =>
          val centStore = new graft.ingest.SnapshotStore(s"$b/centroids")
          val cellStore = new graft.ingest.SnapshotStore(
            s"$b/cells", partition = Some("cid"))
          val e = Tables.load(spark, dir, "embeddings")
          val cutoff = deltaCutoff(e)
          val cent = trainCentroids(
            e.filter(col("vec_id") < cutoff), nlist, iters, seed)
          centStore.overwrite(cent)
          cellStore.overwrite(
            assign(e.filter(col("vec_id") < cutoff), cent))
          cellStore.append(
            assign(e.filter(col("vec_id") >= cutoff), cent))
        }
        (new graft.ingest.SnapshotStore(s"$root/centroids")
            .read(spark).get,
          new graft.ingest.SnapshotStore(s"$root/cells",
            partition = Some("cid")).read(spark).get)
      })
    }
  }

  /** ANN top-k over the incrementally-maintained index
    * ([[ensureDeltaIndex]]): same output contract as [[similarityIvf]]
    * but the corpus behind it is base∪delta with base-trained
    * centroids — the post-delivery serving state. The per-query recall
    * contract re-runs against brute force over the MERGED corpus
    * (`similarity_ivf_delta_recall_q`). */
  def similarityIvfDelta(spark: SparkSession, dir: String, k: Int = 5,
      nlist: Int = 16, nprobe: Int = 8, iters: Int = 2, seed: Long = 7L)
      : DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
    val (cent, cells) = ensureDeltaIndex(spark, dir, nlist, iters, seed)
    probeScore(spark, e, cent, cells, k, nprobe)
  }

  // ----------------------------------------------------- retrain action
  //
  // [[IndexDrift]] computes the retrain GAUGE; this is the ACTION it
  // triggers — the other half of the frozen-model maintenance loop: a
  // quiet gauge keeps the O(delta) frozen-assignment chain, a fired
  // gauge swaps the frozen model for one retrained on the FULL current
  // corpus, rebuilds the inverted file from it, and RESETS the delta
  // chain (the retrained state becomes the new base; the next delivery
  // appends against the retrained model). Retraining is O(corpus) by
  // nature — the gauge exists precisely so that cost is paid only when
  // the distribution actually moved, not per delivery.

  /** The gauge's decision bit for a (base, delta) split — true when
    * any cell flags `needs_retrain` ([[IndexDrift.indexDriftOf]]). */
  private[query] def driftDecision(base: DataFrame, delta: DataFrame)
      : Boolean =
    IndexDrift.indexDriftOf(base, delta)
      .agg(coalesce(bool_or(col("index_retrain")), lit(false)))
      .head().getBoolean(0)

  /** Frame-level retrain-on-drift core: gauge the split, then either
    * keep the frozen base-trained model (quiet) or retrain on
    * base ∪ delta (fired). Returns (centroids, cell assignments of the
    * full corpus, retrained?). The quiet arm's output is bit-identical
    * to the frozen delta chain's merged content (assignment is
    * per-vector deterministic); IvfRetrainSpec drives a planted
    * distribution shift through the fired arm and pins the recall
    * restoration. */
  def retrainIfDrifted(base: DataFrame, delta: DataFrame,
      nlist: Int = 16, iters: Int = 2, seed: Long = 7L)
      : (DataFrame, DataFrame, Boolean) = {
    val retrained = driftDecision(base, delta)
    val full = base.unionByName(delta)
    val cent = trainCentroids(if (retrained) full else base,
      nlist, iters, seed)
    (cent, assign(full, cent), retrained)
  }

  /** [[ensureDeltaIndex]]'s content built inline — base-trained
    * centroids, base and delta each frozen-assigned — with no store
    * and no gauge: the store-vs-inline pin for the composition specs
    * (IvfPqDeltaSpec). */
  private[query] def deltaLayerOf(base: DataFrame, delta: DataFrame,
      nlist: Int = 16, iters: Int = 2, seed: Long = 7L)
      : (DataFrame, DataFrame) = {
    val cent = trainCentroids(base, nlist, iters, seed)
    (cent, assign(base, cent).unionByName(assign(delta, cent)))
  }

  private val retrainMemo = new graft.core.Caches.PerSession[
    scala.collection.mutable.Map[String, (DataFrame, DataFrame, Boolean)]]

  /** Store-backed retrain-on-drift serving state for the standard
    * delivery split: the build evaluates the gauge once and publishes
    * either the frozen two-commit chain (quiet — identical to
    * [[ensureDeltaIndex]]'s content) or a retrained single-commit
    * RESET (fired). The chain length IS the durable record of the
    * decision: 2 versions = frozen delta chain, 1 version = retrained
    * reset — so a reloading session recovers `retrained` without
    * re-running the gauge. Single-publish via
    * [[graft.ingest.StoreBootstrap]] like every index store. */
  def ensureRetrainedIndex(spark: SparkSession, dir: String,
      nlist: Int = 16, iters: Int = 2, seed: Long = 7L)
      : (DataFrame, DataFrame, Boolean) = {
    val tag = indexTag(spark, dir, nlist, iters, seed, variant = "retrain")
    val memo = retrainMemo.get(spark)(scala.collection.mutable.Map
      .empty[String, (DataFrame, DataFrame, Boolean)])
    memo.synchronized {
      memo.getOrElseUpdate(tag, {
        val root = s"target/graft-ivf/$tag"
        new graft.ingest.StoreBootstrap(root).ensure(spark)(
            graft.ingest.StoreBootstrap.chains(spark,
              "centroids" -> 1, "cells" -> 1)) { b =>
          val centStore = new graft.ingest.SnapshotStore(s"$b/centroids")
          val cellStore = new graft.ingest.SnapshotStore(
            s"$b/cells", partition = Some("cid"))
          val e = Tables.load(spark, dir, "embeddings")
          val cutoff = deltaCutoff(e)
          val base = e.filter(col("vec_id") < cutoff)
          val delta = e.filter(col("vec_id") >= cutoff)
          if (driftDecision(base, delta)) {
            val cent = trainCentroids(e, nlist, iters, seed)
            centStore.overwrite(cent)
            cellStore.overwrite(assign(e, cent))
          } else {
            val cent = trainCentroids(base, nlist, iters, seed)
            centStore.overwrite(cent)
            cellStore.overwrite(assign(base, cent))
            cellStore.append(assign(delta, cent))
          }
        }
        val cellStore = new graft.ingest.SnapshotStore(
          s"$root/cells", partition = Some("cid"))
        (new graft.ingest.SnapshotStore(s"$root/centroids")
            .read(spark).get,
          cellStore.read(spark).get,
          cellStore.versions(spark).size == 1)
      })
    }
  }

  /** ANN top-k over the retrain-on-drift serving state — identical to
    * [[similarityIvfDelta]] when the gauge is quiet (same model, same
    * chain content), and the recall-restored retrained index when it
    * fired. */
  def similarityIvfRetrain(spark: SparkSession, dir: String, k: Int = 5,
      nlist: Int = 16, nprobe: Int = 8, iters: Int = 2, seed: Long = 7L)
      : DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
    val (cent, cells, _) = ensureRetrainedIndex(spark, dir, nlist,
      iters, seed)
    probeScore(spark, e, cent, cells, k, nprobe)
  }
}
