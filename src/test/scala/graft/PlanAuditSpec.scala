package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** The manual `.explain` sweep as a regression gate: every
  * cheap-to-construct query's physical plan must stay free of
  * cartesian products and unpruned scans. (Keys whose CONSTRUCTION
  * runs jobs — iterative clustering, IVF training, streaming fixtures,
  * bucketed-table writes, tfidf's corpus count — are audited by their
  * own suites instead; building them here would re-run those jobs.) */
class PlanAuditSpec extends SparkSuite {

  private val expensive = Set(
    "dedup_cluster", "dedup_cluster_minhash", "curate_full",
    // index build + component-find jobs on construction (the
    // dedup_cluster_minhash shape)
    "dedup_keep_best",
    "similarity_ivf", "text_tfidf", "join_bucketed",
    "events_pruned", "ingest_e2e_products", "ingest_e2e_control",
    "ingest_e2e_diff", "scan_zorder",
    // runs the bucketed-store overwrite + CoW commit + replay loop on
    // construction (returns a pinned LocalRelation)
    "ingest_replay_check",
    // runs the corpus-total count on construction (the tfidf pattern)
    "text_surprisal",
    // run the matvec passes on construction (model-scalar collects)
    "embed_power_iter", "embed_pca2",
    // collects the sketch survivors + stream total on construction
    "agg_heavy_hitters",
    // the streaming drives EXECUTE on construction (stage + drain a
    // streaming query, return a pinned LocalRelation — no plan to
    // audit); StreamDriveSpec covers them
    "stream_ivj_inner", "stream_ivj_left", "stream_ivj_full",
    "stream_tws_totals", "stream_session_window", "stream_dedup_drive",
    "stream_topk_window", "stream_session_tracker",
    "stream_heavy_hitters", "stream_dedup_minhash",
    "stream_profile_drift", "stream_index_delta",
    "stream_chunks_delta", "stream_vocab_delta", "stream_phash_delta",
    "stream_ann_delta", "stream_ann_delta_recall",
    "stream_fuzzy_delta", "stream_audio_delta", "stream_video_delta",
    "stream_substring_delta",
    // executes the append/compact/replay loop on construction
    "index_compact_check", "fuzzy_compact_check",
    // builds/loads the persisted IVF index on construction
    "similarity_ivf_recall", "similarity_ivf_recall_q",
    "similarity_ivf_delta", "similarity_ivf_delta_recall_q",
    // trains the session PQ codebooks (and, for the composition, the
    // IVF index too) on construction; their truth side is
    // similarity_topk's allowed BNLJ
    "similarity_pq_recall_q", "similarity_ivfpq_recall_q",
    "similarity_ivfpq", "similarity_pq_delta",
    "similarity_pq_delta_recall_q",
    "similarity_ivfpq_delta", "similarity_ivfpq_delta_recall_q",
    // builds/loads the persisted minhash index on construction
    // (dedup_minhash_delta; curate_delta composes it)
    "dedup_minhash_delta", "curate_delta",
    // builds/loads the persisted fuzzy deletion-signature index on
    // construction
    "join_fuzzy_delta",
    // builds/loads the persisted semantic-dedup index on construction
    // (the IVF-delta precedent)
    "dedup_semantic_delta",
    // builds/loads the persisted LSH bucket index on construction
    "dedup_embedding_ann_delta", "dedup_embedding_ann_delta_recall",
    // builds/loads the persisted chunk-digest store on construction
    "dedup_chunks_delta",
    // eager localCheckpoint of the shared fingerprint frame runs the
    // winnow pipeline on construction
    "dedup_winnow",
    // builds/loads the persisted image-fingerprint store (codec
    // roundtrip in mapPartitions) on construction
    "dedup_phash_delta",
    // store-served gauges: build/load the same stores + the split job
    "phash_drift_check", "audio_drift_check", "video_drift_check",
    // build/load the persisted audio/video fingerprint stores (codec
    // roundtrips in mapPartitions) on construction
    "dedup_audio_delta", "dedup_video_delta",
    // curate_full's composition with the scrub stage: the CC loop runs
    // jobs on construction (the curate_full precedent)
    "curate_scrub",
    // composes three persisted indexes (canon, minhash, grams) built
    // on construction
    "curate_scrub_delta",
    // collects the CM sketch + probe items on construction
    "agg_countmin_bound",
    // runs the max(vec_id) base/delta split job on construction
    "index_drift_check",
    // runs the split job AND the pre-gauge decision on construction
    "index_retrain_apply",
    // same pair of shapes for the PQ-codebook gauge
    "pq_drift_check", "pq_retrain_apply",
    // same shape for the vocabulary store
    "vocab_retrain_apply",
    // collects the bloom filter (dim count + aggregate) on construction
    "join_bloom_reduced")
  // sanctioned nested-loop joins: tiny broadcast sides by design —
  // similarity_topk is the deliberate brute-force baseline (10 broadcast
  // query probes × corpus scan, non-equi condition); similarity_ivf
  // scores against a 16-row broadcast centroid model. The contract keys
  // (bench-excluded, verification-scale ground truth by design —
  // Contracts scaladoc) inherit the baseline's shape:
  // similarity_lsh_recall joins against the similarity_topk truth side;
  // dedup_simhash_complete's ground truth IS an all-pairs signature
  // sweep (the operator under audit stays bucketed).
  // profile_merge joins TWO single-row aggregates (merged partials ×
  // the full-scan exact-distinct verification side) on a constant key
  // the optimizer folds away — a 1-row × 1-row broadcast, model-sized
  // by construction.
  // The SemDeDup keys score embeddings against a broadcast centroid
  // model (k rows, k ∝ corpus but model-sized by construction — the
  // similarity_ivf precedent exactly); the recall contract inherits
  // the shape.
  private val bnljAllowed = Set("similarity_topk", "similarity_ivf",
    "similarity_lsh_recall", "dedup_simhash_complete", "profile_merge",
    "dedup_semantic", "dedup_semantic_kmeans", "dedup_semantic_recall",
    "dedup_semantic_delta_recall",
    // broadcast eval-suite side (thousands of rows vs a corpus) — the
    // similarity_topk sanctioned brute-force class
    "decontaminate_semantic",
    // 1-row corpus-totals frame broadcast-crossed into the head panel
    // — the model-scalar crossJoin shape
    "vocab_drift_check",
    // 1-row weight-total frame broadcast-crossed into the source panel
    // — the model-scalar crossJoin shape
    "mix_budget_plan",
    // 1-row corpus-totals frame broadcast-crossed into the contrib
    // chain — the model-scalar crossJoin shape
    "text_bm25")

  // AQE-aware traversal lives in [[PlanNodes]] — shared by every
  // plan-shape suite so no assertion can go vacuously green again.
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = PlanNodes.all(p)

  test("no cartesian product; every parquet scan is column-pruned") {
    val dir = TestSpark.sfDir
    val audited = SparkEntry.queries.keys.filterNot(expensive).toSeq.sorted
    var scansSeen = 0
    val failures = audited.flatMap { name =>
      val nodes = allNodes(SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan)
      val cart = nodes.collect { case c: CartesianProductExec => c }
      val bnlj =
        if (bnljAllowed(name)) Nil
        else nodes.collect { case j: BroadcastNestedLoopJoinExec => j }
      val scans = nodes.filter(n =>
        n.children.isEmpty && n.nodeName.contains("Scan"))
      scansSeen += scans.size
      val wideScans = scans.filter(_.output.length >= 9)
      (cart.map(_ => s"$name: CartesianProduct") ++
        bnlj.map(_ => s"$name: BroadcastNestedLoopJoin") ++
        wideScans.map(s => s"$name: scan reads ${s.output.length} cols"))
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    assert(audited.size >= 50, s"audit shrank to ${audited.size} keys")
    // guard against the audit going blind again (AQE wrapper, node rename)
    assert(scansSeen >= audited.size / 2,
      s"only $scansSeen scan nodes found across ${audited.size} plans — " +
        "traversal is broken")
  }
}
