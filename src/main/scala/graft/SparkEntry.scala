package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.query.{BloomJoin, Bpe, Bucketed, ChunkIndex, Cluster, Contracts, EmbeddingIndex, Events, Finders, FuzzyIndex, FuzzyJoin, IndexDrift, Ivf, MinhashIndex, PipelineOps, PowerIter, Pq, PqDrift, Profile, Relational, Sampling, SemanticIndex, Sketches, SubstringIndex, Temporal, TextQuality, TextSim, Unigram}
import graft.streaming.IngestE2E

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (reference Part A semantics + Part B
  * extensions) is exposed as a named query; each SQL-expressible one has a
  * DuckDB oracle twin in [[oracleSql]] with IDENTICAL output column names
  * and a total ORDER BY (the driver hash-compares values column-sorted).
  * Numeric determinism: decimal-exact sums cast to double, ratios derived
  * from exact operands, similarity scores rounded (see
  * graft.core.Tables).
  */
object SparkEntry {

  /** Flagship: the reference's one real user journey (SURVEY.md §3.1 —
    * upload → async ingest → upsert → status/search) run END TO END on
    * the production machinery: [[graft.ingest.Upload]] lands two weekly
    * deliveries, the checkpointed Structured Streaming pipeline drains
    * them, and the result is served by the [[Finders]] read path joined
    * against driver testdata. Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    import graft.ingest.Upload
    import graft.streaming.IngestStream
    val ws = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/root/repo/target/graft-entry/" +
        java.util.UUID.randomUUID()))
    val landing = ws.resolve("landing").toString
    Upload.landString(landing, "week1.json",
      """[{"code":"0001","product_name":"Oat Milk","brands":"Acme"},
        |{"code":"0002","product_name":"Rye Bread","_id":"drop-me"},
        |{"product_name":"no code -> counted failed"},
        |{"code":"0003","product_name":"Green Tea","quantity":"500 g"}]"""
        .stripMargin, clock = () => 1L)
    Upload.landString(landing, "week2.json",
      """[{"code":"0001","product_name":"Oat Milk Deluxe"},
        |{"code":"0004","product_name":"Dark Chocolate"}]""".stripMargin,
      clock = () => 2L)
    val cfg = IngestStream.Config(
      landingDir = landing,
      warehouseDir = ws.resolve("wh").toString,
      checkpointDir = ws.resolve("ckpt").toString)
    IngestStream.runAvailable(spark, cfg)
    val products = IngestStream.productsStore(cfg).read(spark).get
    val hits = Finders.searchPartial(products, "product_name", "oat",
      "code")
    // join against driver testdata so the smoke also proves table access
    val part = graft.core.Tables.load(spark, "/root/testdata/sf0.001",
      "part").limit(1)
    hits.crossJoin(part.select(col("p_partkey")))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- Part A parity (reference read/write semantics, B12/B13/B19) ---
    "lookup_code" -> (Finders.lookupCode _),
    "search_partial" -> (Finders.searchPartialPart _),
    "search_partial_regex" -> (Finders.searchRegexPart _),
    "search_exact" -> (Finders.searchExactPart _),
    "upsert_products" -> (PipelineOps.upsertProducts _),
    "upsert_set_merge" -> (PipelineOps.upsertSetMerge _),
    // the bucketed exactly-once lifecycle under the hash gate: CoW
    // delivery commit + a replayed delivery that must no-op via the
    // sidecar tag memory — see PipelineOps.ingestReplayCheck
    "ingest_replay_check" -> (PipelineOps.ingestReplayCheck _),
    "status_rollup" -> (PipelineOps.statusRollup _),
    "status_lookup" -> (PipelineOps.statusLookup _),
    // --- Structured Streaming ingest, end-to-end (A15/A16/A17) ---
    "ingest_e2e_products" -> (IngestE2E.products _),
    "ingest_e2e_control" -> (IngestE2E.control _),
    "ingest_e2e_diff" -> (IngestE2E.diff _),
    // --- relational surface (B1–B11) ---
    "scan_filter_project" -> (Relational.scanFilterProject _),
    "q1_agg" -> (Relational.q1Agg _),
    "join_broadcast" -> (Relational.joinBroadcast _),
    "join_multi" -> (Relational.joinMulti _),
    "q5_multi_join_agg" -> (Relational.q5MultiJoinAgg _),
    "join_semi" -> (Relational.joinSemi _),
    "join_anti" -> (Relational.joinAnti _),
    "join_outer_left" -> (Relational.joinOuterLeft _),
    "join_outer_full" -> (Relational.joinOuterFull _),
    "orders_with_exists" -> (Relational.ordersWithExists _),
    "parts_below_avg_qty" -> (Relational.partsBelowAvgQty _),
    "customers_without_urgent" -> (Relational.customersWithoutUrgent _),
    "agg_distinct" -> (Relational.aggDistinct _),
    "agg_approx_distinct" -> (Relational.aggApproxDistinct _),
    "agg_percentile" -> (Relational.aggPercentile _),
    "agg_percentile_approx" -> (Relational.aggPercentileApprox _),
    "agg_rollup" -> (Relational.aggRollup _),
    "agg_grouping_id" -> (Relational.aggGroupingId _),
    "set_union_byname" -> (Relational.setUnionByName _),
    "string_funcs" -> (Relational.stringFuncs _),
    "agg_cube" -> (Relational.aggCube _),
    "agg_grouping_sets" -> (Relational.aggGroupingSets _),
    "window_ntile" -> (Relational.windowNtile _),
    "agg_pivot" -> (Relational.aggPivot _),
    "window_topk" -> (Relational.windowTopk _),
    "window_topk_agg" -> ((s: SparkSession, d: String) => Relational.windowTopkAgg(s, d)),
    "window_running" -> (Relational.windowRunning _),
    "window_lag" -> (Relational.windowLag _),
    "sort_limit" -> (Relational.sortLimit _),
    "set_union" -> (Relational.setUnion _),
    "set_except" -> (Relational.setExcept _),
    "set_intersect" -> (Relational.setIntersect _),
    "set_except_all" -> (Relational.setExceptAll _),
    "set_intersect_all" -> (Relational.setIntersectAll _),
    "join_nullsafe" -> (Relational.joinNullsafe _),
    "agg_minmax_by" -> (Relational.aggMinmaxBy _),
    "agg_corr" -> (Relational.aggCorr _),
    "agg_mode" -> (Relational.aggMode _),
    "window_first_last" -> (Relational.windowFirstLast _),
    "array_funcs" -> (TextSim.arrayFuncs _),
    "higher_order_funcs" -> (TextSim.hofFuncs _),
    "map_funcs" -> (Relational.mapFuncs _),
    "regexp_funcs" -> (Relational.regexpFuncs _),
    "try_funcs" -> (Relational.tryFuncs _),
    "date_arith_funcs" -> (Relational.dateArithFuncs _),
    "q3_top_orders" -> (Relational.q3TopOrders _),
    "join_skew_salted" -> ((s: SparkSession, d: String) => Relational.joinSkewSalted(s, d)),
    "window_range" -> (Relational.windowRange _),
    // --- temporal / sampling / packing (training-pipeline extensions) ---
    "join_asof" -> (Temporal.purchaseAsofView _),
    // the forward direction (earliest following match) and the pandas
    // merge_asof tolerance guard — see Temporal
    "join_asof_forward" -> (Temporal.purchaseAsofNextView _),
    "join_asof_tolerance" -> ((s: SparkSession, d: String) =>
      Temporal.purchaseAsofViewTolerance(s, d)),
    "join_interval" -> (Temporal.intervalJoin _),
    "join_bucketed" -> (Bucketed.joinBucketed _),
    // explicit bloom runtime filter: fact rows dropped at the scan,
    // before the join shuffle — see BloomJoin (result == plain join,
    // no false negatives)
    "join_bloom_reduced" -> (BloomJoin.joinBloomReduced _),
    // edit-distance join (entity resolution): deletion-neighborhood
    // (FastSS) blocking + banded levenshtein verify — see FuzzyJoin
    "join_fuzzy" -> ((s: SparkSession, d: String) =>
      FuzzyJoin.joinFuzzy(s, d)),
    // the weekly regime: dirty delivery probes matched against the
    // PERSISTED deletion-signature index (SnapshotStore chain, base
    // commit + exactly-once O(delta) append) — see FuzzyIndex; same
    // unblocked oracle restricted to delivery probes
    "join_fuzzy_delta" -> ((s: SparkSession, d: String) =>
      FuzzyIndex.joinFuzzyDelta(s, d)),
    // the signature store maintained from a delivery STREAM — the
    // sixth appendOnce family; per-string signatures make the served
    // matches micro-batch-boundary independent, so the key runs under
    // join_fuzzy_delta's exact oracle — see streaming.FuzzyMaintain
    "stream_fuzzy_delta" -> ((s: SparkSession, d: String) =>
      streaming.FuzzyMaintain.joinFuzzyStream(s, d)),
    // the signature store's FULL lifecycle: N-delivery chain +
    // compact (tags fold into the sidecar) + post-compaction replay
    // no-op, served from the compacted store — per-string exactness
    // keeps the content bit-equal, so the same exact oracle gates the
    // whole lifecycle — see streaming.FuzzyMaintain.fuzzyCompactCheck
    "fuzzy_compact_check" -> ((s: SparkSession, d: String) =>
      streaming.FuzzyMaintain.fuzzyCompactCheck(s, d)),
    "events_pruned" -> (graft.sources.Partitioned.eventsPruned _),
    "scan_zorder" -> (graft.sources.Layout.scanZorder _),
    "sample_hash" -> ((s: SparkSession, d: String) => Sampling.sampleHash(s, d)),
    "sample_stratified" -> ((s: SparkSession, d: String) => Sampling.sampleStratified(s, d)),
    "sample_mixture" -> (Sampling.sampleMixture _),
    // source-grain token-budget allocation (the data-recipe planning
    // panel; exact BIGINT floor arithmetic) — see Sampling.mixBudgetPlan
    "mix_budget_plan" -> ((s: SparkSession, d: String) =>
      Sampling.mixBudgetPlan(s, d)),
    // DSIR importance weights: hashed-unigram log-ratio vs the target
    // slice — see Sampling.sampleImportance
    "sample_importance" -> ((s: SparkSession, d: String) => Sampling.sampleImportance(s, d)),
    "embed_quantize" -> (TextSim.embedQuantize _),
    // exact-integer power iteration toward the dominant embedding
    // direction — see PowerIter.embedPowerIter
    "embed_power_iter" -> (PowerIter.embedPowerIter _),
    // the SECOND principal direction by exact-integer deflation — see
    // PowerIter.embedPca2
    "embed_pca2" -> (PowerIter.embedPca2 _),
    // Misra–Gries heavy hitters: the deterministic completeness
    // guarantee under the hash gate — see Sketches.heavyHitters
    "agg_heavy_hitters" -> ((s: SparkSession, d: String) => Sketches.heavyHitters(s, d)),
    // Count-Min point-frequency bounds via the BUILT-IN mergeable
    // count_min_sketch aggregate — see Sketches.countMinBound
    "agg_countmin_bound" -> ((s: SparkSession, d: String) => Sketches.countMinBound(s, d)),
    // mergeable HLL distinct rollup (daily sketches unioned to totals)
    // with the ±5% bound under the hash gate — see Sketches.hllUnionBound
    "agg_hll_union_bound" -> ((s: SparkSession, d: String) => Sketches.hllUnionBound(s, d)),
    // one-scan all-columns table profile — see Profile.profileTable
    "profile_table" -> ((s: SparkSession, d: String) => Profile.profileTable(s, d)),
    // the profile maintained incrementally: per-delivery partials
    // merged, distinct via HLL union — see Profile.profileMerge
    "profile_merge" -> ((s: SparkSession, d: String) => Profile.profileMerge(s, d)),
    // delivery-over-delivery drift flags per column (null-rate shift,
    // range escape, cardinality jump) — see Profile.profileDrift
    "profile_drift" -> ((s: SparkSession, d: String) => Profile.profileDrift(s, d)),
    // the pre-flight join-key skew panel (cardinality, max/p99 group,
    // skew ratio, hottest key) — see Profile.skewReport
    "skew_report" -> (Profile.skewReport _),
    // retrain-trigger gauge for the frozen-model delta indexes:
    // per-cell assignment-distance inflation + occupancy shift over a
    // fixed sign-quadrant geometry, literal thresholds, a boolean
    // needs_retrain / index_retrain decision — see query.IndexDrift
    "index_drift_check" -> ((s: SparkSession, d: String) =>
      IndexDrift.indexDriftCheck(s, d)),
    // the gauge's decision APPLIED: post-action panel (retrain resets
    // the chain -> all-quiet; quiet keeps the pre panel) + the decision
    // bit — the oracle recomputes the whole gauge->act->re-gauge loop
    "index_retrain_apply" -> ((s: SparkSession, d: String) =>
      IndexDrift.indexRetrainApply(s, d)),
    // the PQ-codebook analog of index_drift_check (r18 verdict task
    // 2): per-(subspace, cell) assignment-distance inflation +
    // within-subspace code-occupancy shift over fixed sign-quadrant
    // subspace cells, shared DriftGauge algebra — see query.PqDrift
    "pq_drift_check" -> ((s: SparkSession, d: String) =>
      PqDrift.pqDriftCheck(s, d)),
    // the gauge's decision APPLIED (the index_retrain_apply shape for
    // the codes index): fired -> chain reset -> all-quiet post panel
    "pq_retrain_apply" -> ((s: SparkSession, d: String) =>
      PqDrift.pqRetrainApply(s, d)),
    "stream_profile_drift" -> (streaming.ProfileStream.drift _),
    // tokenizer-vocabulary coverage cut (integer-exact membership) —
    // see TextQuality.vocabCoverage
    "vocab_coverage" -> ((s: SparkSession, d: String) => TextQuality.vocabCoverage(s, d)),
    // retrain-trigger gauge for the tokenizer-vocabulary store: OOV
    // mass + head-token occupancy shift in exact arithmetic — see
    // TextQuality.vocabDriftCheck (the IndexDrift role for VocabStore)
    "vocab_drift_check" -> ((s: SparkSession, d: String) =>
      TextQuality.vocabDriftCheck(s, d)),
    // the vocabulary-count store maintained from a delivery STREAM —
    // the third appendOnce family (minhash, chunks, vocab); token
    // counts are additive, so the served gauge panel is micro-batch-
    // boundary independent and runs under vocab_drift_check's exact
    // oracle — see streaming.VocabMaintain
    "stream_vocab_delta" -> ((s: SparkSession, d: String) =>
      streaming.VocabMaintain.vocabDriftStream(s, d)),
    // the gauge panel AFTER applying its own decision — the
    // index_retrain_apply shape for the vocabulary store
    "vocab_retrain_apply" -> ((s: SparkSession, d: String) =>
      TextQuality.vocabRetrainApply(s, d)),
    // trained BPE tokenizer (Sennrich '16 merges as deterministic
    // aggregations; vocab-grain encode) — see Bpe; rows-only, hash-
    // gated via tokenize_bpe_contract (round-trip + bounds theorems)
    "tokenize_bpe" -> ((s: SparkSession, d: String) => Bpe.tokenizeBpe(s, d)),
    "tokenize_bpe_contract" -> ((s: SparkSession, d: String) => Bpe.roundtripContract(s, d)),
    // trained unigram-LM tokenizer (Kudo '18 EM + Viterbi; vocab-grain
    // encode) — see Unigram; rows-only, hash-gated via
    // tokenize_unigram_contract (tiling round-trip + bounds theorems)
    "tokenize_unigram" -> ((s: SparkSession, d: String) => Unigram.tokenizeUnigram(s, d)),
    "tokenize_unigram_contract" -> ((s: SparkSession, d: String) => Unigram.tilingContract(s, d)),
    "pack_sequences" -> ((s: SparkSession, d: String) => Sampling.packSequences(s, d)),
    "doc_chunk" -> ((s: SparkSession, d: String) => Sampling.docChunk(s, d)),
    // chunk-grain exact dedup (the retrieval-store step downstream of
    // doc_chunk): duplicate-group summary with canonical first-seen
    // location — see Sampling.dedupChunks
    "dedup_chunks" -> ((s: SparkSession, d: String) =>
      Sampling.dedupChunks(s, d)),
    // O(delta) form: delivery chunks probed against the persisted
    // base chunk-digest store — see query.ChunkIndex
    "dedup_chunks_delta" -> ((s: SparkSession, d: String) =>
      ChunkIndex.dedupChunksDelta(s, d)),
    // the chunk-digest store maintained from a delivery STREAM
    // (foreachBatch + appendOnce — the stream_index_delta pattern on a
    // second store family); store content is micro-batch-boundary
    // independent, so the key runs under dedup_chunks_delta's exact
    // oracle — see streaming.ChunkMaintain
    "stream_chunks_delta" -> ((s: SparkSession, d: String) =>
      streaming.ChunkMaintain.dedupChunksStream(s, d)),
    // --- event-time windows (B17–B18) ---
    "stream_tumbling" -> (Events.tumbling _),
    "stream_sliding" -> (Events.sliding _),
    "stream_session" -> (Events.sessionize _),
    "stream_dedup" -> (Events.streamDedup _),
    "events_daily" -> (Events.dailyByType _),
    "events_props" -> (Events.propsExtract _),
    "events_funnel" -> (Events.funnel _),
    "events_retention" -> (Events.retention _),
    "events_date_parts" -> (Events.dateParts _),
    "events_gapfill" -> (Events.gapfill _),
    "events_anomaly" -> (Events.anomalyDaily _),
    "variant_funcs" -> (Events.variantExtract _),
    "variant_safe" -> (Events.variantSafe _),
    "stream_ivj_inner" -> (streaming.IntervalJoinDrive.inner _),
    "stream_ivj_left" -> (streaming.IntervalJoinDrive.left _),
    "stream_ivj_full" -> (streaming.IntervalJoinDrive.full _),
    "stream_tws_totals" -> (streaming.TwsDrive.totals _),
    "stream_session_window" -> (streaming.SessionDrive.sessions _),
    "stream_session_window_restart" -> (streaming.SessionDrive.sessionsRestart _),
    "stream_dedup_drive" -> (streaming.DedupDrive.dedup _),
    "stream_topk_window" -> (streaming.TopKDrive.topk _),
    // the MG sketch inside streaming window state — see HeavyHitterDrive
    "stream_heavy_hitters" -> ((s: SparkSession, d: String) => streaming.HeavyHitterDrive.heavy(s, d)),
    // online near-dup detection: MinHash-LSH dedup as a per-bucket
    // state machine, batch-equal by construction — see MinhashStream
    "stream_dedup_minhash" -> ((s: SparkSession, d: String) => streaming.MinhashStream.dedup(s, d)),
    "stream_session_tracker" -> (streaming.TrackerDrive.sessions _),
    "doc_tokens_pos" -> (TextSim.docTokensPos _),
    "corpus_melt" -> ((s: SparkSession, d: String) => TextQuality.corpusMelt(s, d)),
    "window_rank_stats" -> (Relational.windowRankStats _),
    "agg_conditional" -> (Relational.aggConditional _),
    "corpus_hist" -> ((s: SparkSession, d: String) => TextQuality.corpusHist(s, d)),
    "curate_budget" -> ((s: SparkSession, d: String) => TextQuality.curateBudget(s, d)),
    "curate_e2e" -> ((s: SparkSession, d: String) => TextQuality.curateE2e(s, d)),
    // the curation pipeline on the SCALE PATH: + banded-minhash near-dup
    // cluster stage — see TextQuality.curateFull
    "curate_full" -> ((s: SparkSession, d: String) => TextQuality.curateFull(s, d)),
    // curate_full with the substring-grain scrub stage ON — the
    // complete Lee-'22 placement (doc dedup → span removal among
    // survivors → quality gate on scrubbed text → decontaminate →
    // mixture → pack), under its own composed hash gate
    "curate_scrub" -> ((s: SparkSession, d: String) => TextQuality.curateScrub(s, d)),
    // the incremental pipeline with the scrub stage: delivery
    // survivors span-cleaned against the persisted base gram store
    // before the quality gate — the complete Lee-'22 pipeline in the
    // weekly-delivery regime, O(delta) on every stage
    "curate_scrub_delta" -> ((s: SparkSession, d: String) => TextQuality.curateScrubDelta(s, d)),
    // the weekly delivery curated incrementally against the persisted
    // minhash index — see TextQuality.curateDelta
    "curate_delta" -> ((s: SparkSession, d: String) => TextQuality.curateDelta(s, d)),
    // per-document drop-stage lineage for the curation pipeline — see
    // TextQuality.curateAudit
    "curate_audit" -> ((s: SparkSession, d: String) => TextQuality.curateAudit(s, d)),
    // learned-quality-filter inference: hashed features + broadcast
    // model + one sum — see TextQuality.qualityModelScore
    "quality_model_score" -> ((s: SparkSession, d: String) => TextQuality.qualityModelScore(s, d)),
    // --- text analysis / dedup / similarity (B14–B16 + extensions) ---
    "text_tokens" -> (TextSim.textTokens _),
    "text_stats" -> (TextSim.textStats _),
    "text_langid" -> (TextSim.textLangid _),
    "text_fingerprint" -> (TextSim.textFingerprint _),
    "text_tfidf" -> ((s: SparkSession, d: String) => TextQuality.textTfidf(s, d)),
    // CCNet-style mean unigram surprisal (perplexity-filter signal) —
    // see TextQuality.textSurprisal
    "text_surprisal" -> (TextQuality.textSurprisal _),
    // CCNet's conditional-LM filter signal: bigram perplexity with
    // add-one smoothing — see TextQuality.textPerplexity
    "text_perplexity" -> (TextQuality.textPerplexity _),
    "quality_filter" -> (TextQuality.qualityFilter _),
    // Okapi BM25 against a fixed query term set — the retrieval
    // primitive for targeted corpus slicing; see TextQuality.textBm25
    "text_bm25" -> (TextQuality.textBm25(_, _)),
    "text_repetition" -> (TextQuality.textRepetition _),
    "pii_redact" -> (TextQuality.piiRedact _),
    "dedup_exact" -> (TextSim.dedupExact _),
    // winnowing fingerprint selection (Schleimer '03 / MOSS) — see
    // TextSim.textWinnow
    "text_winnow" -> ((s: SparkSession, d: String) => TextSim.textWinnow(s, d)),
    // MOSS match detection over the selected fingerprints — see
    // TextSim.dedupWinnow
    "dedup_winnow" -> ((s: SparkSession, d: String) => TextSim.dedupWinnow(s, d)),
    "dedup_canonical" -> (TextSim.dedupCanonical _),
    "corpus_stats" -> (TextQuality.corpusStats _),
    "dedup_ngram" -> ((s: SparkSession, d: String) => TextSim.dedupNgram(s, d)),
    // the cluster-consumer form: per-posting double-star candidates
    // above the 32-pair cap (O(df), never O(df²)); pair-identical to
    // dedup_ngram at fixture DFs, so it shares the full hash gate —
    // see TextSim.dedupNgramStarOf
    "dedup_ngram_star" -> ((s: SparkSession, d: String) => TextSim.dedupNgramStar(s, d)),
    // exact duplicated-span detection (substring-grain dedup) — see
    // TextSim.dedupSubstring
    "dedup_substring" -> ((s: SparkSession, d: String) => TextSim.dedupSubstring(s, d)),
    // the Lee-'22 removal stage over the detected spans: keep each
    // duplicated substring's corpus-first occurrence, cut the rest —
    // see TextSim.dedupSubstringApply
    "dedup_substring_apply" -> ((s: SparkSession, d: String) => TextSim.dedupSubstringApply(s, d)),
    // the delivery span-cleaned O(delta) against the persisted gram
    // store — output == the batch apply restricted to delta docs
    // (provably; the oracle states exactly that) — see SubstringIndex
    "dedup_substring_delta" -> ((s: SparkSession, d: String) => SubstringIndex.dedupSubstringDelta(s, d)),
    // the gram store maintained from a delivery STREAM — the ninth
    // appendOnce family; additive counts make the streamed chain
    // boundary-independent and the served clean probes the same
    // pre-delivery base table, so the key runs under
    // dedup_substring_delta's exact oracle — see
    // streaming.SubstringMaintain
    "stream_substring_delta" -> ((s: SparkSession, d: String) =>
      streaming.SubstringMaintain.dedupSubstringStream(s, d)),
    // per-source duplicated-token share derived from the spans — see
    // TextSim.corpusDupRate
    "corpus_dup_rate" -> ((s: SparkSession, d: String) => TextSim.corpusDupRate(s, d)),
    "text_novelty" -> ((s: SparkSession, d: String) => TextSim.textNovelty(s, d)),
    "dedup_levenshtein" -> ((s: SparkSession, d: String) => TextSim.dedupLevenshtein(s, d)),
    // star-bounded candidates + posting-derived minShared floor;
    // fixture-identical to dedup_levenshtein (same hash gate) — see
    // TextSim.dedupLevenshteinStarOf
    "dedup_lev_star" -> ((s: SparkSession, d: String) => TextSim.dedupLevenshteinStar(s, d)),
    "dedup_lev_curated" -> ((s: SparkSession, d: String) =>
      TextSim.dedupLevenshteinOf(TextSim.canonicalSurvivors(
        graft.core.Tables.load(s, d, "documents")))),
    "dedup_minhash" -> ((s: SparkSession, d: String) => TextSim.dedupMinhash(s, d)),
    "dedup_simhash" -> ((s: SparkSession, d: String) => TextSim.dedupSimhash(s, d)),
    "dedup_embedding" -> ((s: SparkSession, d: String) => TextSim.dedupEmbedding(s, d)),
    // SemDeDup: one-cell-per-doc centroid partition, keep-first inside
    // the cell — see TextSim.dedupSemantic
    "dedup_semantic" -> ((s: SparkSession, d: String) => TextSim.dedupSemantic(s, d)),
    // the production form: real Lloyd k-means cells (rows-only; the
    // recall contract below is its hash gate)
    "dedup_semantic_kmeans" -> ((s: SparkSession, d: String) => TextSim.dedupSemanticKmeans(s, d)),
    "dedup_semantic_recall" -> (Contracts.dedupSemanticRecall _),
    // O(delta) semantic dedup: frozen base-trained centroids + the
    // persisted cell/flag stores; one delivery = one O(delta) append
    // per store (rows-only; the recall contract below is its hash
    // gate) — see SemanticIndex
    "dedup_semantic_delta" -> ((s: SparkSession, d: String) =>
      SemanticIndex.dedupSemanticDelta(s, d)),
    "dedup_semantic_delta_recall" ->
      (Contracts.dedupSemanticDeltaRecall _),
    "dedup_embedding_ann" -> ((s: SparkSession, d: String) => TextSim.dedupEmbeddingAnn(s, d)),
    // the delivery's near-dup pairs from the persisted LSH bucket
    // index (exact per-vector maintenance, the minhash argument) —
    // rows-only; the recall contract below is its hash gate — see
    // EmbeddingIndex
    "dedup_embedding_ann_delta" -> ((s: SparkSession, d: String) =>
      EmbeddingIndex.dedupEmbeddingAnnDelta(s, d)),
    "dedup_embedding_ann_delta_recall" ->
      (Contracts.dedupEmbeddingAnnDeltaRecall _),
    // the LSH bucket store maintained from a delivery STREAM — the
    // fifth appendOnce family (minhash, chunks, vocab, phash, ANN);
    // per-vector signatures make the served pairs micro-batch-
    // boundary independent and bit-equal to dedup_embedding_ann_delta
    // — rows-only; the recall contract below is its hash gate — see
    // streaming.AnnMaintain
    "stream_ann_delta" -> ((s: SparkSession, d: String) =>
      streaming.AnnMaintain.dedupAnnStream(s, d)),
    "stream_ann_delta_recall" -> (Contracts.streamAnnDeltaRecall _),
    "dedup_cluster" -> ((s: SparkSession, d: String) => Cluster.dedupCluster(s, d)),
    // the scale path: banded-minhash candidate edges (fan-out bounded
    // by construction, no DF-cap knob) — see Cluster.dedupClusterMinhash
    "dedup_cluster_minhash" -> ((s: SparkSession, d: String) => Cluster.dedupClusterMinhash(s, d)),
    // quality-aware representative selection per near-dup cluster
    // (keep the longest member) — the RefinedWeb "keep best" step;
    // see Cluster.dedupKeepBest
    "dedup_keep_best" -> ((s: SparkSession, d: String) => Cluster.dedupKeepBest(s, d)),
    "decontaminate" -> ((s: SparkSession, d: String) => TextSim.decontaminate(s, d)),
    // embedding-level eval-set contamination (paraphrase leakage the
    // n-gram form misses) — broadcast eval side, see
    // TextSim.decontaminateSemantic
    "decontaminate_semantic" -> ((s: SparkSession, d: String) =>
      TextSim.decontaminateSemantic(s, d)),
    "similarity_topk" -> ((s: SparkSession, d: String) => TextSim.similarityTopk(s, d)),
    "similarity_lsh" -> ((s: SparkSession, d: String) => TextSim.similarityLsh(s, d)),
    "similarity_ivf" -> ((s: SparkSession, d: String) => Ivf.similarityIvf(s, d)),
    // product-quantization ANN (Jégou '11): 8-byte codes, ADC lookup-
    // table scoring, exact rerank — the memory-bound scale path
    // complementing IVF's scan-pruning path; see query.Pq
    "similarity_pq" -> ((s: SparkSession, d: String) => Pq.similarityPq(s, d)),
    // the production composition (FAISS IVFADC): IVF cell pruning ×
    // PQ code scoring × exact rerank — see Pq.similarityIvfPq
    "similarity_ivfpq" -> ((s: SparkSession, d: String) => Pq.similarityIvfPq(s, d)),
    // the composition's O(delta) leg — the state a weekly-delivery
    // user serves at 100 TB: persisted base-trained coarse chain ×
    // incrementally-maintained codes — see Pq.similarityIvfPqDelta
    "similarity_ivfpq_delta" -> ((s: SparkSession, d: String) =>
      Pq.similarityIvfPqDelta(s, d)),
    // the weekly-delivery regime applied to the codes index: frozen
    // codebooks, O(delta) assignment append — see Pq.ensureDeltaIndex
    "similarity_pq_delta" -> ((s: SparkSession, d: String) => Pq.similarityPqDelta(s, d)),
    // the weekly-delivery regime applied to ANN: delta assigned to
    // frozen centroids, appended O(delta) — see Ivf.ensureDeltaIndex
    "similarity_ivf_delta" -> ((s: SparkSession, d: String) => Ivf.similarityIvfDelta(s, d)),
    // the weekly-delivery regime applied to near-dup dedup: the banded
    // index persisted, the delta appended O(delta), the query probing
    // only delta buckets — see MinhashIndex (EXACT maintenance, full
    // hash gate at the 0.8 banding-complete bar)
    "dedup_minhash_delta" -> ((s: SparkSession, d: String) => MinhashIndex.dedupMinhashDelta(s, d)),
    // the PERSISTED index maintained from a delivery STREAM
    // (foreachBatch + SnapshotStore.appendOnce exactly-once appends);
    // final store content is chunking-independent, so the key runs
    // under dedup_minhash_delta's exact oracle — see
    // streaming.IndexMaintain
    "stream_index_delta" -> ((s: SparkSession, d: String) =>
      streaming.IndexMaintain.dedupDelta(s, d)),
    // store COMPACTION proven under the same exact oracle: append 4
    // deliveries, compact the chain to one commit, replay a delivery
    // (the _applied_tags sidecar must no-op it), serve the pairs —
    // see IndexMaintain.dedupDeltaCompacted
    "index_compact_check" -> ((s: SparkSession, d: String) =>
      streaming.IndexMaintain.dedupDeltaCompacted(s, d)),
    // --- contract keys: the approximate families' bound/recall/
    // completeness contracts as hash-gated booleans (see Contracts) ---
    "agg_approx_distinct_bound" -> (Contracts.approxDistinctBound _),
    "agg_percentile_approx_bound" -> (Contracts.approxPercentileBound _),
    "dedup_minhash_recall" -> ((s: SparkSession, d: String) => Contracts.minhashRecall(s, d)),
    "dedup_simhash_complete" -> ((s: SparkSession, d: String) => Contracts.simhashComplete(s, d)),
    "similarity_lsh_recall" -> ((s: SparkSession, d: String) => Contracts.lshRecall(s, d)),
    "similarity_ivf_recall" -> ((s: SparkSession, d: String) => Contracts.ivfRecall(s, d)),
    "similarity_ivf_recall_q" -> ((s: SparkSession, d: String) => Contracts.ivfRecallPerQuery(s, d)),
    "similarity_pq_recall_q" -> ((s: SparkSession, d: String) => Contracts.pqRecallPerQuery(s, d)),
    "similarity_ivfpq_recall_q" -> ((s: SparkSession, d: String) => Contracts.ivfPqRecallPerQuery(s, d)),
    "similarity_ivfpq_delta_recall_q" -> ((s: SparkSession, d: String) => Contracts.ivfPqDeltaRecallPerQuery(s, d)),
    "similarity_pq_delta_recall_q" -> ((s: SparkSession, d: String) => Contracts.pqDeltaRecallPerQuery(s, d)),
    "similarity_ivf_delta_recall_q" -> ((s: SparkSession, d: String) => Contracts.ivfDeltaRecallPerQuery(s, d)),
    "dedup_embedding_ann_recall" -> (Contracts.dedupEmbeddingAnnRecall _),
    // --- multimodal (binary payload plumbing; decode is a marked stub) ---
    "multimodal_meta" -> (Multimodal.mediaMeta _),
    "multimodal_frames" -> ((s: SparkSession, d: String) => Multimodal.frameSample(s, d)),
    "multimodal_features" -> (Multimodal.featureLanes _),
    "multimodal_resize" -> ((s: SparkSession, d: String) => Multimodal.resizeDigest(s, d)),
    // REAL PNG/BMP/GIF decode (javax.imageio) under the hash gate — see
    // Multimodal.decodeRoundtrip
    "multimodal_decode" -> ((s: SparkSession, d: String) => Multimodal.decodeRoundtrip(s, d)),
    // REAL WAV/PCM decode (javax.sound.sampled) under the hash gate —
    // see Multimodal.audioRoundtrip
    "multimodal_audio" -> ((s: SparkSession, d: String) => Multimodal.audioRoundtrip(s, d)),
    // REAL pixel-space 2x2 average-pool over the decoded PNG raster —
    // see Multimodal.resizeRoundtrip
    "multimodal_resize_real" -> ((s: SparkSession, d: String) => Multimodal.resizeRoundtrip(s, d)),
    // windowed frame energy/peak over DECODED WAV samples — see
    // Multimodal.audioFrames
    "multimodal_audio_frames" -> ((s: SparkSession, d: String) => Multimodal.audioFrames(s, d)),
    // REAL multi-frame decode: animated-GIF frame extraction — see
    // Multimodal.videoRoundtrip
    "multimodal_video" -> ((s: SparkSession, d: String) => Multimodal.videoRoundtrip(s, d)),
    // REAL ISO-BMFF (MP4) demux + motion-JPEG keyframe decode — see
    // Multimodal.mp4Roundtrip and multimodal.Mp4
    "multimodal_video_mp4" -> ((s: SparkSession, d: String) => Multimodal.mp4Roundtrip(s, d)),
    // perceptual-hash (dHash) image dedup through the REAL container
    // roundtrip: re-encoded/resized/brightened twins share one hash —
    // see multimodal.Phash (chunk-LSH candidates, exact Hamming verify)
    "dedup_phash" -> ((s: SparkSession, d: String) =>
      graft.multimodal.Phash.dedupPhash(s, d)),
    // the delivery's near-dup image pairs from the persisted
    // fingerprint store (per-item dHash => exact incremental
    // maintenance; only the delivery is decoded) — full hash gate,
    // same pigeonhole-complete construction — see Phash.dedupPhashDelta
    "dedup_phash_delta" -> ((s: SparkSession, d: String) =>
      graft.multimodal.Phash.dedupPhashDelta(s, d)),
    // the retrain gauge for the perceptual-fingerprint store (per-bit
    // occupancy shift + novelty mass, store-served — zero decode at
    // gauge time) — see Phash.phashDriftCheck
    "phash_drift_check" -> ((s: SparkSession, d: String) =>
      graft.multimodal.Phash.phashDriftCheck(s, d)),
    // the fingerprint store maintained from a delivery STREAM — the
    // fourth appendOnce family; each micro-batch decodes ITS images
    // only, the gauge serves from the persisted stores with zero
    // decode, and per-item hashing makes the panel micro-batch-
    // boundary independent: vocab_drift_check's licensing under
    // phash_drift_check's exact oracle — see streaming.PhashMaintain
    "stream_phash_delta" -> ((s: SparkSession, d: String) =>
      streaming.PhashMaintain.phashDriftStream(s, d)),
    // audio-fingerprint dedup through the REAL WAV roundtrip:
    // re-encoded-width/gain/DC-offset/upsampled twins share one
    // Haitsma–Kalker-style hash — see multimodal.AudioFp (chunk-LSH
    // candidates, exact Hamming verify)
    "dedup_audio" -> ((s: SparkSession, d: String) =>
      graft.multimodal.AudioFp.dedupAudio(s, d)),
    // the delivery's near-dup recording pairs from the persisted
    // fingerprint store (per-item H-K hash => exact incremental
    // maintenance; only the delivery pays the WAV roundtrip) — full
    // hash gate — see AudioFp.dedupAudioDelta
    "dedup_audio_delta" -> ((s: SparkSession, d: String) =>
      graft.multimodal.AudioFp.dedupAudioDelta(s, d)),
    // the fingerprint store maintained from a delivery STREAM — the
    // seventh appendOnce family; per-item hashes make the served
    // pairs boundary-independent, so the key runs under
    // dedup_audio_delta's exact oracle — see streaming.AudioMaintain
    "stream_audio_delta" -> ((s: SparkSession, d: String) =>
      streaming.AudioMaintain.dedupAudioStream(s, d)),
    // the retrain gauge for the audio-fingerprint store (shared
    // bit-occupancy + novelty algebra — Phash.bitDriftOf)
    "audio_drift_check" -> ((s: SparkSession, d: String) =>
      graft.multimodal.AudioFp.audioDriftCheck(s, d)),
    // perceptual video dedup through the REAL mux→BMFF-demux→JPEG-
    // decode roundtrip: generationally re-encoded / 2x-temporally-
    // upsampled / freeze-frame-padded twins share one collapsed
    // frame-hash sequence — see multimodal.VideoFp (exact-equality
    // keyed join, never all-pairs)
    "dedup_video" -> ((s: SparkSession, d: String) =>
      graft.multimodal.VideoFp.dedupVideo(s, d)),
    // the delivery's duplicate-footage pairs from the persisted
    // collapsed-sequence store (per-item sequences => exact
    // incremental maintenance; only the delivery pays the
    // mux->demux->decode roundtrip) — full hash gate — see
    // VideoFp.dedupVideoDelta
    "dedup_video_delta" -> ((s: SparkSession, d: String) =>
      graft.multimodal.VideoFp.dedupVideoDelta(s, d)),
    // the sequence store maintained from a delivery STREAM — the
    // eighth appendOnce family; per-item sequences make the served
    // pairs boundary-independent, so the key runs under
    // dedup_video_delta's exact oracle — see streaming.VideoMaintain
    "stream_video_delta" -> ((s: SparkSession, d: String) =>
      streaming.VideoMaintain.dedupVideoStream(s, d)),
    // the retrain gauge for the video-sequence store (sequence-length
    // occupancy + novelty — see VideoFp.videoDriftCheck)
    "video_drift_check" -> ((s: SparkSession, d: String) =>
      graft.multimodal.VideoFp.videoDriftCheck(s, d)))

  /** Gaps-and-islands session oracle — shared by the batch
    * (`stream_session`) and native-session_window-drive
    * (`stream_session_window`) keys, which must agree row-for-row. */
  private val profileDriftOracleSql =
    """WITH s AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS delivery, * FROM orders),
      |p AS (SELECT delivery, CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(o_orderkey) AS BIGINT) AS nn1, CAST(count(DISTINCT o_orderkey) AS BIGINT) AS nd1, min(o_orderkey) AS mn1, max(o_orderkey) AS mx1,
      |  CAST(count(o_custkey) AS BIGINT) AS nn2, CAST(count(DISTINCT o_custkey) AS BIGINT) AS nd2, min(o_custkey) AS mn2, max(o_custkey) AS mx2,
      |  CAST(count(o_orderstatus) AS BIGINT) AS nn3, CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS nd3, min(o_orderstatus) AS mn3, max(o_orderstatus) AS mx3,
      |  CAST(count(o_totalprice) AS BIGINT) AS nn4, CAST(count(DISTINCT o_totalprice) AS BIGINT) AS nd4, min(o_totalprice) AS mn4, max(o_totalprice) AS mx4,
      |  CAST(count(o_orderdate) AS BIGINT) AS nn5, CAST(count(DISTINCT o_orderdate) AS BIGINT) AS nd5, min(o_orderdate) AS mn5, max(o_orderdate) AS mx5,
      |  CAST(count(o_orderpriority) AS BIGINT) AS nn6, CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS nd6, min(o_orderpriority) AS mn6, max(o_orderpriority) AS mx6
      |  FROM s GROUP BY delivery),
      |w AS (SELECT p.*,
      |lag(n) OVER (ORDER BY delivery) AS ln,
      |  lag(nn1) OVER (ORDER BY delivery) AS lnn1, lag(nd1) OVER (ORDER BY delivery) AS lnd1,
      |  min(mn1) OVER (ORDER BY delivery ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmn1,
      |  max(mx1) OVER (ORDER BY delivery ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmx1,
      |  lag(nn2) OVER (ORDER BY delivery) AS lnn2, lag(nd2) OVER (ORDER BY delivery) AS lnd2,
      |  min(mn2) OVER (ORDER BY delivery ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmn2,
      |  max(mx2) OVER (ORDER BY delivery ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmx2,
      |  lag(nn3) OVER (ORDER BY delivery) AS lnn3, lag(nd3) OVER (ORDER BY delivery) AS lnd3,
      |  min(mn3) OVER (ORDER BY delivery ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmn3,
      |  max(mx3) OVER (ORDER BY delivery ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmx3,
      |  lag(nn4) OVER (ORDER BY delivery) AS lnn4, lag(nd4) OVER (ORDER BY delivery) AS lnd4,
      |  min(mn4) OVER (ORDER BY delivery ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmn4,
      |  max(mx4) OVER (ORDER BY delivery ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmx4,
      |  lag(nn5) OVER (ORDER BY delivery) AS lnn5, lag(nd5) OVER (ORDER BY delivery) AS lnd5,
      |  min(mn5) OVER (ORDER BY delivery ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmn5,
      |  max(mx5) OVER (ORDER BY delivery ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmx5,
      |  lag(nn6) OVER (ORDER BY delivery) AS lnn6, lag(nd6) OVER (ORDER BY delivery) AS lnd6,
      |  min(mn6) OVER (ORDER BY delivery ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmn6,
      |  max(mx6) OVER (ORDER BY delivery ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmx6
      |  FROM p)
      |SELECT delivery, 'o_orderkey' AS col_name, n AS n_rows, n - nn1 AS n_nulls, nd1 AS n_distinct,
      |  CAST(mn1 AS VARCHAR) AS min_val, CAST(mx1 AS VARCHAR) AS max_val,
      |  CASE WHEN ln IS NULL THEN FALSE ELSE abs((n - nn1) * ln - (ln - lnn1) * n) * 20 > n * ln END AS null_shift,
      |  CASE WHEN pmn1 IS NULL THEN FALSE ELSE (mn1 < pmn1 OR mx1 > pmx1) END AS range_escape,
      |  CASE WHEN lnd1 IS NULL THEN FALSE ELSE (nd1 > lnd1 * 2 OR nd1 * 2 < lnd1) END AS card_jump
      |FROM w
      |UNION ALL
      |SELECT delivery, 'o_custkey' AS col_name, n AS n_rows, n - nn2 AS n_nulls, nd2 AS n_distinct,
      |  CAST(mn2 AS VARCHAR) AS min_val, CAST(mx2 AS VARCHAR) AS max_val,
      |  CASE WHEN ln IS NULL THEN FALSE ELSE abs((n - nn2) * ln - (ln - lnn2) * n) * 20 > n * ln END AS null_shift,
      |  CASE WHEN pmn2 IS NULL THEN FALSE ELSE (mn2 < pmn2 OR mx2 > pmx2) END AS range_escape,
      |  CASE WHEN lnd2 IS NULL THEN FALSE ELSE (nd2 > lnd2 * 2 OR nd2 * 2 < lnd2) END AS card_jump
      |FROM w
      |UNION ALL
      |SELECT delivery, 'o_orderstatus' AS col_name, n AS n_rows, n - nn3 AS n_nulls, nd3 AS n_distinct,
      |  CAST(mn3 AS VARCHAR) AS min_val, CAST(mx3 AS VARCHAR) AS max_val,
      |  CASE WHEN ln IS NULL THEN FALSE ELSE abs((n - nn3) * ln - (ln - lnn3) * n) * 20 > n * ln END AS null_shift,
      |  CASE WHEN pmn3 IS NULL THEN FALSE ELSE (mn3 < pmn3 OR mx3 > pmx3) END AS range_escape,
      |  CASE WHEN lnd3 IS NULL THEN FALSE ELSE (nd3 > lnd3 * 2 OR nd3 * 2 < lnd3) END AS card_jump
      |FROM w
      |UNION ALL
      |SELECT delivery, 'o_totalprice' AS col_name, n AS n_rows, n - nn4 AS n_nulls, nd4 AS n_distinct,
      |  CAST(mn4 AS VARCHAR) AS min_val, CAST(mx4 AS VARCHAR) AS max_val,
      |  CASE WHEN ln IS NULL THEN FALSE ELSE abs((n - nn4) * ln - (ln - lnn4) * n) * 20 > n * ln END AS null_shift,
      |  CASE WHEN pmn4 IS NULL THEN FALSE ELSE (mn4 < pmn4 OR mx4 > pmx4) END AS range_escape,
      |  CASE WHEN lnd4 IS NULL THEN FALSE ELSE (nd4 > lnd4 * 2 OR nd4 * 2 < lnd4) END AS card_jump
      |FROM w
      |UNION ALL
      |SELECT delivery, 'o_orderdate' AS col_name, n AS n_rows, n - nn5 AS n_nulls, nd5 AS n_distinct,
      |  strftime(mn5, '%Y-%m-%d %H:%M:%S') AS min_val, strftime(mx5, '%Y-%m-%d %H:%M:%S') AS max_val,
      |  CASE WHEN ln IS NULL THEN FALSE ELSE abs((n - nn5) * ln - (ln - lnn5) * n) * 20 > n * ln END AS null_shift,
      |  CASE WHEN pmn5 IS NULL THEN FALSE ELSE (mn5 < pmn5 OR mx5 > pmx5) END AS range_escape,
      |  CASE WHEN lnd5 IS NULL THEN FALSE ELSE (nd5 > lnd5 * 2 OR nd5 * 2 < lnd5) END AS card_jump
      |FROM w
      |UNION ALL
      |SELECT delivery, 'o_orderpriority' AS col_name, n AS n_rows, n - nn6 AS n_nulls, nd6 AS n_distinct,
      |  CAST(mn6 AS VARCHAR) AS min_val, CAST(mx6 AS VARCHAR) AS max_val,
      |  CASE WHEN ln IS NULL THEN FALSE ELSE abs((n - nn6) * ln - (ln - lnn6) * n) * 20 > n * ln END AS null_shift,
      |  CASE WHEN pmn6 IS NULL THEN FALSE ELSE (mn6 < pmn6 OR mx6 > pmx6) END AS range_escape,
      |  CASE WHEN lnd6 IS NULL THEN FALSE ELSE (nd6 > lnd6 * 2 OR nd6 * 2 < lnd6) END AS card_jump
      |FROM w
      |ORDER BY delivery, col_name""".stripMargin

  private val sessionOracleSql =
    """WITH o AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
      |    lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts FROM events),
      |m AS (SELECT *, CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS is_new FROM o),
      |s AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM m)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, min(ts) AS session_start, max(ts) AS session_end,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
      |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin

  /** The verification-only contract keys ([[graft.query.Contracts]]):
    * in the driver's correctness gate like every other key, but
    * excluded from the bench artifact — their ground-truth sides are
    * deliberately verification-scale (all-pairs sweeps, brute-force
    * top-k), correctness gates rather than throughput surfaces, the
    * same reasoning that excludes the restart key. */
  val contractKeys: Set[String] = Set(
    "agg_approx_distinct_bound", "agg_percentile_approx_bound",
    "dedup_minhash_recall", "dedup_simhash_complete",
    "similarity_lsh_recall", "similarity_ivf_recall",
    "similarity_ivf_recall_q", "similarity_ivf_delta_recall_q",
    "similarity_pq_recall_q", "similarity_ivfpq_recall_q",
    "similarity_pq_delta_recall_q", "similarity_ivfpq_delta_recall_q",
    "dedup_embedding_ann_recall", "dedup_embedding_ann_delta_recall",
    "stream_ann_delta_recall",
    "tokenize_bpe_contract",
    "tokenize_unigram_contract", "dedup_semantic_recall",
    "dedup_semantic_delta_recall")

  /** DuckDB twins. Omitted on purpose (rows-only check): dedup_minhash,
    * dedup_simhash, similarity_lsh, dedup_embedding_ann, similarity_ivf,
    * similarity_ivf_delta, similarity_pq, similarity_ivfpq,
    * similarity_pq_delta, similarity_ivfpq_delta,
    * dedup_semantic_kmeans, dedup_semantic_delta,
    * dedup_embedding_ann_delta, stream_ann_delta, agg_approx_distinct,
    * agg_percentile_approx
    * (engine-specific hash/signature/centroid/sketch internals), and
    * tokenize_bpe and tokenize_unigram (the merge/piece tables are
    * trained models — their round-trip/bounds theorems gate them via
    * tokenize_bpe_contract / tokenize_unigram_contract).
    * Each of those families
    * IS hash-gated through its companion contract key
    * ([[graft.query.Contracts]]): a boolean bound/recall/completeness
    * assertion whose oracle is literal TRUE on an oracle-reproducible
    * row grain, so the approximation contract sits under the same hard
    * driver gate as the exact keys. */
  /** the exact delta near-dup SQL shared by the batch index
    * (`dedup_minhash_delta`), the streamed maintainer
    * (`stream_index_delta`) and the compaction check
    * (`index_compact_check`): all three CONTRACT to serve bit-identical
    * content, so the identity is structural — one val, not three
    * hand-synced copies. */
  private val minhashDeltaOracle: String =
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS shingle
        |  FROM t WHERE len(toks) >= 3),
        |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |cut AS (SELECT max(doc_id) * 4 // 5 + 1 AS c FROM documents),
        |com AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT d1, d2,
        |  round(CAST(common AS DOUBLE) / (c1.n_sh + c2.n_sh - common), 6) AS jaccard
        |FROM com JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id, cut
        |WHERE d2 >= cut.c
        |  AND round(CAST(common AS DOUBLE) / (c1.n_sh + c2.n_sh - common), 6) >= 0.8
        |ORDER BY d1, d2""".stripMargin

  /** `dedup_audio_delta`'s exact SQL, shared with its streamed twin
    * (`stream_audio_delta`): per-item exactness makes the stream-maintained
    * store bit-equal to the batch chain, so ONE val gates both —
    * the identity is structural. */
  private val audioDeltaOracle: String =
      """WITH g AS (SELECT doc_id, doc_id - doc_id % 5 AS anchor FROM documents),
        |ah AS (SELECT doc_id, (anchor * 2654435761) % 1000003 AS a1 FROM g),
        |m AS (SELECT doc_id, list_transform(range(0, 340), i ->
        |    (a1 + i * i * (a1 % 97 + 3) + i * (a1 % 89 + 7)
        |     + (i * i * i) % 1009 * (a1 % 83 + 11)) % 121 - 60) AS m
        |  FROM ah),
        |s AS (SELECT doc_id, list_transform(range(0, 85), ci ->
        |    m[ci * 4 + 1] + m[ci * 4 + 2] + m[ci * 4 + 3] + m[ci * 4 + 4]) AS s FROM m),
        |d AS (SELECT doc_id, list_transform(range(0, 68), di ->
        |    s[(di // 4) * 5 + (di % 4) + 1] - s[(di // 4) * 5 + (di % 4) + 2]) AS d FROM s),
        |bits AS (SELECT doc_id, list_transform(range(0, 64), b ->
        |    CASE WHEN d[((b // 4) + 1) * 4 + (b % 4) + 1] > d[(b // 4) * 4 + (b % 4) + 1]
        |    THEN 1 ELSE 0 END) AS bits FROM d),
        |cut AS (SELECT max(doc_id) * 4 // 5 + 1 AS c FROM documents),
        |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
        |    CAST(list_sum(list_transform(range(1, 65),
        |      i -> CASE WHEN a.bits[i] <> b.bits[i] THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
        |  FROM bits a JOIN bits b ON a.doc_id < b.doc_id
        |    AND b.doc_id >= (SELECT c FROM cut))
        |SELECT d1, d2, hamming FROM p WHERE hamming <= 3 ORDER BY d1, d2""".stripMargin

  /** `dedup_video_delta`'s exact SQL, shared with its streamed twin
    * (`stream_video_delta`): per-item exactness makes the stream-maintained
    * store bit-equal to the batch chain, so ONE val gates both —
    * the identity is structural. */
  private val videoDeltaOracle: String =
      """WITH g AS (SELECT doc_id, doc_id - doc_id % 4 AS anchor FROM documents),
        |fr AS (SELECT doc_id, anchor, unnest(range(0, anchor % 3 + 3)) AS f FROM g),
        |h AS (SELECT doc_id, f, array_to_string(list_transform(range(0, 64), i ->
        |    CASE WHEN
        |      list_sum(list_transform(range(0, (i % 8) + 2), j ->
        |        (anchor * 31 + anchor // (j + 2) + anchor // ((i // 8) + 2) + f * 101 + (i // 8) * 7 + j * 13) % 3 + 1)) % 4
        |      >
        |      list_sum(list_transform(range(0, (i % 8) + 1), j ->
        |        (anchor * 31 + anchor // (j + 2) + anchor // ((i // 8) + 2) + f * 101 + (i // 8) * 7 + j * 13) % 3 + 1)) % 4
        |    THEN '1' ELSE '0' END), '') AS fh FROM fr),
        |seqs AS (SELECT doc_id, list(fh ORDER BY f) AS hs FROM h GROUP BY doc_id),
        |coll AS (SELECT doc_id, list_filter(hs, (x, i) -> i = 1 OR x <> hs[i - 1]) AS cs FROM seqs),
        |v AS (SELECT doc_id, array_to_string(cs, '|') AS vseq, CAST(len(cs) AS BIGINT) AS n_frames FROM coll),
        |cut AS (SELECT max(doc_id) * 4 // 5 + 1 AS c FROM documents)
        |SELECT a.doc_id AS d1, b.doc_id AS d2, a.n_frames
        |FROM v a JOIN v b ON a.vseq = b.vseq AND a.doc_id < b.doc_id
        |  AND b.doc_id >= (SELECT c FROM cut)
        |ORDER BY d1, d2""".stripMargin

  /** `dedup_substring_delta`'s exact SQL, shared with its streamed twin
    * (`stream_substring_delta`): per-item exactness makes the stream-maintained
    * store bit-equal to the batch chain, so ONE val gates both —
    * the identity is structural. */
  private val substringDeltaOracle: String =
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents),
        |cut AS (SELECT max(doc_id) * 4 // 5 + 1 AS c FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(0, len(toks) - 5 + 1),
        |    s -> struct_pack(start := s, gram := array_to_string(toks[s + 1 : s + 5], ' ')))) AS gs
        |  FROM t WHERE len(toks) >= 5),
        |g2 AS (SELECT doc_id, gs.start AS start, gs.gram AS gram FROM g),
        |dup AS (SELECT gram FROM g2 GROUP BY gram HAVING count(*) >= 2),
        |occ AS (SELECT doc_id, start,
        |    row_number() OVER (PARTITION BY gram ORDER BY doc_id, start) = 1 AS is_primary
        |  FROM g2 WHERE gram IN (SELECT gram FROM dup)),
        |cov AS (SELECT doc_id, unnest(generate_series(start, start + 4)) AS pos, is_primary FROM occ),
        |cov2 AS (SELECT doc_id, pos, max(is_primary) AS primary_covered FROM cov GROUP BY doc_id, pos),
        |p AS (SELECT doc_id, unnest(range(len(toks))) AS pos FROM t),
        |p2 AS (SELECT p.doc_id, p.pos, t.toks[p.pos + 1] AS tk FROM p JOIN t USING (doc_id)),
        |j AS (SELECT p2.doc_id, p2.pos, p2.tk,
        |    coalesce(NOT cov2.primary_covered, FALSE) AS removed
        |  FROM p2 LEFT JOIN cov2 ON p2.doc_id = cov2.doc_id AND p2.pos = cov2.pos),
        |per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(count(*) FILTER (WHERE removed) AS BIGINT) AS n_removed,
        |    coalesce(string_agg(tk, ' ' ORDER BY pos) FILTER (WHERE NOT removed), '') AS cleaned_text
        |  FROM j GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(per.n_tokens, 0) AS n_tokens,
        |  coalesce(per.n_removed, 0) AS n_removed,
        |  coalesce(per.cleaned_text, '') AS cleaned_text
        |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
        |WHERE d.doc_id >= (SELECT c FROM cut)
        |ORDER BY d.doc_id""".stripMargin

  /** the exact unblocked fuzzy-delta SQL shared by the persisted-index
    * key (`join_fuzzy_delta`) and its streamed maintainer
    * (`stream_fuzzy_delta`): both CONTRACT to serve the same matches
    * (per-string signatures make store content boundary-independent),
    * so the identity is structural — one val. */
  private val fuzzyDeltaOracle: String =
      """WITH cut AS (SELECT CAST(floor(max(p_partkey) * 4 / 5) AS BIGINT) + 1 AS c FROM part),
        |probes AS (SELECT p_partkey AS probe_id,
        |    concat(substring(p_name, 1, 2), substring(p_name, 4)) AS probe_name
        |  FROM part, cut WHERE p_partkey % 20 = 0 AND p_partkey >= cut.c),
        |m AS (SELECT probe_id, probe_name, p_partkey, p_name,
        |    CAST(levenshtein(probe_name, p_name) AS BIGINT) AS dist
        |  FROM probes CROSS JOIN part
        |  WHERE levenshtein(probe_name, p_name) <= 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
        |    ORDER BY dist, p_partkey) AS rn FROM m)
        |SELECT probe_id, probe_name, p_partkey AS match_key,
        |  p_name AS match_name, dist
        |FROM r WHERE rn = 1 ORDER BY probe_id""".stripMargin

  /** the exact delta chunk-dedup SQL shared by the batch store
    * (`dedup_chunks_delta`) and its streamed maintainer
    * (`stream_chunks_delta`). */
  private val chunksDeltaOracle: String =
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents WHERE len(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) > 0),
        |s AS (SELECT doc_id, toks, unnest(range(0, len(toks), 32)) AS chunk_start FROM t),
        |c AS (SELECT doc_id, chunk_start,
        |    list_slice(toks, chunk_start + 1, chunk_start + 64) AS chunk
        |  FROM s),
        |f AS (SELECT doc_id, CAST(chunk_start // 32 AS BIGINT) AS chunk_idx,
        |    md5(array_to_string(chunk, ' ')) AS chunk_md5
        |  FROM c WHERE chunk_start = 0 OR len(chunk) > 32),
        |cut AS (SELECT max(doc_id) * 4 // 5 + 1 AS c FROM documents),
        |g AS (SELECT chunk_md5, doc_id, chunk_idx,
        |    first_value(doc_id) OVER w AS canon_doc_id,
        |    first_value(chunk_idx) OVER w AS canon_chunk_idx
        |  FROM f WINDOW w AS (PARTITION BY chunk_md5
        |    ORDER BY doc_id, chunk_idx
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT doc_id, chunk_idx, chunk_md5, canon_doc_id, canon_chunk_idx
        |FROM g, cut
        |WHERE doc_id >= cut.c
        |  AND (doc_id != canon_doc_id OR chunk_idx != canon_chunk_idx)
        |ORDER BY doc_id, chunk_idx""".stripMargin

  /** the exact vocabulary-gauge SQL shared by the batch gauge
    * (`vocab_drift_check`) and its streamed maintainer
    * (`stream_vocab_delta`). */
  private val vocabDriftOracle: String =
      """WITH cut AS (SELECT max(doc_id) * 4 // 5 + 1 AS c FROM documents),
        |t AS (SELECT doc_id >= (SELECT c FROM cut) AS is_delta,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS w
        |  FROM documents),
        |counts AS (SELECT w,
        |    count(*) FILTER (WHERE NOT is_delta) AS n_base,
        |    count(*) FILTER (WHERE is_delta) AS n_delta
        |  FROM t GROUP BY w),
        |tot AS (SELECT CAST(sum(n_base) AS BIGINT) AS tb,
        |    CAST(sum(n_delta) AS BIGINT) AS td,
        |    CAST(coalesce(sum(n_delta) FILTER (WHERE n_base = 0), 0) AS BIGINT) AS oov_occ,
        |    CAST(count(*) FILTER (WHERE n_base = 0 AND n_delta > 0) AS BIGINT) AS new_tokens
        |  FROM counts),
        |head AS (SELECT w, CAST(n_base AS BIGINT) AS n_base,
        |    CAST(n_delta AS BIGINT) AS n_delta
        |  FROM counts WHERE n_base > 0
        |  ORDER BY n_base DESC, w ASC LIMIT 32),
        |panel AS (SELECT w, n_base, n_delta,
        |    abs(CAST(n_delta AS HUGEINT) * tb - CAST(n_base AS HUGEINT) * td) * 20
        |      > CAST(tb AS HUGEINT) * td AS occ_shift,
        |    round(CAST(oov_occ AS DOUBLE) / td, 6) AS oov_rate,
        |    new_tokens,
        |    oov_occ * 100 > td AS oov_drift
        |  FROM head, tot)
        |SELECT w, n_base, n_delta, occ_shift, oov_rate, new_tokens,
        |  oov_drift,
        |  bool_or(occ_shift) OVER () OR oov_drift AS vocab_retrain
        |FROM panel ORDER BY w""".stripMargin

  /** the exact perceptual-gauge SQL shared by the batch gauge
    * (`phash_drift_check`) and its streamed maintainer
    * (`stream_phash_delta`). */
  private val phashDriftOracle: String =
      """WITH g AS (SELECT doc_id, doc_id - doc_id % 5 AS anchor FROM documents),
        |px AS (SELECT doc_id, anchor,
        |    list_transform(range(0, 288), i ->
        |      (anchor * 31 + (i % 18) * (i % 18) * (anchor % 41 + 2)
        |       + (i // 18) * (i // 18) * (anchor % 43 + 3)
        |       + (i % 18) * (i // 18) * (anchor % 97 + 1)) % 200) AS px
        |  FROM g),
        |grid AS (SELECT doc_id, list_transform(range(0, 72), gi ->
        |    (px[(2 * (gi // 9)) * 18 + 2 * (gi % 9) + 1]
        |   + px[(2 * (gi // 9)) * 18 + 2 * (gi % 9) + 2]
        |   + px[(2 * (gi // 9) + 1) * 18 + 2 * (gi % 9) + 1]
        |   + px[(2 * (gi // 9) + 1) * 18 + 2 * (gi % 9) + 2]) // 4
        |  ) AS grid FROM px),
        |bits AS (SELECT doc_id, list_transform(range(0, 64), b ->
        |    CASE WHEN grid[(b // 8) * 9 + (b % 8) + 2] > grid[(b // 8) * 9 + (b % 8) + 1]
        |    THEN 1 ELSE 0 END) AS bits FROM grid),
        |cut AS (SELECT max(doc_id) * 4 // 5 + 1 AS c FROM documents),
        |f AS (SELECT doc_id, bits, doc_id >= (SELECT c FROM cut) AS is_d,
        |    array_to_string(bits, '') AS fp FROM bits),
        |nov AS (SELECT CAST(count(*) AS BIGINT) AS novel_occ FROM f
        |  WHERE is_d AND fp NOT IN (SELECT fp FROM f WHERE NOT is_d)),
        |tot AS (SELECT CAST(count(*) FILTER (WHERE NOT is_d) AS BIGINT) AS tb,
        |    CAST(count(*) FILTER (WHERE is_d) AS BIGINT) AS td FROM f),
        |pb AS (SELECT t.b AS bit,
        |    CAST(sum(CASE WHEN NOT is_d THEN bits[t.b + 1] ELSE 0 END) AS BIGINT) AS n1_base,
        |    CAST(sum(CASE WHEN is_d THEN bits[t.b + 1] ELSE 0 END) AS BIGINT) AS n1_delta
        |  FROM f CROSS JOIN range(0, 64) t(b) GROUP BY t.b),
        |panel AS (SELECT CAST(bit AS BIGINT) AS bit, n1_base, n1_delta,
        |    abs(CAST(n1_delta AS HUGEINT) * tb - CAST(n1_base AS HUGEINT) * td) * 20
        |      > CAST(tb AS HUGEINT) * td AS occ_shift,
        |    CASE WHEN td = 0 THEN 0.0
        |         ELSE round(CAST(novel_occ AS DOUBLE) / td, 6) END AS novel_rate,
        |    novel_occ * 2 > td AS novelty_drift
        |  FROM pb, tot, nov)
        |SELECT bit, n1_base, n1_delta, occ_shift, novel_rate,
        |  novelty_drift,
        |  bool_or(occ_shift) OVER () OR novelty_drift AS fp_retrain
        |FROM panel ORDER BY bit""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "agg_approx_distinct_bound" ->
      """SELECT o_orderpriority, TRUE AS within_5pct FROM orders
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "agg_percentile_approx_bound" ->
      """SELECT event_type, TRUE AS p50_in_band, TRUE AS p90_in_band
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // round-trip (decode∘encode = normalized text) and symbol-count
    // bounds are theorems of a correct BPE trainer+encoder — the
    // literal-TRUE oracle makes any regression a hash failure
    "tokenize_bpe_contract" ->
      """SELECT doc_id, TRUE AS roundtrip_ok, TRUE AS bounds_ok
        |FROM documents ORDER BY doc_id""".stripMargin,
    // tiling round-trip (pieces concatenate to the normalized text)
    // and piece-count bounds are theorems of a correct unigram
    // trainer+Viterbi encoder — the literal-TRUE oracle makes any
    // regression a hash failure
    "tokenize_unigram_contract" ->
      """SELECT doc_id, TRUE AS roundtrip_ok, TRUE AS bounds_ok
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the integer-algebra twin of dedup_phash: the oracle recomputes
    // each document's 64-bit dHash from the SHARED pixel formula alone
    // (groups of 5 share an anchor raster; resize/brighten/re-encode
    // leave the gradient bits invariant in exact integer arithmetic,
    // so the base raster's hash IS every variant's hash) and sweeps
    // all pairs; the Spark side must recover the same hashes through a
    // genuine PNG/BMP/GIF encode→sniff→decode roundtrip
    "dedup_phash" ->
      """WITH g AS (SELECT doc_id, doc_id - doc_id % 5 AS anchor FROM documents),
        |px AS (SELECT doc_id, anchor,
        |    list_transform(range(0, 288), i ->
        |      (anchor * 31 + (i % 18) * (i % 18) * (anchor % 41 + 2)
        |       + (i // 18) * (i // 18) * (anchor % 43 + 3)
        |       + (i % 18) * (i // 18) * (anchor % 97 + 1)) % 200) AS px
        |  FROM g),
        |grid AS (SELECT doc_id, list_transform(range(0, 72), gi ->
        |    (px[(2 * (gi // 9)) * 18 + 2 * (gi % 9) + 1]
        |   + px[(2 * (gi // 9)) * 18 + 2 * (gi % 9) + 2]
        |   + px[(2 * (gi // 9) + 1) * 18 + 2 * (gi % 9) + 1]
        |   + px[(2 * (gi // 9) + 1) * 18 + 2 * (gi % 9) + 2]) // 4
        |  ) AS grid FROM px),
        |bits AS (SELECT doc_id, list_transform(range(0, 64), b ->
        |    CASE WHEN grid[(b // 8) * 9 + (b % 8) + 2] > grid[(b // 8) * 9 + (b % 8) + 1]
        |    THEN 1 ELSE 0 END) AS bits FROM grid),
        |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
        |    CAST(list_sum(list_transform(range(1, 65),
        |      i -> CASE WHEN a.bits[i] <> b.bits[i] THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
        |  FROM bits a JOIN bits b ON a.doc_id < b.doc_id)
        |SELECT d1, d2, hamming FROM p WHERE hamming <= 3 ORDER BY d1, d2""".stripMargin,
    // the delta twin: identical hash recomputation, pairs restricted
    // to the newer-side-in-the-delivery slice (chunk-LSH completeness
    // is per-pair, so the restriction loses nothing)
    "dedup_phash_delta" ->
      """WITH g AS (SELECT doc_id, doc_id - doc_id % 5 AS anchor FROM documents),
        |px AS (SELECT doc_id, anchor,
        |    list_transform(range(0, 288), i ->
        |      (anchor * 31 + (i % 18) * (i % 18) * (anchor % 41 + 2)
        |       + (i // 18) * (i // 18) * (anchor % 43 + 3)
        |       + (i % 18) * (i // 18) * (anchor % 97 + 1)) % 200) AS px
        |  FROM g),
        |grid AS (SELECT doc_id, list_transform(range(0, 72), gi ->
        |    (px[(2 * (gi // 9)) * 18 + 2 * (gi % 9) + 1]
        |   + px[(2 * (gi // 9)) * 18 + 2 * (gi % 9) + 2]
        |   + px[(2 * (gi // 9) + 1) * 18 + 2 * (gi % 9) + 1]
        |   + px[(2 * (gi // 9) + 1) * 18 + 2 * (gi % 9) + 2]) // 4
        |  ) AS grid FROM px),
        |bits AS (SELECT doc_id, list_transform(range(0, 64), b ->
        |    CASE WHEN grid[(b // 8) * 9 + (b % 8) + 2] > grid[(b // 8) * 9 + (b % 8) + 1]
        |    THEN 1 ELSE 0 END) AS bits FROM grid),
        |cut AS (SELECT max(doc_id) * 4 // 5 + 1 AS c FROM documents),
        |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
        |    CAST(list_sum(list_transform(range(1, 65),
        |      i -> CASE WHEN a.bits[i] <> b.bits[i] THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
        |  FROM bits a JOIN bits b ON a.doc_id < b.doc_id
        |    AND b.doc_id >= (SELECT c FROM cut))
        |SELECT d1, d2, hamming FROM p WHERE hamming <= 3 ORDER BY d1, d2""".stripMargin,
    // the gauge twin: identical bit recomputation from the pixel
    // formula; per-bit occupancy in exact cross-multiplication,
    // novelty via the full-fingerprint key
    "phash_drift_check" -> phashDriftOracle,
    // identical output contract to phash_drift_check: the streamed
    // appendOnce fingerprint maintenance serves a bit-identical panel
    "stream_phash_delta" -> phashDriftOracle,
    // the integer-algebra twin of dedup_audio: the oracle recomputes
    // each document's 64-bit Haitsma–Kalker-style fingerprint from the
    // SHARED sample formula alone (groups of 5 share an anchor
    // waveform; 8-bit re-encode / gain / DC offset / 2× upsample are
    // all positive-linear maps whose double-difference signs are
    // invariant in exact integer arithmetic, so the base waveform's
    // hash IS every variant's hash) and sweeps all pairs; the Spark
    // side must recover the same hashes through a genuine WAV
    // encode→sniff→decode roundtrip (16-bit signed AND 8-bit unsigned
    // PCM through the JDK's own WAVE reader)
    "dedup_audio" ->
      """WITH g AS (SELECT doc_id, doc_id - doc_id % 5 AS anchor FROM documents),
        |ah AS (SELECT doc_id, (anchor * 2654435761) % 1000003 AS a1 FROM g),
        |m AS (SELECT doc_id, list_transform(range(0, 340), i ->
        |    (a1 + i * i * (a1 % 97 + 3) + i * (a1 % 89 + 7)
        |     + (i * i * i) % 1009 * (a1 % 83 + 11)) % 121 - 60) AS m
        |  FROM ah),
        |s AS (SELECT doc_id, list_transform(range(0, 85), ci ->
        |    m[ci * 4 + 1] + m[ci * 4 + 2] + m[ci * 4 + 3] + m[ci * 4 + 4]) AS s FROM m),
        |d AS (SELECT doc_id, list_transform(range(0, 68), di ->
        |    s[(di // 4) * 5 + (di % 4) + 1] - s[(di // 4) * 5 + (di % 4) + 2]) AS d FROM s),
        |bits AS (SELECT doc_id, list_transform(range(0, 64), b ->
        |    CASE WHEN d[((b // 4) + 1) * 4 + (b % 4) + 1] > d[(b // 4) * 4 + (b % 4) + 1]
        |    THEN 1 ELSE 0 END) AS bits FROM d),
        |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
        |    CAST(list_sum(list_transform(range(1, 65),
        |      i -> CASE WHEN a.bits[i] <> b.bits[i] THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
        |  FROM bits a JOIN bits b ON a.doc_id < b.doc_id)
        |SELECT d1, d2, hamming FROM p WHERE hamming <= 3 ORDER BY d1, d2""".stripMargin,
    // the audio gauge twin: identical H-K bit recomputation from the
    // sample formula; the phash_drift_check panel algebra verbatim
    "audio_drift_check" ->
      """WITH g AS (SELECT doc_id, doc_id - doc_id % 5 AS anchor FROM documents),
        |ah AS (SELECT doc_id, (anchor * 2654435761) % 1000003 AS a1 FROM g),
        |m AS (SELECT doc_id, list_transform(range(0, 340), i ->
        |    (a1 + i * i * (a1 % 97 + 3) + i * (a1 % 89 + 7)
        |     + (i * i * i) % 1009 * (a1 % 83 + 11)) % 121 - 60) AS m
        |  FROM ah),
        |s AS (SELECT doc_id, list_transform(range(0, 85), ci ->
        |    m[ci * 4 + 1] + m[ci * 4 + 2] + m[ci * 4 + 3] + m[ci * 4 + 4]) AS s FROM m),
        |d AS (SELECT doc_id, list_transform(range(0, 68), di ->
        |    s[(di // 4) * 5 + (di % 4) + 1] - s[(di // 4) * 5 + (di % 4) + 2]) AS d FROM s),
        |bits AS (SELECT doc_id, list_transform(range(0, 64), b ->
        |    CASE WHEN d[((b // 4) + 1) * 4 + (b % 4) + 1] > d[(b // 4) * 4 + (b % 4) + 1]
        |    THEN 1 ELSE 0 END) AS bits FROM d),
        |cut AS (SELECT max(doc_id) * 4 // 5 + 1 AS c FROM documents),
        |f AS (SELECT doc_id, bits, doc_id >= (SELECT c FROM cut) AS is_d,
        |    array_to_string(bits, '') AS fp FROM bits),
        |nov AS (SELECT CAST(count(*) AS BIGINT) AS novel_occ FROM f
        |  WHERE is_d AND fp NOT IN (SELECT fp FROM f WHERE NOT is_d)),
        |tot AS (SELECT CAST(count(*) FILTER (WHERE NOT is_d) AS BIGINT) AS tb,
        |    CAST(count(*) FILTER (WHERE is_d) AS BIGINT) AS td FROM f),
        |pb AS (SELECT t.b AS bit,
        |    CAST(sum(CASE WHEN NOT is_d THEN bits[t.b + 1] ELSE 0 END) AS BIGINT) AS n1_base,
        |    CAST(sum(CASE WHEN is_d THEN bits[t.b + 1] ELSE 0 END) AS BIGINT) AS n1_delta
        |  FROM f CROSS JOIN range(0, 64) t(b) GROUP BY t.b),
        |panel AS (SELECT CAST(bit AS BIGINT) AS bit, n1_base, n1_delta,
        |    abs(CAST(n1_delta AS HUGEINT) * tb - CAST(n1_base AS HUGEINT) * td) * 20
        |      > CAST(tb AS HUGEINT) * td AS occ_shift,
        |    CASE WHEN td = 0 THEN 0.0
        |         ELSE round(CAST(novel_occ AS DOUBLE) / td, 6) END AS novel_rate,
        |    novel_occ * 2 > td AS novelty_drift
        |  FROM pb, tot, nov)
        |SELECT bit, n1_base, n1_delta, occ_shift, novel_rate,
        |  novelty_drift,
        |  bool_or(occ_shift) OVER () OR novelty_drift AS fp_retrain
        |FROM panel ORDER BY bit""".stripMargin,
    // the delta twin: identical hash recomputation, pairs restricted
    // to the newer-side-in-the-delivery slice (chunk-LSH completeness
    // is per-pair, so the restriction loses nothing — the
    // dedup_phash_delta construction)
    "dedup_audio_delta" -> audioDeltaOracle,
    // structural identity: the stream-maintained store is bit-equal
    // to the batch chain (per-item hashes), ONE val gates both
    "stream_audio_delta" -> audioDeltaOracle,
    // the integer-algebra twin of dedup_video: the oracle recomputes
    // every frame's 64-bit dHash from the SHARED cell formula (groups
    // of 4 share an anchor's footage; the generational JPEG re-encode
    // is pixel-exact because 8x8-aligned constant blocks are DC-only,
    // and the temporal-upsample / freeze-pad disguises vanish under
    // the shared consecutive-collapse), collapses identically, and
    // sweeps all pairs; the Spark side must recover the same collapsed
    // sequences through a genuine mux -> ISO-BMFF demux -> JPEG decode
    // roundtrip. Cell level = running prefix (mod 4) of keyed steps in
    // 1..3 along the row; dHash bit i compares grid col (i%8)+1 vs
    // (i%8) in row i//8, LSB-first in the bit string.
    "dedup_video" ->
      """WITH g AS (SELECT doc_id, doc_id - doc_id % 4 AS anchor FROM documents),
        |fr AS (SELECT doc_id, anchor, unnest(range(0, anchor % 3 + 3)) AS f FROM g),
        |h AS (SELECT doc_id, f, array_to_string(list_transform(range(0, 64), i ->
        |    CASE WHEN
        |      list_sum(list_transform(range(0, (i % 8) + 2), j ->
        |        (anchor * 31 + anchor // (j + 2) + anchor // ((i // 8) + 2) + f * 101 + (i // 8) * 7 + j * 13) % 3 + 1)) % 4
        |      >
        |      list_sum(list_transform(range(0, (i % 8) + 1), j ->
        |        (anchor * 31 + anchor // (j + 2) + anchor // ((i // 8) + 2) + f * 101 + (i // 8) * 7 + j * 13) % 3 + 1)) % 4
        |    THEN '1' ELSE '0' END), '') AS fh FROM fr),
        |seqs AS (SELECT doc_id, list(fh ORDER BY f) AS hs FROM h GROUP BY doc_id),
        |coll AS (SELECT doc_id, list_filter(hs, (x, i) -> i = 1 OR x <> hs[i - 1]) AS cs FROM seqs),
        |v AS (SELECT doc_id, array_to_string(cs, '|') AS vseq, CAST(len(cs) AS BIGINT) AS n_frames FROM coll)
        |SELECT a.doc_id AS d1, b.doc_id AS d2, a.n_frames
        |FROM v a JOIN v b ON a.vseq = b.vseq AND a.doc_id < b.doc_id
        |ORDER BY d1, d2""".stripMargin,
    // the video gauge twin: identical collapsed-sequence
    // recomputation; sequence-length occupancy panel + vseq novelty
    "video_drift_check" ->
      """WITH g AS (SELECT doc_id, doc_id - doc_id % 4 AS anchor FROM documents),
        |fr AS (SELECT doc_id, anchor, unnest(range(0, anchor % 3 + 3)) AS f FROM g),
        |h AS (SELECT doc_id, f, array_to_string(list_transform(range(0, 64), i ->
        |    CASE WHEN
        |      list_sum(list_transform(range(0, (i % 8) + 2), j ->
        |        (anchor * 31 + anchor // (j + 2) + anchor // ((i // 8) + 2) + f * 101 + (i // 8) * 7 + j * 13) % 3 + 1)) % 4
        |      >
        |      list_sum(list_transform(range(0, (i % 8) + 1), j ->
        |        (anchor * 31 + anchor // (j + 2) + anchor // ((i // 8) + 2) + f * 101 + (i // 8) * 7 + j * 13) % 3 + 1)) % 4
        |    THEN '1' ELSE '0' END), '') AS fh FROM fr),
        |seqs AS (SELECT doc_id, list(fh ORDER BY f) AS hs FROM h GROUP BY doc_id),
        |coll AS (SELECT doc_id, list_filter(hs, (x, i) -> i = 1 OR x <> hs[i - 1]) AS cs FROM seqs),
        |v AS (SELECT doc_id, array_to_string(cs, '|') AS vseq, CAST(len(cs) AS BIGINT) AS n_frames FROM coll),
        |cut AS (SELECT max(doc_id) * 4 // 5 + 1 AS c FROM documents),
        |f2 AS (SELECT doc_id, vseq, n_frames,
        |    doc_id >= (SELECT c FROM cut) AS is_d FROM v),
        |nov AS (SELECT CAST(count(*) AS BIGINT) AS novel_occ FROM f2
        |  WHERE is_d AND vseq NOT IN (SELECT vseq FROM f2 WHERE NOT is_d)),
        |tot AS (SELECT CAST(count(*) FILTER (WHERE NOT is_d) AS BIGINT) AS tb,
        |    CAST(count(*) FILTER (WHERE is_d) AS BIGINT) AS td FROM f2),
        |pl AS (SELECT n_frames,
        |    CAST(count(*) FILTER (WHERE NOT is_d) AS BIGINT) AS n_base,
        |    CAST(count(*) FILTER (WHERE is_d) AS BIGINT) AS n_delta
        |  FROM f2 GROUP BY n_frames),
        |panel AS (SELECT n_frames, n_base, n_delta,
        |    abs(CAST(n_delta AS HUGEINT) * tb - CAST(n_base AS HUGEINT) * td) * 20
        |      > CAST(tb AS HUGEINT) * td AS occ_shift,
        |    CASE WHEN td = 0 THEN 0.0
        |         ELSE round(CAST(novel_occ AS DOUBLE) / td, 6) END AS novel_rate,
        |    novel_occ * 2 > td AS novelty_drift
        |  FROM pl, tot, nov)
        |SELECT n_frames, n_base, n_delta, occ_shift, novel_rate,
        |  novelty_drift,
        |  bool_or(occ_shift) OVER () OR novelty_drift AS seq_retrain
        |FROM panel ORDER BY n_frames""".stripMargin,
    // the delta twin: identical sequence recomputation, pairs
    // restricted to the newer-side-in-the-delivery slice
    // (equality-join completeness is per-pair)
    "dedup_video_delta" -> videoDeltaOracle,
    // structural identity: the stream-maintained store is bit-equal
    // to the batch chain (per-item sequences), ONE val gates both
    "stream_video_delta" -> videoDeltaOracle,
    // the truth side re-derives dedup_ngram's pair set at the 0.8 bar,
    // so the oracle ALSO value-checks the emitted jaccard column; the
    // banding contract itself is the literal-TRUE caught column
    "dedup_minhash_recall" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents),
        |sh0 AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS shingle
        |  FROM t WHERE len(toks) >= 3),
        |sh AS (SELECT * FROM sh0 WHERE shingle NOT IN (
        |    SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > 1000)),
        |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |com AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT d1, d2, round(CAST(common AS DOUBLE) / (c1.n_sh + c2.n_sh - common), 6) AS jaccard,
        |  TRUE AS caught
        |FROM com JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id
        |WHERE round(CAST(common AS DOUBLE) / (c1.n_sh + c2.n_sh - common), 6) >= 0.8
        |ORDER BY d1, d2""".stripMargin,
    "dedup_simhash_complete" ->
      "SELECT doc_id, TRUE AS lsh_complete FROM documents ORDER BY doc_id",
    "similarity_lsh_recall" ->
      """SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings
        |WHERE vec_id < 10 ORDER BY query_id""".stripMargin,
    "similarity_ivf_recall" -> "SELECT TRUE AS recall_ok",
    // per-query grain (the lsh key's strength): floor 4/5 measured at
    // the driver's verify SF — see Contracts.ivfRecallPerQuery
    "similarity_ivf_recall_q" ->
      """SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings
        |WHERE vec_id < 10 ORDER BY query_id""".stripMargin,
    // PQ-ADC per-query recall floors (codes + LUT + exact rerank) —
    // Contracts.pqRecallPerQuery
    "similarity_pq_recall_q" ->
      """SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings
        |WHERE vec_id < 10 ORDER BY query_id""".stripMargin,
    // the composed IVFADC path holds the same floors —
    // Contracts.ivfPqRecallPerQuery
    "similarity_ivfpq_recall_q" ->
      """SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings
        |WHERE vec_id < 10 ORDER BY query_id""".stripMargin,
    // the composition served from BOTH incrementally-maintained
    // layers holds the same floors — Contracts.ivfPqDeltaRecallPerQuery
    "similarity_ivfpq_delta_recall_q" ->
      """SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings
        |WHERE vec_id < 10 ORDER BY query_id""".stripMargin,
    // the incrementally-maintained codes hold the same floors —
    // Contracts.pqDeltaRecallPerQuery
    "similarity_pq_delta_recall_q" ->
      """SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings
        |WHERE vec_id < 10 ORDER BY query_id""".stripMargin,
    // the same per-query floors, re-checked over the incrementally-
    // maintained (delta-appended) index — Contracts.ivfDeltaRecallPerQuery
    "similarity_ivf_delta_recall_q" ->
      """SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings
        |WHERE vec_id < 10 ORDER BY query_id""".stripMargin,
    "dedup_embedding_ann_recall" ->
      """SELECT vec_id AS v1, vec_id + 1000000 AS v2, TRUE AS caught
        |FROM embeddings WHERE vec_id < 50 ORDER BY v1""".stripMargin,
    // twins arrive as delivery mass (ids above the cutoff); literal
    // TRUE asserts the delta-vs-index probe caught every one
    "dedup_embedding_ann_delta_recall" ->
      """SELECT vec_id AS v1, vec_id + 1000000 AS v2, TRUE AS caught
        |FROM embeddings WHERE vec_id < 50 ORDER BY v1""".stripMargin,
    // the streamed maintainer under the SAME planted-twin truth: every
    // twin must surface from the stream-maintained persisted store
    "stream_ann_delta_recall" ->
      """SELECT vec_id AS v1, vec_id + 1000000 AS v2, TRUE AS caught
        |FROM embeddings WHERE vec_id < 50 ORDER BY v1""".stripMargin,
    "dedup_semantic_recall" ->
      """SELECT vec_id AS v1, vec_id + 1000000 AS v2, TRUE AS caught
        |FROM embeddings WHERE vec_id < 50 ORDER BY v1""".stripMargin,
    // planted twins land above the delta cutoff by construction
    // (twin id = vec_id + 1000000), so literal TRUE asserts the
    // INCREMENTAL frozen-model path caught every one
    "dedup_semantic_delta_recall" ->
      """SELECT vec_id AS v1, vec_id + 1000000 AS v2, TRUE AS caught
        |FROM embeddings WHERE vec_id < 50 ORDER BY v1""".stripMargin,
    "lookup_code" ->
      "SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice FROM part WHERE p_partkey = 42 ORDER BY p_partkey",
    "search_partial" ->
      "SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice FROM part WHERE lower(p_name) LIKE '%bolt%' ORDER BY p_partkey LIMIT 20",
    "search_partial_regex" ->
      "SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice FROM part WHERE regexp_matches(p_name, '(?i).*b.lt.*') ORDER BY p_partkey LIMIT 20",
    "search_exact" ->
      "SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice FROM part WHERE p_name = 'red widget' ORDER BY p_partkey",
    "upsert_products" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority, delivery FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY delivery DESC) AS rn FROM (
        |    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority, 2 AS delivery FROM orders WHERE o_orderkey % 3 = 0
        |    UNION ALL
        |    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority, 1 AS delivery FROM orders WHERE o_orderkey % 2 = 0)
        |) WHERE rn = 1 ORDER BY o_orderkey""".stripMargin,
    "upsert_set_merge" ->
      """WITH s AS (SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice FROM orders WHERE o_orderkey % 2 = 0),
        |d AS (SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey % 9 = 0 THEN o_orderpriority END AS o_orderpriority,
        |    o_totalprice + 1.0 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 3 = 0)
        |SELECT coalesce(d.o_orderkey, s.o_orderkey) AS o_orderkey,
        |  CASE WHEN d.o_orderkey IS NULL THEN s.o_custkey ELSE coalesce(d.o_custkey, s.o_custkey) END AS o_custkey,
        |  CASE WHEN d.o_orderkey IS NULL THEN s.o_orderpriority ELSE coalesce(d.o_orderpriority, s.o_orderpriority) END AS o_orderpriority,
        |  CASE WHEN d.o_orderkey IS NULL THEN s.o_totalprice ELSE coalesce(d.o_totalprice, s.o_totalprice) END AS o_totalprice
        |FROM d FULL OUTER JOIN s ON d.o_orderkey = s.o_orderkey
        |ORDER BY 1""".stripMargin,
    // upsert_set_merge's exact truth + the replay-evidence literals:
    // the store-served content must equal the one-shot field-level
    // merge (the replayed CoW commit changed nothing), the delivery
    // committed once, the replay no-opped, and the manifest chain is
    // exactly overwrite + one CoW commit
    "ingest_replay_check" ->
      """WITH s AS (SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice FROM orders WHERE o_orderkey % 2 = 0),
        |d AS (SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey % 9 = 0 THEN o_orderpriority END AS o_orderpriority,
        |    o_totalprice + 1.0 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 3 = 0)
        |SELECT coalesce(d.o_orderkey, s.o_orderkey) AS o_orderkey,
        |  CASE WHEN d.o_orderkey IS NULL THEN s.o_custkey ELSE coalesce(d.o_custkey, s.o_custkey) END AS o_custkey,
        |  CASE WHEN d.o_orderkey IS NULL THEN s.o_orderpriority ELSE coalesce(d.o_orderpriority, s.o_orderpriority) END AS o_orderpriority,
        |  CASE WHEN d.o_orderkey IS NULL THEN s.o_totalprice ELSE coalesce(d.o_totalprice, s.o_totalprice) END AS o_totalprice,
        |  TRUE AS first_committed, TRUE AS replay_noop,
        |  CAST(2 AS BIGINT) AS n_commits
        |FROM d FULL OUTER JOIN s ON d.o_orderkey = s.o_orderkey
        |ORDER BY 1""".stripMargin,
    "status_lookup" ->
      """WITH c AS (SELECT user_id AS file_id, CAST(count(*) AS BIGINT) AS total_records,
        |    CAST(count(*) FILTER (WHERE event_type <> 'error') AS BIGINT) AS records_processed,
        |    CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS records_failed,
        |    CASE WHEN count(*) FILTER (WHERE event_type = 'error') > 0 THEN 'processed_with_errors' ELSE 'processed' END AS status
        |  FROM events GROUP BY user_id)
        |SELECT file_id, status, total_records, records_processed, records_failed
        |FROM c WHERE file_id = (SELECT min(file_id) FROM c) ORDER BY file_id""".stripMargin,
    "ingest_e2e_products" ->
      """SELECT * FROM (VALUES
        |  ('0001', 'Oat Milk Deluxe', 'Acme', NULL, 'd2_week2.json'),
        |  ('0002', 'Rye Bread', NULL, NULL, 'd1_week1.json'),
        |  ('0003', 'Green Tea', NULL, '500 g', 'd1_week1.json'),
        |  ('0004', 'Dark Chocolate', 'Choco', NULL, 'd2_week2.json'))
        |AS t(code, product_name, brands, quantity, src_file) ORDER BY code""".stripMargin,
    "ingest_e2e_control" ->
      """SELECT * FROM (VALUES
        |  ('d1_week1.json', 'processed_with_errors', CAST(4 AS BIGINT), CAST(3 AS BIGINT), CAST(1 AS BIGINT)),
        |  ('d2_week2.json', 'processed', CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(0 AS BIGINT)),
        |  ('d3_poison.json', 'failed', CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)))
        |AS t(file_id, status, total_records, records_processed, records_failed) ORDER BY file_id""".stripMargin,
    "ingest_e2e_diff" ->
      """SELECT * FROM (VALUES
        |  ('0001', 'changed'), ('0002', 'unchanged'),
        |  ('0003', 'unchanged'), ('0004', 'added'))
        |AS t(code, change) ORDER BY code""".stripMargin,
    "status_rollup" ->
      """SELECT user_id AS file_id, CAST(count(*) AS BIGINT) AS total_records,
        |  CAST(count(*) FILTER (WHERE event_type <> 'error') AS BIGINT) AS records_processed,
        |  CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS records_failed,
        |  CASE WHEN count(*) FILTER (WHERE event_type = 'error') > 0 THEN 'processed_with_errors' ELSE 'processed' END AS status
        |FROM events GROUP BY user_id ORDER BY file_id""".stripMargin,
    "scan_filter_project" ->
      "SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice FROM lineitem WHERE l_quantity > 45 AND l_discount <= 0.03 ORDER BY l_orderkey, l_linenumber",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(l_discount) AS avg_disc,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "join_broadcast" ->
      "SELECT o_orderkey, c_custkey, c_name, o_totalprice, o_orderdate FROM orders JOIN customer ON o_custkey = c_custkey WHERE c_mktsegment = 'BUILDING' ORDER BY o_orderkey",
    "join_multi" ->
      """SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q5_multi_join_agg" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_lineitems
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "join_semi" ->
      "SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders) ORDER BY c_custkey",
    "join_anti" ->
      "SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders) ORDER BY c_custkey",
    "join_outer_left" ->
      """WITH r AS (SELECT l_orderkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS returned_qty,
        |    CAST(count(*) AS BIGINT) AS n_returned_items
        |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey)
        |SELECT o_orderkey, o_orderstatus, o_totalprice, returned_qty, n_returned_items
        |FROM orders LEFT JOIN r ON o_orderkey = l_orderkey
        |ORDER BY o_orderkey""".stripMargin,
    "join_outer_full" ->
      """WITH u AS (SELECT o_custkey AS ck_u, CAST(count(*) AS BIGINT) AS n_urgent,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS urgent_spend
        |  FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey),
        |l AS (SELECT o_custkey AS ck_l, CAST(count(*) AS BIGINT) AS n_low,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS low_spend
        |  FROM orders WHERE o_orderpriority = '5-LOW' GROUP BY o_custkey)
        |SELECT coalesce(ck_u, ck_l) AS custkey, n_urgent, urgent_spend, n_low, low_spend
        |FROM u FULL OUTER JOIN l ON ck_u = ck_l
        |ORDER BY custkey""".stripMargin,
    "orders_with_exists" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "parts_below_avg_qty" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n_small,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_revenue
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        |  FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    "customers_without_urgent" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "agg_distinct" ->
      """SELECT o_orderpriority, CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "agg_percentile" ->
      """SELECT event_type, round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90, CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "agg_grouping_id" ->
      """SELECT o_orderpriority, o_orderstatus,
        |  CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
        |ORDER BY o_orderpriority ASC NULLS FIRST,
        |  o_orderstatus ASC NULLS FIRST, gid ASC""".stripMargin,
    "set_union_byname" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        |  WHERE o_orderpriority = '1-URGENT'
        |  UNION ALL BY NAME
        |  SELECT o_orderpriority, o_orderkey FROM orders
        |  WHERE o_orderpriority = '5-LOW')
        |ORDER BY o_orderkey""".stripMargin,
    "string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS name_upper,
        |  translate(p_name, 'aeiou', 'AEIOU') AS name_tr,
        |  lpad(p_brand, 12, '*') AS brand_pad,
        |  split_part(p_type, ' ', 1) AS type_head,
        |  substring(p_name, 1, 8) AS name_sub,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  reverse(p_name) AS name_rev,
        |  CAST(length(p_name) AS BIGINT) AS name_len
        |FROM part ORDER BY p_partkey""".stripMargin,
    "agg_rollup" ->
      """SELECT n_name, c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name, c_mktsegment)
        |ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin,
    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT n_name, c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
        |ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin,
    "window_ntile" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(ntile(4) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS quartile
        |FROM orders ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "agg_pivot" ->
      """SELECT c_mktsegment,
        |  CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
        |  CAST(count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS BIGINT) AS n_high,
        |  CAST(count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS BIGINT) AS n_medium,
        |  CAST(count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS n_notspec,
        |  CAST(count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT) AS n_low
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "window_topk" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
        |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "window_topk_agg" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
        |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "window_running" ->
      """SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "window_lag" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(date_diff('day', lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC), o_orderdate) AS BIGINT) AS days_since_prev
        |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "sort_limit" ->
      "SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50",
    "set_union" ->
      """SELECT DISTINCT custkey FROM (
        |  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  UNION ALL SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |ORDER BY custkey""".stripMargin,
    "set_except" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |EXCEPT SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY custkey""".stripMargin,
    "set_intersect" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY custkey""".stripMargin,
    "set_except_all" ->
      """SELECT partkey FROM (
        |  SELECT l_partkey AS partkey FROM lineitem WHERE l_returnflag = 'R'
        |  EXCEPT ALL SELECT l_partkey AS partkey FROM lineitem WHERE l_linestatus = 'F')
        |ORDER BY partkey""".stripMargin,
    "set_intersect_all" ->
      """SELECT partkey FROM (
        |  SELECT l_partkey AS partkey FROM lineitem WHERE l_returnflag = 'R'
        |  INTERSECT ALL SELECT l_partkey AS partkey FROM lineitem WHERE l_linestatus = 'F')
        |ORDER BY partkey""".stripMargin,
    "join_nullsafe" ->
      """WITH keyed AS (
        |  SELECT nullif(o_orderpriority, '3-MEDIUM') AS pri, o_totalprice FROM orders),
        |dim AS (
        |  SELECT pri, coalesce(pri, '(unprioritized)') AS label FROM (
        |    SELECT DISTINCT nullif(o_orderpriority, '3-MEDIUM') AS pri FROM orders))
        |SELECT label, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM keyed JOIN dim ON keyed.pri IS NOT DISTINCT FROM dim.pri
        |GROUP BY label ORDER BY label""".stripMargin,
    "agg_minmax_by" ->
      """WITH r AS (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
        |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
        |  FROM orders)
        |SELECT o_orderpriority,
        |  max(CASE WHEN rmax = 1 THEN o_orderkey END) AS top_orderkey,
        |  max(CASE WHEN rmax = 1 THEN o_totalprice END) AS top_price,
        |  max(CASE WHEN rmin = 1 THEN o_orderkey END) AS bottom_orderkey,
        |  max(CASE WHEN rmin = 1 THEN o_totalprice END) AS bottom_price,
        |  count(*) AS n_orders
        |FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "agg_corr" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
        |  round((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 9) AS corr_qty_price
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "agg_mode" ->
      """WITH c AS (
        |  SELECT c_mktsegment, c_nationkey, count(*) AS cnt
        |  FROM customer GROUP BY 1, 2),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY c_mktsegment ORDER BY cnt DESC, c_nationkey DESC) AS rn
        |  FROM c)
        |SELECT c_mktsegment,
        |  max(CASE WHEN rn = 1 THEN c_nationkey END) AS modal_nationkey,
        |  max(CASE WHEN rn = 1 THEN cnt END) AS modal_count,
        |  CAST(sum(cnt) AS BIGINT) AS n_customers
        |FROM r GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "window_first_last" ->
      """SELECT DISTINCT o_custkey,
        |  first_value(o_orderkey) OVER w AS first_orderkey,
        |  last_value(o_orderkey) OVER w AS last_orderkey,
        |  nth_value(o_orderkey, 2) OVER w AS second_orderkey
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey""".stripMargin,
    "array_funcs" ->
      """SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_toks,
        |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
        |  list_contains(toks, 'the') AS has_the,
        |  CAST(coalesce(list_position(toks, 'the'), 0) AS BIGINT) AS first_the,
        |  toks[-1] AS last_tok,
        |  array_to_string(toks[1:3], '_') AS first3
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "higher_order_funcs" ->
      """SELECT doc_id,
        |  CAST(list_aggregate(list_transform(toks, x -> len(x)), 'sum') AS BIGINT) AS sum_tok_len,
        |  CAST(len(list_filter(toks, x -> len(x) > 4)) AS BIGINT) AS n_long,
        |  len(list_filter(toks, x -> x = 'the')) > 0 AS has_the,
        |  len(list_filter(toks, x -> len(x) >= 30)) = 0 AS all_short,
        |  CAST(len(list_filter(range(1, len(toks)), i -> toks[i] = toks[i+1])) AS BIGINT) AS n_adj_repeat
        |FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "map_funcs" ->
      """SELECT p_partkey,
        |  m['brand'][1] AS brand_val,
        |  CAST(cardinality(m) AS BIGINT) AS m_size,
        |  array_to_string(map_keys(m), ',') AS keys_csv,
        |  array_to_string(map_values(m), ',') AS vals_csv,
        |  map_concat(m, MAP(['size'], [CAST(p_size AS VARCHAR)]))['size'][1] AS size_val
        |FROM (SELECT p_partkey, p_size, MAP(['brand','type'], [p_brand, p_type]) AS m FROM part)
        |ORDER BY p_partkey""".stripMargin,
    "regexp_funcs" ->
      """SELECT p_partkey,
        |  regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        |  regexp_extract(p_name, '(\d+)', 1) AS first_num,
        |  array_to_string(regexp_extract_all(p_name, '([aeiou]+)', 1), ',') AS vowel_runs,
        |  CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT) AS n_vowels,
        |  regexp_matches(p_name, '^[a-z]') AS starts_lower,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS masked
        |FROM part ORDER BY p_partkey""".stripMargin,
    "try_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_extendedprice AS DOUBLE) / NULLIF(CAST(l_discount AS DOUBLE), 0) AS price_per_disc,
        |  l_partkey / NULLIF(l_orderkey % 3, 0) AS part_per_mod,
        |  TRY_CAST(l_returnflag AS BIGINT) AS flag_num,
        |  CASE WHEN l_orderkey > 0 THEN NULL
        |       ELSE 9223372036854775807 END AS overflowed,
        |  [l_returnflag, l_linestatus][5] AS fifth_elem,
        |  TRY_CAST(l_returnflag AS TIMESTAMP) AS flag_ts,
        |  TRY_CAST('1995-01-' || lpad(CAST(l_linenumber * 5 AS VARCHAR), 2, '0') AS TIMESTAMP) AS good_ts
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "date_arith_funcs" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
        |  CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_epoch95,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
        |  CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus3m,
        |  strftime(o_orderdate, '%Y-%m') AS ym
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q3_top_orders" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1995-03-15' AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,
    "events_anomaly" ->
      """WITH d AS (SELECT event_type,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
        |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |m AS (SELECT *, sum(n) OVER w AS s, sum(n*n) OVER w AS ss,
        |    count(*) OVER w AS cnt FROM d WINDOW w AS (PARTITION BY event_type)),
        |z AS (SELECT event_type, day, n,
        |    round((n - CAST(s AS DOUBLE)/cnt)
        |      / sqrt((ss - CAST(s*s AS DOUBLE)/cnt) / (cnt - 1)), 6) AS zscore
        |  FROM m)
        |SELECT event_type, day, n, zscore, abs(zscore) > 2.0 AS is_anomaly
        |FROM z ORDER BY event_type, day""".stripMargin,
    "variant_funcs" ->
      """SELECT event_id, event_type,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        |  CAST(json_extract_string(props, '$.missing') AS BIGINT) AS missing_val
        |FROM events ORDER BY event_id""".stripMargin,
    "variant_safe" ->
      """SELECT event_id,
        |  TRY_CAST(substring(props, 1, length(props) - 2) AS JSON) IS NOT NULL AS bad_parsed,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,
    "stream_ivj_inner" ->
      """WITH p AS (SELECT user_id, event_id AS purchase_id, CAST(ts AS TIMESTAMP) AS ts, value AS purchase_value FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id AS v_user, event_id AS view_id, CAST(ts AS TIMESTAMP) AS view_ts, value AS view_value FROM events WHERE event_type = 'view')
        |SELECT p.user_id, p.purchase_id, p.ts, p.purchase_value, v.view_id, v.view_ts, v.view_value
        |FROM p JOIN v ON p.user_id = v.v_user AND v.view_ts > p.ts - INTERVAL 30 MINUTE AND v.view_ts <= p.ts
        |ORDER BY p.purchase_id, v.view_id""".stripMargin,
    "stream_ivj_left" ->
      """WITH p AS (SELECT user_id, event_id AS purchase_id, CAST(ts AS TIMESTAMP) AS ts, value AS purchase_value FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id AS v_user, event_id AS view_id, CAST(ts AS TIMESTAMP) AS view_ts, value AS view_value FROM events WHERE event_type = 'view')
        |SELECT p.user_id, p.purchase_id, p.ts, p.purchase_value, v.view_id, v.view_ts, v.view_value
        |FROM p LEFT JOIN v ON p.user_id = v.v_user AND v.view_ts > p.ts - INTERVAL 30 MINUTE AND v.view_ts <= p.ts
        |ORDER BY p.purchase_id, v.view_id NULLS FIRST""".stripMargin,
    "stream_tws_totals" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(round(value * 100, 0)) AS BIGINT) AS total_cents
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // exactly-once restoration: a full byte-identical re-delivery in a
    // second micro-batch must be absorbed, so the output IS the table
    "stream_dedup_drive" ->
      """SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value
        |FROM events ORDER BY event_id""".stripMargin,
    // hour windows align to epoch in both engines; tiebreak mirrors the
    // bounded-heap aggregate's contract (score desc, id asc)
    // online minhash dedup: the streaming machine's union-over-buckets
    // pair set equals the batch operator's, so the oracle is the full
    // exact-Jaccard >= 0.8 sweep (dedup_cluster_minhash's
    // banding-completeness license at the 0.8 bar)
    "stream_dedup_minhash" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS shingle
        |  FROM t WHERE len(toks) >= 3),
        |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |com AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT d1, d2,
        |  round(CAST(common AS DOUBLE) / (c1.n_sh + c2.n_sh - common), 6) AS jaccard
        |FROM com JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id
        |WHERE round(CAST(common AS DOUBLE) / (c1.n_sh + c2.n_sh - common), 6) >= 0.8
        |ORDER BY d1, d2""".stripMargin,
    // per-window MG completeness: exact heavy hitters re-derived by
    // the oracle, caught pinned literal TRUE (the MG theorem, per
    // window group — state-store codec corruption flips the hash)
    "stream_heavy_hitters" ->
      """WITH s AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
        |    'z' || CAST(32 // r AS VARCHAR) AS item
        |  FROM events CROSS JOIN range(1, 33) t(r)),
        |f AS (SELECT window_start, item, count(*) AS c FROM s GROUP BY 1, 2),
        |t AS (SELECT window_start, sum(c) AS n FROM f GROUP BY 1)
        |SELECT f.window_start, item, CAST(c AS BIGINT) AS exact_cnt, TRUE AS caught
        |FROM f JOIN t USING (window_start) WHERE 9 * c > n
        |ORDER BY window_start, item""".stripMargin,
    "stream_topk_window" ->
      """WITH w AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start, event_id, value FROM events),
        |r AS (SELECT window_start, event_id, value,
        |    CAST(row_number() OVER (PARTITION BY window_start ORDER BY value DESC, event_id ASC) AS BIGINT) AS rn FROM w)
        |SELECT window_start, rn, event_id, value FROM r WHERE rn <= 3
        |ORDER BY window_start, rn""".stripMargin,
    "stream_ivj_full" ->
      """WITH p AS (SELECT user_id, event_id AS purchase_id, CAST(ts AS TIMESTAMP) AS ts, value AS purchase_value FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id AS v_user, event_id AS view_id, CAST(ts AS TIMESTAMP) AS view_ts, value AS view_value FROM events WHERE event_type = 'view')
        |SELECT p.user_id, p.purchase_id, p.ts, p.purchase_value, v.v_user AS view_user, v.view_id, v.view_ts, v.view_value
        |FROM p FULL JOIN v ON p.user_id = v.v_user AND v.view_ts > p.ts - INTERVAL 30 MINUTE AND v.view_ts <= p.ts
        |ORDER BY p.purchase_id NULLS FIRST, v.view_id NULLS FIRST""".stripMargin,
    "join_asof" ->
      """WITH p AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value AS purchase_value FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(value) AS view_value FROM events WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT p.user_id, p.event_id, p.ts, p.purchase_value, v.ts AS view_ts, v.view_value
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY p.user_id, p.event_id""".stripMargin,
    // the forward direction: native ASOF with the inequality flipped
    "join_asof_forward" ->
      """WITH p AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value AS purchase_value FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(value) AS view_value FROM events WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT p.user_id, p.event_id, p.ts, p.purchase_value, v.ts AS view_ts, v.view_value
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts <= v.ts
        |ORDER BY p.user_id, p.event_id""".stripMargin,
    // merge_asof tolerance: discard matches staler than 60 minutes
    "join_asof_tolerance" ->
      """WITH p AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value AS purchase_value FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(value) AS view_value FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |j AS (SELECT p.user_id, p.event_id, p.ts, p.purchase_value, v.ts AS view_ts, v.view_value
        |  FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts)
        |SELECT user_id, event_id, ts, purchase_value,
        |  CASE WHEN view_ts IS NOT NULL AND epoch_us(ts) - epoch_us(view_ts) <= 3600000000 THEN view_ts END AS view_ts,
        |  CASE WHEN view_ts IS NOT NULL AND epoch_us(ts) - epoch_us(view_ts) <= 3600000000 THEN view_value END AS view_value
        |FROM j ORDER BY user_id, event_id""".stripMargin,
    "join_interval" ->
      """WITH p AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value AS purchase_value FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events WHERE event_type = 'view')
        |SELECT p.user_id, p.event_id, p.ts, p.purchase_value,
        |  CAST(count(v.ts) AS BIGINT) AS n_prior_views,
        |  CAST(max(CAST(v.value AS DECIMAL(18,2))) AS DOUBLE) AS max_view_value
        |FROM p LEFT JOIN v ON p.user_id = v.user_id
        |  AND v.ts > p.ts - INTERVAL 30 MINUTE AND v.ts <= p.ts
        |GROUP BY p.user_id, p.event_id, p.ts, p.purchase_value
        |ORDER BY p.user_id, p.event_id""".stripMargin,
    "join_bucketed" ->
      """SELECT o_orderstatus,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(count(*) AS BIGINT) AS n_lineitems
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // bloom semi-join reduction: the oracle is the PLAIN join — bloom
    // filters have no false negatives and the exact join drops false
    // positives, so the reduced plan must be row-identical
    "join_bloom_reduced" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_lineitems,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // fuzzy join: the oracle states the UNBLOCKED truth (full
    // levenshtein predicate over probes × part), so the hash gate
    // proves the deletion-neighborhood blocking's completeness
    // end-to-end;
    // verification-scale cross join on the oracle side only
    "join_fuzzy" ->
      """WITH probes AS (SELECT p_partkey AS probe_id,
        |    concat(substring(p_name, 1, 2), substring(p_name, 4)) AS probe_name
        |  FROM part WHERE p_partkey % 50 = 0),
        |m AS (SELECT probe_id, probe_name, p_partkey, p_name,
        |    CAST(levenshtein(probe_name, p_name) AS BIGINT) AS dist
        |  FROM probes CROSS JOIN part
        |  WHERE levenshtein(probe_name, p_name) <= 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
        |    ORDER BY dist, p_partkey) AS rn FROM m)
        |SELECT probe_id, probe_name, p_partkey AS match_key,
        |  p_name AS match_name, dist
        |FROM r WHERE rn = 1 ORDER BY probe_id""".stripMargin,
    // the delta form: the SAME unblocked truth restricted to probes
    // derived from the delivery slice (p_partkey >= the 4/5 cutoff) —
    // the engine side serves the reference from the persisted
    // signature index, so the hash gate proves the index content AND
    // the blocking completeness end-to-end
    "join_fuzzy_delta" -> fuzzyDeltaOracle,
    // identical output contract: the streamed maintainer's store is
    // bit-equal to the batch-built index (per-string signatures), so
    // the SAME exact SQL gates it — one val, structurally identical
    "stream_fuzzy_delta" -> fuzzyDeltaOracle,
    // the full store lifecycle (N-delivery chain + compact + replay)
    // is content-preserving by the same per-string argument, so the
    // same exact oracle gates the compaction and the replayed no-op
    "fuzzy_compact_check" -> fuzzyDeltaOracle,
    "sample_hash" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority FROM orders
        |WHERE md5(CAST(o_orderkey AS VARCHAR)) < '1a' ORDER BY o_orderkey""".stripMargin,
    "sample_stratified" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority, rn FROM (
        |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority,
        |    CAST(row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY md5(CAST(o_orderkey AS VARCHAR)) ASC, o_orderkey ASC) AS BIGINT) AS rn
        |  FROM orders) WHERE rn <= 100 ORDER BY o_orderpriority, rn""".stripMargin,
    "sample_mixture" ->
      """WITH t AS (SELECT doc_id, source,
        |    CASE CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) % 4
        |      WHEN 0 THEN '0d' WHEN 1 THEN '26' WHEN 2 THEN '59'
        |      ELSE 'c0' END AS mix_threshold
        |  FROM documents)
        |SELECT doc_id, source, mix_threshold FROM t
        |WHERE md5(CAST(doc_id AS VARCHAR)) < mix_threshold
        |ORDER BY doc_id""".stripMargin,
    // the data-recipe planning panel: same weight groups as
    // sample_mixture's thresholds, all-BIGINT floor arithmetic
    "mix_budget_plan" ->
      """WITH d AS (SELECT source,
        |    len(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS n
        |  FROM documents),
        |s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n) AS BIGINT) AS n_tokens,
        |    CAST(CASE CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) % 4
        |      WHEN 0 THEN 5 WHEN 1 THEN 15 WHEN 2 THEN 35
        |      ELSE 75 END AS BIGINT) AS weight
        |  FROM d GROUP BY source),
        |t AS (SELECT CAST(sum(weight) AS BIGINT) AS w_total FROM s)
        |SELECT source, n_docs, n_tokens, weight,
        |  CAST(100000 * weight // w_total AS BIGINT) AS target_tokens,
        |  CAST(CASE WHEN n_tokens = 0 THEN NULL
        |    ELSE (100000 * weight // w_total) * 1000 // n_tokens
        |    END AS BIGINT) AS epochs_x1000,
        |  (100000 * weight // w_total) > n_tokens AS oversubscribed
        |FROM s, t ORDER BY source""".stripMargin,
    // DSIR twin: identical md5-prefix bucketing, add-one-smoothed
    // log-ratios, and the sorted-list sequential fold (list_reduce over
    // a 0.0-prepended sorted list == Spark's aggregate over sort_array)
    "sample_importance" ->
      """WITH occ AS (
        |  SELECT doc_id, CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) % 64 AS bucket
        |  FROM (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS token
        |        FROM documents)),
        |counts AS (
        |  SELECT bucket,
        |    sum(CASE WHEN doc_id % 50 = 0 THEN 1 ELSE 0 END) AS ct,
        |    sum(CASE WHEN doc_id % 50 <> 0 THEN 1 ELSE 0 END) AS cp
        |  FROM occ GROUP BY bucket),
        |tot AS (SELECT sum(ct) AS t, sum(cp) AS p FROM counts),
        |lr AS (SELECT bucket,
        |    ln(CAST(ct + 1 AS DOUBLE) / CAST(t + 64 AS DOUBLE)) -
        |    ln(CAST(cp + 1 AS DOUBLE) / CAST(p + 64 AS DOUBLE)) AS lr
        |  FROM counts, tot),
        |agg AS (
        |  SELECT o.doc_id, list_sort(list(l.lr)) AS lrs
        |  FROM occ o JOIN lr l USING (bucket) WHERE o.doc_id % 50 <> 0
        |  GROUP BY o.doc_id)
        |SELECT doc_id, CAST(len(lrs) AS BIGINT) AS n_tokens,
        |  round(w, 4) AS logw, round(w / len(lrs), 4) AS avg_lr,
        |  round(w / len(lrs), 4) >= -0.09 AS keep
        |FROM (SELECT doc_id, lrs,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), lrs), (a, x) -> a + x) AS w
        |  FROM agg) ORDER BY doc_id""".stripMargin,
    // Misra-Gries completeness: the oracle re-derives the exact heavy
    // hitters of the deterministic ramp stream (pure integer compare,
    // 9c > n) and asserts caught literally TRUE — the MG theorem
    // guarantees the Spark sketch retained each one, so any guarantee
    // break (bad decrement, bad merge) flips the boolean and the hash
    "agg_heavy_hitters" ->
      """WITH s AS (SELECT doc_id, 'z' || CAST(64 // r AS VARCHAR) AS item
        |  FROM documents CROSS JOIN range(1, 65) t(r)),
        |f AS (SELECT item, count(*) AS c FROM s GROUP BY item),
        |tot AS (SELECT sum(c) AS n FROM f)
        |SELECT item, CAST(c AS BIGINT) AS exact_cnt, TRUE AS caught
        |FROM f, tot WHERE 9 * c > n ORDER BY item""".stripMargin,
    // Count-Min bounds: the oracle re-derives the exact counts of the
    // same fixed stream; the two guarantee flags are checked in-engine
    // (counters only increase; est within ceil(eps*n)) and literal
    // TRUE here — the agg_heavy_hitters pattern
    "agg_countmin_bound" ->
      """WITH s AS (SELECT doc_id, 'z' || CAST(64 // r AS VARCHAR) AS item
        |  FROM documents CROSS JOIN range(1, 65) t(r)),
        |f AS (SELECT item, count(*) AS c FROM s GROUP BY item)
        |SELECT item, CAST(c AS BIGINT) AS exact_cnt,
        |  TRUE AS overcount_only, TRUE AS within_eps
        |FROM f ORDER BY item""".stripMargin,
    // HLL union rollup: the oracle re-derives the exact distinct side
    // and the merged-sketch count; the ±5% union-estimate bound is
    // checked in-engine and literal TRUE here (the agg_countmin_bound
    // pattern — register arrays are library-internal, the guarantee is
    // the contract surface)
    "agg_hll_union_bound" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
        |  TRUE AS within_5pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // one-scan table profile: typed min/max rendered post-aggregation
    // (timestamps through the shared second-grain UTC format), widths
    // from exact integer sums
    // per-column delivery-over-delivery drift flags: yearly
    // deliveries of orders; integer cross-multiplied null-rate
    // shift, typed range-envelope escape, 2x cardinality jump
    "profile_drift" -> profileDriftOracleSql,
    // the retrain gauge recomputed in exact column algebra: 16
    // sign-quadrant cells on dims 1-4, frozen centroid = base per-cell
    // mean, occupancy flag by BIGINT cross-multiplication, distance
    // flag on 4-decimal-rounded mean squared distances
    "index_drift_check" ->
      """WITH cut AS (SELECT max(vec_id) * 4 // 5 + 1 AS c FROM embeddings),
        |e AS (SELECT vec_id, vec_id >= (SELECT c FROM cut) AS is_delta,
        |    CAST(CASE WHEN embedding[1] > 0 THEN 8 ELSE 0 END
        |  + CASE WHEN embedding[2] > 0 THEN 4 ELSE 0 END
        |  + CASE WHEN embedding[3] > 0 THEN 2 ELSE 0 END
        |  + CASE WHEN embedding[4] > 0 THEN 1 ELSE 0 END AS BIGINT) AS cell,
        |    CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |dims AS (SELECT vec_id, is_delta, cell, r.d AS d, v[r.d + 1] AS val
        |  FROM e, LATERAL (SELECT unnest(range(0, len(v))) AS d) r),
        |cent AS (SELECT cell, d, avg(val) AS m FROM dims WHERE NOT is_delta GROUP BY cell, d),
        |sq AS (SELECT vec_id, dims.cell AS cell, is_delta,
        |    sum((val - m) * (val - m)) AS sq
        |  FROM dims LEFT JOIN cent ON dims.cell = cent.cell AND dims.d = cent.d
        |  GROUP BY vec_id, dims.cell, is_delta),
        |stats AS (SELECT cell,
        |    count(*) FILTER (WHERE NOT is_delta) AS n_base,
        |    count(*) FILTER (WHERE is_delta) AS n_delta,
        |    avg(sq) FILTER (WHERE NOT is_delta) AS mb,
        |    avg(sq) FILTER (WHERE is_delta) AS md
        |  FROM sq GROUP BY cell),
        |tot AS (SELECT cell, n_base, n_delta,
        |    round(mb, 4) AS msd_base, round(md, 4) AS msd_delta,
        |    CAST(sum(n_base) OVER () AS BIGINT) AS tb,
        |    CAST(sum(n_delta) OVER () AS BIGINT) AS td FROM stats),
        |fl AS (SELECT cell, n_base, n_delta, msd_base, msd_delta,
        |    abs(CAST(n_delta AS HUGEINT) * tb - CAST(n_base AS HUGEINT) * td) * 20
        |      > CAST(tb AS HUGEINT) * td AS occ_shift,
        |    CASE WHEN n_base = 0 THEN n_delta > 0
        |         WHEN n_delta = 0 THEN FALSE
        |         ELSE msd_delta * 2 > msd_base * 3 END AS dist_drift
        |  FROM tot),
        |nr AS (SELECT *, occ_shift OR dist_drift AS needs_retrain FROM fl)
        |SELECT cell, n_base, n_delta, msd_base, msd_delta, occ_shift,
        |  dist_drift, needs_retrain,
        |  bool_or(needs_retrain) OVER () AS index_retrain
        |FROM nr ORDER BY cell""".stripMargin,
    // the retrain loop closed: the PRE gauge decides (same formulas as
    // index_drift_check), the action is applied by masking is_delta
    // (retrain resets the chain: every row becomes base, the delta is
    // empty), and the POST panel is re-gauged over the masked split
    "index_retrain_apply" ->
      """WITH cut AS (SELECT max(vec_id) * 4 // 5 + 1 AS c FROM embeddings),
        |e0 AS (SELECT vec_id, vec_id >= (SELECT c FROM cut) AS is_d,
        |    CAST(CASE WHEN embedding[1] > 0 THEN 8 ELSE 0 END
        |  + CASE WHEN embedding[2] > 0 THEN 4 ELSE 0 END
        |  + CASE WHEN embedding[3] > 0 THEN 2 ELSE 0 END
        |  + CASE WHEN embedding[4] > 0 THEN 1 ELSE 0 END AS BIGINT) AS cell,
        |    CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |p_dims AS (SELECT vec_id, is_d, cell, r.d AS d, v[r.d + 1] AS val
        |  FROM e0, LATERAL (SELECT unnest(range(0, len(v))) AS d) r),
        |p_cent AS (SELECT cell, d, avg(val) AS m FROM p_dims WHERE NOT is_d GROUP BY cell, d),
        |p_sq AS (SELECT vec_id, p_dims.cell AS cell, is_d,
        |    sum((val - m) * (val - m)) AS sq
        |  FROM p_dims LEFT JOIN p_cent ON p_dims.cell = p_cent.cell AND p_dims.d = p_cent.d
        |  GROUP BY vec_id, p_dims.cell, is_d),
        |p_stats AS (SELECT cell,
        |    count(*) FILTER (WHERE NOT is_d) AS n_base,
        |    count(*) FILTER (WHERE is_d) AS n_delta,
        |    avg(sq) FILTER (WHERE NOT is_d) AS mb,
        |    avg(sq) FILTER (WHERE is_d) AS md
        |  FROM p_sq GROUP BY cell),
        |p_tot AS (SELECT n_base, n_delta,
        |    round(mb, 4) AS msd_base, round(md, 4) AS msd_delta,
        |    CAST(sum(n_base) OVER () AS BIGINT) AS tb,
        |    CAST(sum(n_delta) OVER () AS BIGINT) AS td FROM p_stats),
        |dec AS (SELECT coalesce(bool_or(
        |    abs(CAST(n_delta AS HUGEINT) * tb - CAST(n_base AS HUGEINT) * td) * 20
        |      > CAST(tb AS HUGEINT) * td
        |    OR CASE WHEN n_base = 0 THEN n_delta > 0
        |            WHEN n_delta = 0 THEN FALSE
        |            ELSE msd_delta * 2 > msd_base * 3 END), FALSE) AS r
        |  FROM p_tot),
        |e AS (SELECT vec_id, is_d AND NOT (SELECT r FROM dec) AS is_delta,
        |    cell, v FROM e0),
        |dims AS (SELECT vec_id, is_delta, cell, r.d AS d, v[r.d + 1] AS val
        |  FROM e, LATERAL (SELECT unnest(range(0, len(v))) AS d) r),
        |cent AS (SELECT cell, d, avg(val) AS m FROM dims WHERE NOT is_delta GROUP BY cell, d),
        |sq AS (SELECT vec_id, dims.cell AS cell, is_delta,
        |    sum((val - m) * (val - m)) AS sq
        |  FROM dims LEFT JOIN cent ON dims.cell = cent.cell AND dims.d = cent.d
        |  GROUP BY vec_id, dims.cell, is_delta),
        |stats AS (SELECT cell,
        |    count(*) FILTER (WHERE NOT is_delta) AS n_base,
        |    count(*) FILTER (WHERE is_delta) AS n_delta,
        |    avg(sq) FILTER (WHERE NOT is_delta) AS mb,
        |    avg(sq) FILTER (WHERE is_delta) AS md
        |  FROM sq GROUP BY cell),
        |tot AS (SELECT cell, n_base, n_delta,
        |    round(mb, 4) AS msd_base, round(md, 4) AS msd_delta,
        |    CAST(sum(n_base) OVER () AS BIGINT) AS tb,
        |    CAST(sum(n_delta) OVER () AS BIGINT) AS td FROM stats),
        |fl AS (SELECT cell, n_base, n_delta, msd_base, msd_delta,
        |    abs(CAST(n_delta AS HUGEINT) * tb - CAST(n_base AS HUGEINT) * td) * 20
        |      > CAST(tb AS HUGEINT) * td AS occ_shift,
        |    CASE WHEN n_base = 0 THEN n_delta > 0
        |         WHEN n_delta = 0 THEN FALSE
        |         ELSE msd_delta * 2 > msd_base * 3 END AS dist_drift
        |  FROM tot),
        |nr AS (SELECT *, occ_shift OR dist_drift AS needs_retrain FROM fl)
        |SELECT cell, n_base, n_delta, msd_base, msd_delta, occ_shift,
        |  dist_drift, needs_retrain,
        |  bool_or(needs_retrain) OVER () AS index_retrain,
        |  (SELECT r FROM dec) AS retrained
        |FROM nr ORDER BY cell""".stripMargin,
    // the PQ-codebook gauge: index_drift_check's algebra at
    // (subspace, cell) grain — 16 subspaces of 4 dims, sign-quadrant
    // cells per subspace, occupancy shares normalized WITHIN each
    // subspace (per-sub window)
    "pq_drift_check" ->
      """WITH cut AS (SELECT max(vec_id) * 4 // 5 + 1 AS c FROM embeddings),
        |e AS (SELECT vec_id, vec_id >= (SELECT c FROM cut) AS is_delta,
        |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |dims AS (SELECT vec_id, is_delta, r.d AS d, v[r.d + 1] AS val,
        |    CAST(r.d // 4 AS BIGINT) AS sub
        |  FROM e, LATERAL (SELECT unnest(range(0, len(v))) AS d) r),
        |cells AS (SELECT vec_id, sub,
        |    CAST(sum(CASE WHEN val > 0 THEN
        |      CASE d % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END
        |      ELSE 0 END) AS BIGINT) AS cell
        |  FROM dims GROUP BY vec_id, sub),
        |dc AS (SELECT dims.vec_id, dims.is_delta, dims.sub, cells.cell,
        |    dims.d, dims.val
        |  FROM dims JOIN cells ON dims.vec_id = cells.vec_id AND dims.sub = cells.sub),
        |cent AS (SELECT sub, cell, d, avg(val) AS m FROM dc WHERE NOT is_delta GROUP BY sub, cell, d),
        |sq AS (SELECT dc.vec_id, dc.sub AS sub, dc.cell AS cell, is_delta,
        |    sum((val - m) * (val - m)) AS sq
        |  FROM dc LEFT JOIN cent ON dc.sub = cent.sub AND dc.cell = cent.cell AND dc.d = cent.d
        |  GROUP BY dc.vec_id, dc.sub, dc.cell, is_delta),
        |stats AS (SELECT sub, cell,
        |    count(*) FILTER (WHERE NOT is_delta) AS n_base,
        |    count(*) FILTER (WHERE is_delta) AS n_delta,
        |    avg(sq) FILTER (WHERE NOT is_delta) AS mb,
        |    avg(sq) FILTER (WHERE is_delta) AS md
        |  FROM sq GROUP BY sub, cell),
        |tot AS (SELECT sub, cell, n_base, n_delta,
        |    round(mb, 4) AS msd_base, round(md, 4) AS msd_delta,
        |    CAST(sum(n_base) OVER (PARTITION BY sub) AS BIGINT) AS tb,
        |    CAST(sum(n_delta) OVER (PARTITION BY sub) AS BIGINT) AS td FROM stats),
        |fl AS (SELECT sub, cell, n_base, n_delta, msd_base, msd_delta,
        |    abs(CAST(n_delta AS HUGEINT) * tb - CAST(n_base AS HUGEINT) * td) * 20
        |      > CAST(tb AS HUGEINT) * td AS occ_shift,
        |    CASE WHEN n_base = 0 THEN n_delta >= 16
        |         WHEN n_delta < 16 OR n_base < 16 THEN FALSE
        |         ELSE msd_delta * 2 > msd_base * 3 END AS dist_drift
        |  FROM tot),
        |nr AS (SELECT *, occ_shift OR dist_drift AS needs_retrain FROM fl)
        |SELECT sub, cell, n_base, n_delta, msd_base, msd_delta, occ_shift,
        |  dist_drift, needs_retrain,
        |  bool_or(needs_retrain) OVER () AS pq_retrain
        |FROM nr ORDER BY sub, cell""".stripMargin,
    // the PQ retrain loop closed: pre-gauge decides, the action masks
    // is_delta (chain reset), the post panel is re-gauged — the
    // index_retrain_apply recomputation shape at (sub, cell) grain
    "pq_retrain_apply" ->
      """WITH cut AS (SELECT max(vec_id) * 4 // 5 + 1 AS c FROM embeddings),
        |e0 AS (SELECT vec_id, vec_id >= (SELECT c FROM cut) AS is_d,
        |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |p_dims AS (SELECT vec_id, is_d, r.d AS d, v[r.d + 1] AS val,
        |    CAST(r.d // 4 AS BIGINT) AS sub
        |  FROM e0, LATERAL (SELECT unnest(range(0, len(v))) AS d) r),
        |p_cells AS (SELECT vec_id, sub,
        |    CAST(sum(CASE WHEN val > 0 THEN
        |      CASE d % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END
        |      ELSE 0 END) AS BIGINT) AS cell
        |  FROM p_dims GROUP BY vec_id, sub),
        |p_dc AS (SELECT p_dims.vec_id, p_dims.is_d, p_dims.sub,
        |    p_cells.cell, p_dims.d, p_dims.val
        |  FROM p_dims JOIN p_cells ON p_dims.vec_id = p_cells.vec_id AND p_dims.sub = p_cells.sub),
        |p_cent AS (SELECT sub, cell, d, avg(val) AS m FROM p_dc WHERE NOT is_d GROUP BY sub, cell, d),
        |p_sq AS (SELECT p_dc.vec_id, p_dc.sub AS sub, p_dc.cell AS cell, is_d,
        |    sum((val - m) * (val - m)) AS sq
        |  FROM p_dc LEFT JOIN p_cent ON p_dc.sub = p_cent.sub AND p_dc.cell = p_cent.cell AND p_dc.d = p_cent.d
        |  GROUP BY p_dc.vec_id, p_dc.sub, p_dc.cell, is_d),
        |p_stats AS (SELECT sub, cell,
        |    count(*) FILTER (WHERE NOT is_d) AS n_base,
        |    count(*) FILTER (WHERE is_d) AS n_delta,
        |    avg(sq) FILTER (WHERE NOT is_d) AS mb,
        |    avg(sq) FILTER (WHERE is_d) AS md
        |  FROM p_sq GROUP BY sub, cell),
        |p_tot AS (SELECT n_base, n_delta,
        |    round(mb, 4) AS msd_base, round(md, 4) AS msd_delta,
        |    CAST(sum(n_base) OVER (PARTITION BY sub) AS BIGINT) AS tb,
        |    CAST(sum(n_delta) OVER (PARTITION BY sub) AS BIGINT) AS td FROM p_stats),
        |dec AS (SELECT coalesce(bool_or(
        |    abs(CAST(n_delta AS HUGEINT) * tb - CAST(n_base AS HUGEINT) * td) * 20
        |      > CAST(tb AS HUGEINT) * td
        |    OR CASE WHEN n_base = 0 THEN n_delta >= 16
        |            WHEN n_delta < 16 OR n_base < 16 THEN FALSE
        |            ELSE msd_delta * 2 > msd_base * 3 END), FALSE) AS r
        |  FROM p_tot),
        |dc AS (SELECT vec_id, is_d AND NOT (SELECT r FROM dec) AS is_delta,
        |    sub, cell, d, val FROM p_dc),
        |cent AS (SELECT sub, cell, d, avg(val) AS m FROM dc WHERE NOT is_delta GROUP BY sub, cell, d),
        |sq AS (SELECT dc.vec_id, dc.sub AS sub, dc.cell AS cell, is_delta,
        |    sum((val - m) * (val - m)) AS sq
        |  FROM dc LEFT JOIN cent ON dc.sub = cent.sub AND dc.cell = cent.cell AND dc.d = cent.d
        |  GROUP BY dc.vec_id, dc.sub, dc.cell, is_delta),
        |stats AS (SELECT sub, cell,
        |    count(*) FILTER (WHERE NOT is_delta) AS n_base,
        |    count(*) FILTER (WHERE is_delta) AS n_delta,
        |    avg(sq) FILTER (WHERE NOT is_delta) AS mb,
        |    avg(sq) FILTER (WHERE is_delta) AS md
        |  FROM sq GROUP BY sub, cell),
        |tot AS (SELECT sub, cell, n_base, n_delta,
        |    round(mb, 4) AS msd_base, round(md, 4) AS msd_delta,
        |    CAST(sum(n_base) OVER (PARTITION BY sub) AS BIGINT) AS tb,
        |    CAST(sum(n_delta) OVER (PARTITION BY sub) AS BIGINT) AS td FROM stats),
        |fl AS (SELECT sub, cell, n_base, n_delta, msd_base, msd_delta,
        |    abs(CAST(n_delta AS HUGEINT) * tb - CAST(n_base AS HUGEINT) * td) * 20
        |      > CAST(tb AS HUGEINT) * td AS occ_shift,
        |    CASE WHEN n_base = 0 THEN n_delta >= 16
        |         WHEN n_delta < 16 OR n_base < 16 THEN FALSE
        |         ELSE msd_delta * 2 > msd_base * 3 END AS dist_drift
        |  FROM tot),
        |nr AS (SELECT *, occ_shift OR dist_drift AS needs_retrain FROM fl)
        |SELECT sub, cell, n_base, n_delta, msd_base, msd_delta, occ_shift,
        |  dist_drift, needs_retrain,
        |  bool_or(needs_retrain) OVER () AS pq_retrain,
        |  (SELECT r FROM dec) AS retrained
        |FROM nr ORDER BY sub, cell""".stripMargin,
    // one block per audited key column; quantile_cont mirrors Spark's
    // exact interpolated percentile over the key-grain size table
    "skew_report" ->
      Seq("l_orderkey", "l_partkey", "l_suppkey").map { c =>
        s"""SELECT '$c' AS key_col, CAST(count(*) AS BIGINT) AS n_keys,
           |  CAST(sum(n) AS BIGINT) AS n_rows, CAST(max(n) AS BIGINT) AS max_group,
           |  round(quantile_cont(n, 0.99), 6) AS p99_group,
           |  round(max(n) * count(*) / CAST(sum(n) AS DOUBLE), 6) AS skew_ratio,
           |  (SELECT min(k) FROM (SELECT $c AS k, count(*) AS n FROM lineitem GROUP BY $c) g2
           |   WHERE g2.n = (SELECT max(n) FROM (SELECT count(*) AS n FROM lineitem GROUP BY $c) g3)) AS top_key
           |FROM (SELECT $c AS k, count(*) AS n FROM lineitem GROUP BY $c)""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY key_col"),
    // the streaming profiler must reproduce the batch drift output
    // bit-for-bit: SAME oracle
    "stream_profile_drift" -> profileDriftOracleSql,
    "profile_table" ->
      """WITH a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(o_orderkey) AS BIGINT) AS nn1, CAST(count(DISTINCT o_orderkey) AS BIGINT) AS nd1,
        |    CAST(min(o_orderkey) AS VARCHAR) AS mn1, CAST(max(o_orderkey) AS VARCHAR) AS mx1,
        |    round(CAST(sum(len(CAST(o_orderkey AS VARCHAR))) AS DOUBLE) / count(o_orderkey), 6) AS al1,
        |  CAST(count(o_custkey) AS BIGINT) AS nn2, CAST(count(DISTINCT o_custkey) AS BIGINT) AS nd2,
        |    CAST(min(o_custkey) AS VARCHAR) AS mn2, CAST(max(o_custkey) AS VARCHAR) AS mx2,
        |    round(CAST(sum(len(CAST(o_custkey AS VARCHAR))) AS DOUBLE) / count(o_custkey), 6) AS al2,
        |  CAST(count(o_orderstatus) AS BIGINT) AS nn3, CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS nd3,
        |    CAST(min(o_orderstatus) AS VARCHAR) AS mn3, CAST(max(o_orderstatus) AS VARCHAR) AS mx3,
        |    round(CAST(sum(len(o_orderstatus)) AS DOUBLE) / count(o_orderstatus), 6) AS al3,
        |  CAST(count(o_totalprice) AS BIGINT) AS nn4, CAST(count(DISTINCT o_totalprice) AS BIGINT) AS nd4,
        |    CAST(min(o_totalprice) AS VARCHAR) AS mn4, CAST(max(o_totalprice) AS VARCHAR) AS mx4,
        |    round(CAST(sum(len(CAST(o_totalprice AS VARCHAR))) AS DOUBLE) / count(o_totalprice), 6) AS al4,
        |  CAST(count(o_orderdate) AS BIGINT) AS nn5, CAST(count(DISTINCT o_orderdate) AS BIGINT) AS nd5,
        |    strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S') AS mn5, strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS mx5,
        |    round(CAST(sum(len(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'))) AS DOUBLE) / count(o_orderdate), 6) AS al5,
        |  CAST(count(o_orderpriority) AS BIGINT) AS nn6, CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS nd6,
        |    CAST(min(o_orderpriority) AS VARCHAR) AS mn6, CAST(max(o_orderpriority) AS VARCHAR) AS mx6,
        |    round(CAST(sum(len(o_orderpriority)) AS DOUBLE) / count(o_orderpriority), 6) AS al6
        |  FROM orders)
        |SELECT col_name, n_rows, n_nulls, n_distinct, min_val, max_val, avg_len FROM (
        |  SELECT 'o_orderkey' AS col_name, n AS n_rows, n - nn1 AS n_nulls, nd1 AS n_distinct, mn1 AS min_val, mx1 AS max_val, al1 AS avg_len FROM a
        |  UNION ALL SELECT 'o_custkey', n, n - nn2, nd2, mn2, mx2, al2 FROM a
        |  UNION ALL SELECT 'o_orderstatus', n, n - nn3, nd3, mn3, mx3, al3 FROM a
        |  UNION ALL SELECT 'o_totalprice', n, n - nn4, nd4, mn4, mx4, al4 FROM a
        |  UNION ALL SELECT 'o_orderdate', n, n - nn5, nd5, mn5, mx5, al5 FROM a
        |  UNION ALL SELECT 'o_orderpriority', n, n - nn6, nd6, mn6, mx6, al6 FROM a)
        |ORDER BY col_name""".stripMargin,
    // merged-partial profile: every exact column re-derived from the
    // full table (merge-algebra bugs diverge the hash); the HLL
    // distinct-estimate bound is in-engine, literal TRUE here
    "profile_merge" ->
      """WITH a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(o_orderkey) AS BIGINT) AS nn1, CAST(count(DISTINCT o_orderkey) AS BIGINT) AS nd1,
        |    CAST(min(o_orderkey) AS VARCHAR) AS mn1, CAST(max(o_orderkey) AS VARCHAR) AS mx1,
        |    round(CAST(sum(len(CAST(o_orderkey AS VARCHAR))) AS DOUBLE) / count(o_orderkey), 6) AS al1,
        |  CAST(count(o_custkey) AS BIGINT) AS nn2, CAST(count(DISTINCT o_custkey) AS BIGINT) AS nd2,
        |    CAST(min(o_custkey) AS VARCHAR) AS mn2, CAST(max(o_custkey) AS VARCHAR) AS mx2,
        |    round(CAST(sum(len(CAST(o_custkey AS VARCHAR))) AS DOUBLE) / count(o_custkey), 6) AS al2,
        |  CAST(count(o_orderstatus) AS BIGINT) AS nn3, CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS nd3,
        |    CAST(min(o_orderstatus) AS VARCHAR) AS mn3, CAST(max(o_orderstatus) AS VARCHAR) AS mx3,
        |    round(CAST(sum(len(o_orderstatus)) AS DOUBLE) / count(o_orderstatus), 6) AS al3,
        |  CAST(count(o_totalprice) AS BIGINT) AS nn4, CAST(count(DISTINCT o_totalprice) AS BIGINT) AS nd4,
        |    CAST(min(o_totalprice) AS VARCHAR) AS mn4, CAST(max(o_totalprice) AS VARCHAR) AS mx4,
        |    round(CAST(sum(len(CAST(o_totalprice AS VARCHAR))) AS DOUBLE) / count(o_totalprice), 6) AS al4,
        |  CAST(count(o_orderdate) AS BIGINT) AS nn5, CAST(count(DISTINCT o_orderdate) AS BIGINT) AS nd5,
        |    strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S') AS mn5, strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS mx5,
        |    round(CAST(sum(len(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'))) AS DOUBLE) / count(o_orderdate), 6) AS al5,
        |  CAST(count(o_orderpriority) AS BIGINT) AS nn6, CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS nd6,
        |    CAST(min(o_orderpriority) AS VARCHAR) AS mn6, CAST(max(o_orderpriority) AS VARCHAR) AS mx6,
        |    round(CAST(sum(len(o_orderpriority)) AS DOUBLE) / count(o_orderpriority), 6) AS al6
        |  FROM orders)
        |SELECT col_name, n_rows, n_nulls, n_distinct, min_val, max_val, avg_len, TRUE AS distinct_est_ok FROM (
        |  SELECT 'o_orderkey' AS col_name, n AS n_rows, n - nn1 AS n_nulls, nd1 AS n_distinct, mn1 AS min_val, mx1 AS max_val, al1 AS avg_len FROM a
        |  UNION ALL SELECT 'o_custkey', n, n - nn2, nd2, mn2, mx2, al2 FROM a
        |  UNION ALL SELECT 'o_orderstatus', n, n - nn3, nd3, mn3, mx3, al3 FROM a
        |  UNION ALL SELECT 'o_totalprice', n, n - nn4, nd4, mn4, mx4, al4 FROM a
        |  UNION ALL SELECT 'o_orderdate', n, n - nn5, nd5, mn5, mx5, al5 FROM a
        |  UNION ALL SELECT 'o_orderpriority', n, n - nn6, nd6, mn6, mx6, al6 FROM a)
        |ORDER BY col_name""".stripMargin,
    // vocabulary coverage: integer-exact membership ((cum-cnt)*100 <
    // covPct*total), rank/cumulative windows on the collapsed vocab
    "vocab_coverage" ->
      """WITH tk AS (SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS token FROM documents),
        |c AS (SELECT token, count(*) AS cnt FROM tk GROUP BY token),
        |w AS (SELECT token, CAST(cnt AS BIGINT) AS cnt,
        |    CAST(row_number() OVER (ORDER BY cnt DESC, token ASC) AS BIGINT) AS vocab_rank,
        |    sum(cnt) OVER (ORDER BY cnt DESC, token ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cnt,
        |    sum(cnt) OVER () AS total
        |  FROM c)
        |SELECT token, cnt, vocab_rank,
        |  round(CAST(cum_cnt AS DOUBLE) / total, 6) AS cum_share,
        |  (cum_cnt - cnt) * 100 < 90 * total AS in_vocab
        |FROM w ORDER BY vocab_rank""".stripMargin,
    // the vocabulary drift gauge: OOV mass + head-token occupancy
    // shift, exact cross-multiplication (the index_drift_check algebra)
    "vocab_drift_check" -> vocabDriftOracle,
    // identical output contract to vocab_drift_check: the streamed
    // appendOnce count maintenance serves a bit-identical gauge panel
    "stream_vocab_delta" -> vocabDriftOracle,
    // the decision recomputed, then the panel re-run on the post-state
    // (fired gauge => full corpus becomes base, delta empty)
    "vocab_retrain_apply" ->
      """WITH cut AS (SELECT max(doc_id) * 4 // 5 + 1 AS c FROM documents),
        |t0 AS (SELECT doc_id >= (SELECT c FROM cut) AS is_d,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS w
        |  FROM documents),
        |p_counts AS (SELECT w,
        |    count(*) FILTER (WHERE NOT is_d) AS n_base,
        |    count(*) FILTER (WHERE is_d) AS n_delta
        |  FROM t0 GROUP BY w),
        |p_tot AS (SELECT CAST(sum(n_base) AS BIGINT) AS tb,
        |    CAST(sum(n_delta) AS BIGINT) AS td,
        |    CAST(coalesce(sum(n_delta) FILTER (WHERE n_base = 0), 0) AS BIGINT) AS oov_occ
        |  FROM p_counts),
        |p_head AS (SELECT w, n_base, n_delta FROM p_counts
        |  WHERE n_base > 0 ORDER BY n_base DESC, w ASC LIMIT 32),
        |dec AS (SELECT coalesce(bool_or(
        |    abs(CAST(n_delta AS HUGEINT) * tb - CAST(n_base AS HUGEINT) * td) * 20
        |      > CAST(tb AS HUGEINT) * td), FALSE)
        |    OR coalesce(bool_or(oov_occ * 100 > td), FALSE) AS r
        |  FROM p_head, p_tot),
        |t AS (SELECT is_d AND NOT (SELECT r FROM dec) AS is_delta, w FROM t0),
        |counts AS (SELECT w,
        |    count(*) FILTER (WHERE NOT is_delta) AS n_base,
        |    count(*) FILTER (WHERE is_delta) AS n_delta
        |  FROM t GROUP BY w),
        |tot AS (SELECT CAST(sum(n_base) AS BIGINT) AS tb,
        |    CAST(sum(n_delta) AS BIGINT) AS td,
        |    CAST(coalesce(sum(n_delta) FILTER (WHERE n_base = 0), 0) AS BIGINT) AS oov_occ,
        |    CAST(count(*) FILTER (WHERE n_base = 0 AND n_delta > 0) AS BIGINT) AS new_tokens
        |  FROM counts),
        |head AS (SELECT w, CAST(n_base AS BIGINT) AS n_base,
        |    CAST(n_delta AS BIGINT) AS n_delta
        |  FROM counts WHERE n_base > 0
        |  ORDER BY n_base DESC, w ASC LIMIT 32),
        |panel AS (SELECT w, n_base, n_delta,
        |    abs(CAST(n_delta AS HUGEINT) * tb - CAST(n_base AS HUGEINT) * td) * 20
        |      > CAST(tb AS HUGEINT) * td AS occ_shift,
        |    CASE WHEN td = 0 THEN 0.0
        |         ELSE round(CAST(oov_occ AS DOUBLE) / td, 6) END AS oov_rate,
        |    new_tokens,
        |    oov_occ * 100 > td AS oov_drift
        |  FROM head, tot)
        |SELECT w, n_base, n_delta, occ_shift, oov_rate, new_tokens,
        |  oov_drift,
        |  bool_or(occ_shift) OVER () OR oov_drift AS vocab_retrain,
        |  (SELECT r FROM dec) AS retrained
        |FROM panel ORDER BY w""".stripMargin,
    // second principal direction: the power-iter chain, then division-
    // free deflation (q*rr - (q.r)*r), an integer-derived sign-
    // symmetric shift back into range, and two more matvec passes —
    // all integers, so the oracle replays the whole chain bit-exactly
    "embed_pca2" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q
        |  FROM embeddings),
        |d1 AS (SELECT vec_id, q,
        |    list_sum(list_transform(range(0, 64), d -> q[d + 1] * ((d % 7) - 3))) AS dot
        |  FROM e),
        |y1 AS (SELECT d, sum(q[d + 1] * dot) AS y FROM d1 CROSS JOIN range(0, 64) t(d) GROUP BY d),
        |m1 AS (SELECT max(abs(y)) AS m FROM y1),
        |r1 AS (SELECT list(CAST(CAST(y AS HUGEINT) * 1024 // m AS BIGINT) ORDER BY d) AS rv FROM y1, m1),
        |d2 AS (SELECT vec_id, q,
        |    list_sum(list_transform(range(0, 64), d -> q[d + 1] * rv[d + 1])) AS dot
        |  FROM e, r1),
        |y2 AS (SELECT d, sum(q[d + 1] * dot) AS y FROM d2 CROSS JOIN range(0, 64) t(d) GROUP BY d),
        |m2 AS (SELECT max(abs(y)) AS m FROM y2),
        |fst AS (SELECT list(CAST(CAST(y AS HUGEINT) * 1024 // m AS BIGINT) ORDER BY d) AS fv FROM y2, m2),
        |rr AS (SELECT list_sum(list_transform(fv, x -> x * x)) AS v FROM fst),
        |defl AS (SELECT vec_id,
        |    list_transform(range(0, 64), d -> q[d + 1] * rr.v -
        |      list_sum(list_transform(range(0, 64), j -> q[j + 1] * fv[j + 1])) * fv[d + 1]) AS qd
        |  FROM e, fst, rr),
        |mm AS (SELECT max(list_max(list_transform(qd, x -> abs(x)))) AS m FROM defl),
        |sh AS (SELECT min(k) AS s FROM range(0, 63) t(k), mm WHERE (m >> CAST(k AS INT)) <= 20000),
        |q2 AS (SELECT vec_id, list_transform(qd,
        |      v -> CASE WHEN v >= 0 THEN v >> CAST(sh.s AS INT)
        |           ELSE -((-v) >> CAST(sh.s AS INT)) END) AS q
        |  FROM defl, sh),
        |e1 AS (SELECT vec_id, q,
        |    list_sum(list_transform(range(0, 64), d -> q[d + 1] * ((d % 7) - 3))) AS dot FROM q2),
        |z1 AS (SELECT d, sum(q[d + 1] * dot) AS y FROM e1 CROSS JOIN range(0, 64) t(d) GROUP BY d),
        |n1 AS (SELECT max(abs(y)) AS m FROM z1),
        |s1 AS (SELECT list(CAST(CAST(y AS HUGEINT) * 1024 // m AS BIGINT) ORDER BY d) AS rv FROM z1, n1),
        |e2 AS (SELECT vec_id, q,
        |    list_sum(list_transform(range(0, 64), d -> q[d + 1] * rv[d + 1])) AS dot FROM q2, s1),
        |z2 AS (SELECT d, sum(q[d + 1] * dot) AS y FROM e2 CROSS JOIN range(0, 64) t(d) GROUP BY d),
        |n2 AS (SELECT max(abs(y)) AS m FROM z2)
        |SELECT CAST(d AS BIGINT) AS dim, CAST(CAST(y AS HUGEINT) * 1024 // m AS BIGINT) AS component2_q
        |FROM z2, n2 ORDER BY dim""".stripMargin,
    // exact-integer power iteration: quantize -> matvec -> truncated-
    // division renorm, twice — every step integer and order-free, so
    // the oracle reproduces the 64 component values bit-exactly
    "embed_power_iter" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q
        |  FROM embeddings),
        |d1 AS (SELECT vec_id, q,
        |    list_sum(list_transform(range(0, 64), d -> q[d + 1] * ((d % 7) - 3))) AS dot
        |  FROM e),
        |y1 AS (SELECT d, sum(q[d + 1] * dot) AS y
        |  FROM d1 CROSS JOIN range(0, 64) t(d) GROUP BY d),
        |m1 AS (SELECT max(abs(y)) AS m FROM y1),
        |r1 AS (SELECT d, CAST(CAST(y AS HUGEINT) * 1024 // m AS BIGINT) AS r FROM y1, m1),
        |r1l AS (SELECT list(r ORDER BY d) AS rv FROM r1),
        |d2 AS (SELECT vec_id, q,
        |    list_sum(list_transform(range(0, 64), d -> q[d + 1] * rv[d + 1])) AS dot
        |  FROM e, r1l),
        |y2 AS (SELECT d, sum(q[d + 1] * dot) AS y
        |  FROM d2 CROSS JOIN range(0, 64) t(d) GROUP BY d),
        |m2 AS (SELECT max(abs(y)) AS m FROM y2)
        |SELECT CAST(d AS BIGINT) AS dim, CAST(CAST(y AS HUGEINT) * 1024 // m AS BIGINT) AS component_q
        |FROM y2, m2 ORDER BY dim""".stripMargin,
    "embed_quantize" ->
      """WITH b AS (SELECT vec_id, embedding,
        |    CAST(list_min(embedding) AS DOUBLE) AS lo,
        |    CAST(list_max(embedding) AS DOUBLE) AS hi
        |  FROM embeddings)
        |SELECT vec_id, round(lo, 6) AS qmin, round(hi, 6) AS qmax,
        |  md5(array_to_string(list_transform(embedding,
        |    x -> CAST(CASE WHEN hi = lo THEN 0
        |      ELSE least(255, floor((CAST(x AS DOUBLE) - lo) / (hi - lo) * 256)) END AS INT)), ' ')) AS q_digest
        |FROM b ORDER BY vec_id""".stripMargin,
    "pack_sequences" ->
      """WITH t AS (SELECT source, doc_id,
        |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t)
        |SELECT source, doc_id, n_tokens,
        |  CAST((cum - n_tokens) // 2048 AS BIGINT) AS bin,
        |  CAST((cum - n_tokens) % 2048 AS BIGINT) AS bin_offset
        |FROM c ORDER BY source, doc_id""".stripMargin,
    "doc_chunk" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents WHERE len(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) > 0),
        |s AS (SELECT doc_id, toks, unnest(range(0, len(toks), 32)) AS chunk_start FROM t),
        |c AS (SELECT doc_id, chunk_start,
        |    list_slice(toks, chunk_start + 1, chunk_start + 64) AS chunk
        |  FROM s)
        |SELECT doc_id, CAST(chunk_start // 32 AS BIGINT) AS chunk_idx,
        |  CAST(chunk_start AS BIGINT) AS chunk_start,
        |  CAST(len(chunk) AS BIGINT) AS n_chunk_tokens,
        |  md5(array_to_string(chunk, ' ')) AS chunk_md5
        |FROM c WHERE chunk_start = 0 OR len(chunk) > 32
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    // chunk-grain exact dedup: the doc_chunk pipeline grouped on the
    // digest, canonical = first-seen by (doc_id, chunk_idx)
    "dedup_chunks" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents WHERE len(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) > 0),
        |s AS (SELECT doc_id, toks, unnest(range(0, len(toks), 32)) AS chunk_start FROM t),
        |c AS (SELECT doc_id, chunk_start,
        |    list_slice(toks, chunk_start + 1, chunk_start + 64) AS chunk
        |  FROM s),
        |f AS (SELECT doc_id, CAST(chunk_start // 32 AS BIGINT) AS chunk_idx,
        |    CAST(len(chunk) AS BIGINT) AS n_chunk_tokens,
        |    md5(array_to_string(chunk, ' ')) AS chunk_md5
        |  FROM c WHERE chunk_start = 0 OR len(chunk) > 32),
        |g AS (SELECT chunk_md5, doc_id, chunk_idx, n_chunk_tokens,
        |    CAST(count(*) OVER (PARTITION BY chunk_md5) AS BIGINT) AS n_copies,
        |    row_number() OVER (PARTITION BY chunk_md5
        |      ORDER BY doc_id, chunk_idx) AS rn
        |  FROM f)
        |SELECT chunk_md5, doc_id AS canon_doc_id,
        |  chunk_idx AS canon_chunk_idx, n_copies, n_chunk_tokens
        |FROM g WHERE rn = 1 AND n_copies >= 2
        |ORDER BY chunk_md5""".stripMargin,
    // the delta form IS the full-corpus keep-first rule restricted to
    // delivery rows — the oracle re-runs the whole-corpus canonical
    // computation and keeps the non-canonical delivery chunks
    "dedup_chunks_delta" -> chunksDeltaOracle,
    // identical output contract to dedup_chunks_delta: the streamed
    // appendOnce maintenance yields a bit-identical persisted store
    "stream_chunks_delta" -> chunksDeltaOracle,
    "text_repetition" ->
      """WITH t AS (SELECT doc_id,
        |    list_slice(list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> len(x) > 0), 1, 4096) AS toks
        |  FROM documents),
        |t2 AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) >= 2),
        |g2 AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
        |    i -> toks[i] || ' ' || toks[i + 1])) AS gram FROM t2),
        |cnt AS (SELECT doc_id, gram, count(*) AS n FROM g2 GROUP BY 1, 2),
        |best AS (SELECT doc_id, gram, n FROM (
        |    SELECT doc_id, gram, n,
        |      row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, gram ASC) AS rn
        |    FROM cnt) WHERE rn = 1),
        |g5 AS (SELECT doc_id,
        |    CAST(len(list_distinct(l5)) AS DOUBLE) / len(l5) AS r5
        |  FROM (SELECT doc_id, list_transform(range(1, len(toks) - 3),
        |      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] || ' ' ||
        |        toks[i + 3] || ' ' || toks[i + 4]) AS l5
        |    FROM t2 WHERE len(toks) >= 5))
        |SELECT t2.doc_id, CAST(t2.n AS BIGINT) AS n_tokens,
        |  b.gram AS top_bigram, CAST(b.n AS BIGINT) AS top_bigram_n,
        |  round(CAST(b.n AS DOUBLE) / (t2.n - 1), 6) AS top_bigram_frac,
        |  round(g5.r5, 6) AS distinct_5gram_ratio
        |FROM t2 JOIN best b USING (doc_id) LEFT JOIN g5 USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "scan_zorder" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
        |FROM lineitem WHERE l_partkey BETWEEN 1 AND 40 AND l_suppkey BETWEEN 1 AND 10
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity""".stripMargin,
    "events_pruned" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |WHERE CAST(CAST(ts AS TIMESTAMP) AS DATE) =
        |  (SELECT min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "stream_tumbling" ->
      """SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS window_start, event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_sliding" ->
      """WITH b AS (SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) AS tb, event_type FROM events),
        |w AS (SELECT tb AS window_start, event_type FROM b
        |      UNION ALL SELECT tb - INTERVAL '30 minutes', event_type FROM b)
        |SELECT CAST(window_start AS TIMESTAMP) AS window_start, event_type, CAST(count(*) AS BIGINT) AS n_events
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_session" -> sessionOracleSql,
    // the native session_window drive AND the custom fMGWS tracker
    // drive must both reproduce the gaps-and-islands sessions exactly
    // (no 30-min boundary ties exist in the fixture at any SF — see
    // SessionDrive scaladoc); three implementations, one oracle
    "stream_session_window" -> sessionOracleSql,
    // the checkpoint-stop/restart drive must reproduce the SAME
    // sessions — recovery as a driver-gated property, not a spec-only
    // one (RestartRecoverySpec proves the mechanism; this key gates it)
    "stream_session_window_restart" -> sessionOracleSql,
    "stream_session_tracker" -> sessionOracleSql,
    "events_props" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(count(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50 THEN 1 END) AS BIGINT) AS n_high
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_funnel" ->
      """WITH v AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t_view FROM events WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t_click FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) >= v.t_view GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t_purchase FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) >= c.t_click GROUP BY e.user_id),
        |s AS (SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS n FROM v
        |  UNION ALL SELECT '2_click', CAST(count(*) AS BIGINT) FROM c
        |  UNION ALL SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM p)
        |SELECT stage, n,
        |  round(CAST(n AS DOUBLE) / coalesce(lag(n) OVER (ORDER BY stage), n), 6) AS conv_from_prev
        |FROM s ORDER BY stage""".stripMargin,
    "curate_budget" ->
      """WITH t AS (SELECT doc_id, source,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents),
        |q AS (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_words,
        |    round((CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * least(1.0, CAST(len(toks) AS DOUBLE) / 50.0), 6) AS quality_score
        |  FROM t),
        |c AS (SELECT *, CAST(sum(n_words) OVER (PARTITION BY source
        |    ORDER BY quality_score DESC, doc_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens FROM q)
        |SELECT source, doc_id, quality_score, n_words, cum_tokens
        |FROM c WHERE cum_tokens <= 800 ORDER BY source, doc_id""".stripMargin,
    "events_retention" ->
      """WITH ev AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day
        |  FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id)
        |SELECT cohort_day,
        |  CAST(count(DISTINCT c.user_id) AS BIGINT) AS cohort_size,
        |  CAST(count(DISTINCT CASE WHEN ev.day = c.cohort_day + INTERVAL 1 DAY
        |    THEN ev.user_id END) AS BIGINT) AS d1_retained,
        |  CAST(count(DISTINCT CASE WHEN ev.day = c.cohort_day + INTERVAL 7 DAY
        |    THEN ev.user_id END) AS BIGINT) AS d7_retained
        |FROM c JOIN ev ON c.user_id = ev.user_id
        |GROUP BY cohort_day ORDER BY cohort_day""".stripMargin,
    "events_date_parts" ->
      """SELECT event_id,
        |  CAST(year(CAST(ts AS TIMESTAMP)) AS BIGINT) AS y,
        |  CAST(month(CAST(ts AS TIMESTAMP)) AS BIGINT) AS mo,
        |  CAST(day(CAST(ts AS TIMESTAMP)) AS BIGINT) AS d,
        |  CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS h,
        |  CAST(minute(CAST(ts AS TIMESTAMP)) AS BIGINT) AS mi,
        |  CAST(isodow(CAST(ts AS TIMESTAMP)) AS BIGINT) AS isodow,
        |  last_day(CAST(ts AS DATE)) AS month_end,
        |  CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT)
        |    AS days_since
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,
    "events_gapfill" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n_events
        |  FROM events WHERE value > 250 GROUP BY 1, 2),
        |bounds AS (
        |  SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi FROM events),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
        |types AS (SELECT DISTINCT event_type FROM events)
        |SELECT s.day, t.event_type, coalesce(d.n_events, 0) AS n_events
        |FROM spine s CROSS JOIN types t
        |LEFT JOIN daily d ON d.day = s.day AND d.event_type = t.event_type
        |ORDER BY s.day, t.event_type""".stripMargin,
    "doc_tokens_pos" ->
      """SELECT doc_id, CAST(unnest(range(0, len(toks))) AS BIGINT) AS pos,
        |  unnest(toks) AS tok
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |      FROM documents WHERE doc_id % 97 = 0)
        |ORDER BY doc_id, pos""".stripMargin,
    "corpus_melt" ->
      """WITH wide AS (
        |  SELECT source, CAST(count(*) AS DOUBLE) AS n_docs,
        |    CAST(sum(n_chars) AS DOUBLE) AS total_chars,
        |    CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
        |  FROM documents GROUP BY source)
        |SELECT source, metric, value
        |FROM (UNPIVOT wide ON n_docs, total_chars, avg_chars INTO NAME metric VALUE value)
        |ORDER BY source, metric""".stripMargin,
    "agg_conditional" ->
      """SELECT l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n_all,
        |  CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_bulk,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS rev_disc,
        |  max(l_quantity) FILTER (WHERE l_linestatus = 'F') AS max_qty_f
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "corpus_hist" ->
      """SELECT source, CAST(floor(n_chars / 50) AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY source, bucket
        |ORDER BY source, bucket""".stripMargin,
    "window_rank_stats" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drank
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice ASC, o_orderkey ASC)
        |ORDER BY o_orderkey""".stripMargin,
    "events_daily" ->
      """SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day, event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "text_tokens" ->
      """SELECT token, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0)) AS token FROM documents)
        |GROUP BY token ORDER BY n DESC, token ASC LIMIT 100""".stripMargin,
    "text_stats" ->
      """WITH t AS (SELECT doc_id, n_chars, text,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents)
        |SELECT doc_id, n_chars, CAST(len(toks) AS BIGINT) AS n_words,
        |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_words,
        |  CAST(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_tokens_bpe,
        |  round(CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks), 6) AS avg_word_len,
        |  round(CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE) / len(toks), 6) AS stopword_ratio,
        |  round((CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * least(1.0, CAST(len(toks) AS DOUBLE) / 50.0), 6) AS quality_score
        |FROM t ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      """WITH t AS (SELECT doc_id, lang,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents),
        |v AS (SELECT doc_id, lang,
        |    CAST(len(list_filter(toks, x -> x IN ('the','and','of'))) AS BIGINT) AS votes_en,
        |    CAST(len(list_filter(toks, x -> x IN ('el','los','las'))) AS BIGINT) AS votes_es,
        |    CAST(len(list_filter(toks, x -> x IN ('le','les','une'))) AS BIGINT) AS votes_fr,
        |    CAST(len(list_filter(toks, x -> x IN ('der','und','das'))) AS BIGINT) AS votes_de
        |  FROM t)
        |SELECT doc_id, lang,
        |  CASE WHEN votes_en = greatest(votes_en, votes_es, votes_fr, votes_de) AND votes_en > 0 THEN 'en'
        |       WHEN votes_es = greatest(votes_en, votes_es, votes_fr, votes_de) AND votes_es > 0 THEN 'es'
        |       WHEN votes_fr = greatest(votes_en, votes_es, votes_fr, votes_de) AND votes_fr > 0 THEN 'fr'
        |       WHEN votes_de = greatest(votes_en, votes_es, votes_fr, votes_de) AND votes_de > 0 THEN 'de'
        |       ELSE 'und' END AS predicted_lang,
        |  votes_en, votes_es, votes_fr, votes_de
        |FROM v ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id, md5(array_to_string(list_sort(list_distinct(
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0))), ' ')) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    // robust winnowing, literally mirrored: md5 3-gram hashes, window
    // w=4, rightmost minimum per window ('~' as the +inf sentinel),
    // short docs = one window, distinct selections
    "text_winnow" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents),
        |h AS (SELECT doc_id, list_transform(range(1, len(toks) - 1), i ->
        |    md5(toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS hs
        |  FROM t WHERE len(toks) >= 3),
        |wnd AS (SELECT doc_id, hs, CASE WHEN len(hs) >= 4 THEN len(hs) - 3 ELSE 1 END AS nw
        |  FROM h WHERE len(hs) >= 1),
        |sel AS (SELECT doc_id, list_transform(range(1, nw + 1), j ->
        |    list_reduce(list_prepend({'h': '~', 'p': 0},
        |      list_transform(range(0, least(3, len(hs) - j) + 1), o -> {'h': hs[j + o], 'p': j + o})),
        |      (a, x) -> CASE WHEN x.h <= a.h THEN x ELSE a END)) AS fps
        |  FROM wnd)
        |SELECT DISTINCT doc_id, CAST(f.p AS BIGINT) AS pos, f.h AS fp
        |FROM (SELECT doc_id, unnest(fps) AS f FROM sel)
        |ORDER BY doc_id, pos""".stripMargin,
    // MOSS match detection: the same winnow selection, deduped to
    // (doc, fp), DF-capped, self-joined on fp, >= 2 shared
    "dedup_winnow" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents),
        |h AS (SELECT doc_id, list_transform(range(1, len(toks) - 1), i ->
        |    md5(toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS hs
        |  FROM t WHERE len(toks) >= 3),
        |wnd AS (SELECT doc_id, hs, CASE WHEN len(hs) >= 4 THEN len(hs) - 3 ELSE 1 END AS nw
        |  FROM h WHERE len(hs) >= 1),
        |sel AS (SELECT doc_id, list_transform(range(1, nw + 1), j ->
        |    list_reduce(list_prepend({'h': '~', 'p': 0},
        |      list_transform(range(0, least(3, len(hs) - j) + 1), o -> {'h': hs[j + o], 'p': j + o})),
        |      (a, x) -> CASE WHEN x.h <= a.h THEN x ELSE a END)) AS fps
        |  FROM wnd),
        |fp AS (SELECT DISTINCT doc_id, f.h AS fp
        |  FROM (SELECT doc_id, unnest(fps) AS f FROM sel)),
        |cold AS (SELECT * FROM fp WHERE fp NOT IN (
        |    SELECT fp FROM fp GROUP BY fp HAVING count(*) > 1000))
        |SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(count(*) AS BIGINT) AS n_shared
        |FROM cold a JOIN cold b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2
        |ORDER BY d1, d2""".stripMargin,
    "dedup_exact" ->
      """SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT doc_id, lang, source, n_chars,
        |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id ASC) AS rn
        |  FROM documents) WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "dedup_canonical" ->
      """WITH c AS (SELECT doc_id, lang, source,
        |    CASE WHEN trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) = ''
        |      THEN md5(text)
        |      ELSE md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) END AS canon_md5
        |  FROM documents),
        |r AS (SELECT doc_id, lang, source, canon_md5,
        |    row_number() OVER (PARTITION BY canon_md5 ORDER BY doc_id ASC) AS rn,
        |    CAST(count(*) OVER (PARTITION BY canon_md5) - 1 AS BIGINT) AS n_absorbed
        |  FROM c)
        |SELECT doc_id, lang, source, canon_md5, n_absorbed
        |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "corpus_stats" ->
      """WITH t AS (SELECT source, lang,
        |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens_total,
        |  round(quantile_cont(n_tokens, 0.5), 6) AS p50_tokens,
        |  round(quantile_cont(n_tokens, 0.9), 6) AS p90_tokens,
        |  round(CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS share_en
        |FROM t GROUP BY source ORDER BY source""".stripMargin,
    "text_novelty" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS shingle
        |  FROM t WHERE len(toks) >= 3),
        |df AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh,
        |  CAST(count(*) FILTER (WHERE df.df > 2) AS BIGINT) AS n_common,
        |  round(1 - count(*) FILTER (WHERE df.df > 2) / CAST(count(*) AS DOUBLE), 6)
        |    AS novelty
        |FROM sh JOIN df USING (shingle)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "dedup_ngram" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents),
        |sh0 AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS shingle
        |  FROM t WHERE len(toks) >= 3),
        |sh AS (SELECT * FROM sh0 WHERE shingle NOT IN (
        |    SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > 1000)),
        |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |com AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT d1, d2, round(CAST(common AS DOUBLE) / (c1.n_sh + c2.n_sh - common), 6) AS jaccard
        |FROM com JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id
        |WHERE round(CAST(common AS DOUBLE) / (c1.n_sh + c2.n_sh - common), 6) >= 0.3
        |ORDER BY d1, d2""".stripMargin,
    // the star-bounded form is pair-identical to dedup_ngram wherever
    // every posting is at-or-under the 32-pair cap — true at all
    // driver SFs (max df 25 at sf0.1), so the SAME exact-pair oracle
    // hash-gates it; above the cap only completeness relaxes to the
    // spanning guarantee (StarShingleSpec measures that regime)
    "dedup_ngram_star" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents),
        |sh0 AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS shingle
        |  FROM t WHERE len(toks) >= 3),
        |sh AS (SELECT * FROM sh0 WHERE shingle NOT IN (
        |    SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > 1000)),
        |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |com AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT d1, d2, round(CAST(common AS DOUBLE) / (c1.n_sh + c2.n_sh - common), 6) AS jaccard
        |FROM com JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id
        |WHERE round(CAST(common AS DOUBLE) / (c1.n_sh + c2.n_sh - common), 6) >= 0.3
        |ORDER BY d1, d2""".stripMargin,
    // duplicated 5-gram positions merged to maximal spans per doc; the
    // oracle groups raw gram strings where Spark groups xxhash64 keys,
    // so agreement doubles as a collision check
    "dedup_substring" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(0, len(toks) - 5 + 1),
        |    s -> struct_pack(start := s, gram := array_to_string(toks[s + 1 : s + 5], ' ')))) AS gs
        |  FROM t WHERE len(toks) >= 5),
        |g2 AS (SELECT doc_id, gs.start AS start, gs.gram AS gram FROM g),
        |dup AS (SELECT gram FROM g2 GROUP BY gram HAVING count(*) >= 2),
        |sp AS (SELECT doc_id, start, start + 5 AS e FROM g2 WHERE gram IN (SELECT gram FROM dup)),
        |isl AS (SELECT doc_id, start, e,
        |    CASE WHEN start > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY start
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS new_island
        |  FROM sp),
        |isl2 AS (SELECT doc_id, start, e,
        |    sum(new_island) OVER (PARTITION BY doc_id ORDER BY start ROWS UNBOUNDED PRECEDING) AS island
        |  FROM isl)
        |SELECT doc_id, CAST(min(start) AS BIGINT) AS span_start,
        |  CAST(max(e) AS BIGINT) AS span_end, CAST(count(*) AS BIGINT) AS n_grams
        |FROM isl2 GROUP BY doc_id, island ORDER BY doc_id, span_start""".stripMargin,
    // removal stage: a position is cut iff covered by a duplicated
    // gram occurrence and by NO primary (corpus-first) occurrence;
    // oracle ranks raw gram strings where Spark ranks xxhash64 keys
    "dedup_substring_apply" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(0, len(toks) - 5 + 1),
        |    s -> struct_pack(start := s, gram := array_to_string(toks[s + 1 : s + 5], ' ')))) AS gs
        |  FROM t WHERE len(toks) >= 5),
        |g2 AS (SELECT doc_id, gs.start AS start, gs.gram AS gram FROM g),
        |dup AS (SELECT gram FROM g2 GROUP BY gram HAVING count(*) >= 2),
        |occ AS (SELECT doc_id, start,
        |    row_number() OVER (PARTITION BY gram ORDER BY doc_id, start) = 1 AS is_primary
        |  FROM g2 WHERE gram IN (SELECT gram FROM dup)),
        |cov AS (SELECT doc_id, unnest(generate_series(start, start + 4)) AS pos, is_primary FROM occ),
        |cov2 AS (SELECT doc_id, pos, max(is_primary) AS primary_covered FROM cov GROUP BY doc_id, pos),
        |p AS (SELECT doc_id, unnest(range(len(toks))) AS pos FROM t),
        |p2 AS (SELECT p.doc_id, p.pos, t.toks[p.pos + 1] AS tk FROM p JOIN t USING (doc_id)),
        |j AS (SELECT p2.doc_id, p2.pos, p2.tk,
        |    coalesce(NOT cov2.primary_covered, FALSE) AS removed
        |  FROM p2 LEFT JOIN cov2 ON p2.doc_id = cov2.doc_id AND p2.pos = cov2.pos),
        |per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(count(*) FILTER (WHERE removed) AS BIGINT) AS n_removed,
        |    coalesce(string_agg(tk, ' ' ORDER BY pos) FILTER (WHERE NOT removed), '') AS cleaned_text
        |  FROM j GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(per.n_tokens, 0) AS n_tokens,
        |  coalesce(per.n_removed, 0) AS n_removed,
        |  coalesce(per.cleaned_text, '') AS cleaned_text
        |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // the O(delta) form: gram/dup/primary status over the FULL corpus
    // (the store carries the base side), output restricted to the
    // delivery — the batch rule on delta rows, which the incremental
    // plan reproduces exactly (SubstringDeltaSpec pins it)
    "dedup_substring_delta" -> substringDeltaOracle,
    // structural identity: additive gram counts + the same persisted
    // base probe table, ONE val gates both
    "stream_substring_delta" -> substringDeltaOracle,
    // per-source duplicated-token share: the dedup_substring span chain
    // rolled up per doc then per source; docs too short for a gram keep
    // their tokens in the denominator with zero duplicated tokens
    "corpus_dup_rate" ->
      """WITH t AS (SELECT doc_id, source, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(0, len(toks) - 5 + 1),
        |    s -> struct_pack(start := s, gram := array_to_string(toks[s + 1 : s + 5], ' ')))) AS gs
        |  FROM t WHERE len(toks) >= 5),
        |g2 AS (SELECT doc_id, gs.start AS start, gs.gram AS gram FROM g),
        |dup AS (SELECT gram FROM g2 GROUP BY gram HAVING count(*) >= 2),
        |sp AS (SELECT doc_id, start, start + 5 AS e FROM g2 WHERE gram IN (SELECT gram FROM dup)),
        |isl AS (SELECT doc_id, start, e,
        |    CASE WHEN start > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY start
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS new_island
        |  FROM sp),
        |isl2 AS (SELECT doc_id, start, e,
        |    sum(new_island) OVER (PARTITION BY doc_id ORDER BY start ROWS UNBOUNDED PRECEDING) AS island
        |  FROM isl),
        |spans AS (SELECT doc_id, min(start) AS span_start, max(e) AS span_end FROM isl2 GROUP BY doc_id, island),
        |per_doc AS (SELECT doc_id, sum(span_end - span_start) AS dup_toks FROM spans GROUP BY doc_id)
        |SELECT source, CAST(sum(len(toks)) AS BIGINT) AS total_tokens,
        |  CAST(sum(coalesce(dup_toks, 0)) AS BIGINT) AS dup_tokens,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(CASE WHEN coalesce(dup_toks, 0) > 0 THEN 1 END) AS BIGINT) AS n_docs_with_dups,
        |  round(CAST(sum(coalesce(dup_toks, 0)) AS DOUBLE) / sum(len(toks)), 6) AS dup_rate
        |FROM t LEFT JOIN per_doc USING (doc_id)
        |GROUP BY source ORDER BY source""".stripMargin,
    "join_skew_salted" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_lineitems
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "window_range" ->
      """WITH o AS (SELECT *, date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS order_day FROM orders)
        |SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trailing_30d_spend,
        |  CAST(count(*) OVER w AS BIGINT) AS trailing_30d_orders
        |FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY order_day RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "stream_dedup" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // order-pinned float parity: both engines fold log2 over the SORTED
    // per-doc count list (aggregate HOF ↔ list_sort + list_reduce)
    "text_surprisal" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents),
        |occ AS (SELECT doc_id, unnest(toks) AS token FROM t),
        |freq AS (SELECT token, count(*) AS c FROM occ GROUP BY token),
        |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS T FROM freq),
        |percy AS (SELECT doc_id, list_sort(list(c)) AS cs FROM occ JOIN freq USING (token) GROUP BY doc_id)
        |SELECT doc_id, CAST(len(cs) AS BIGINT) AS n_tokens,
        |  round((len(cs) * log2(T) - list_reduce(list_transform(cs, x -> log2(CAST(x AS DOUBLE))), (a, b) -> a + b)) / len(cs), 6) AS avg_bits
        |FROM percy, tot ORDER BY doc_id""".stripMargin,
    // Okapi BM25 vs the fixed 4-term query: per-(doc,term)
    // contributions are one literal arithmetic chain on both engines,
    // folded per doc in sorted term order (the surprisal technique)
    "text_bm25" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents),
        |dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM t),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS nd, CAST(sum(len(toks)) AS DOUBLE) AS tt FROM t),
        |tf AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf
        |  FROM (SELECT doc_id, unnest(toks) AS token FROM t)
        |  WHERE token IN ('filter', 'join', 'stream', 'window')
        |  GROUP BY doc_id, token),
        |df AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY token),
        |c AS (SELECT tf.doc_id, tf.token,
        |    ln(1.0 + (n.nd - df.df + 0.5) / (df.df + 0.5)) * tf.tf * 2.2 /
        |    (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl * n.nd / n.tt)) AS c
        |  FROM tf JOIN df USING (token) JOIN dl USING (doc_id), n)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
        |  round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(c ORDER BY token)), (a, v) -> a + v), 6) AS bm25
        |FROM c GROUP BY doc_id ORDER BY bm25 DESC, doc_id""".stripMargin,
    // bigram-LM perplexity: both engines pack each pair's two counts
    // into one bigint (c(w1)·2^31 + c(w1,w2)), sort the per-doc list,
    // and fold the add-one-smoothed bits sequentially — identical
    // operation order, so the doubles agree to the rounded surface
    "text_perplexity" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents),
        |occ AS (SELECT doc_id, unnest(toks) AS token FROM t),
        |uni AS (SELECT token, count(*) AS cw FROM occ GROUP BY token),
        |voc AS (SELECT count(*) AS V FROM uni),
        |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)), i -> {'w1': toks[i], 'w2': toks[i+1]})) AS b
        |  FROM t WHERE len(toks) >= 2),
        |bgf AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
        |cbg AS (SELECT w1, w2, count(*) AS cbg FROM bgf GROUP BY w1, w2),
        |enc AS (SELECT doc_id, u.cw * 2147483648 + c.cbg AS e
        |  FROM bgf JOIN cbg c USING (w1, w2) JOIN uni u ON u.token = bgf.w1),
        |percy AS (SELECT doc_id, list_sort(list(e)) AS es FROM enc GROUP BY doc_id),
        |scored AS (SELECT doc_id, CAST(len(es) AS BIGINT) AS n_pairs,
        |    round(list_reduce(list_transform(es, e ->
        |      log2(CAST(e // 2147483648 + V AS DOUBLE)) -
        |      log2(CAST(e % 2147483648 + 1 AS DOUBLE))), (a, b) -> a + b) / len(es), 6) AS avg_bits
        |  FROM percy, voc)
        |SELECT d.doc_id, coalesce(s.n_pairs, 0) AS n_pairs, s.avg_bits,
        |  round(pow(2, s.avg_bits), 4) AS ppl
        |FROM documents d LEFT JOIN scored s USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    "text_tfidf" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents),
        |tfc AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM (
        |    SELECT doc_id, unnest(toks) AS token FROM t) GROUP BY doc_id, token),
        |dfc AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tfc GROUP BY token),
        |s AS (SELECT doc_id, token, tf, df,
        |    round(tf * ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / df), 6) AS tfidf
        |  FROM tfc JOIN dfc USING (token)),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token ASC) AS BIGINT) AS rank FROM s)
        |SELECT doc_id, rank, token, tf, df, tfidf
        |FROM r WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin,
    "quality_filter" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents),
        |m AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
        |    round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS distinct_ratio,
        |    round(CAST(list_max(list_transform(list_distinct(toks), tk -> len(list_filter(toks, x -> x = tk)))) AS DOUBLE) / len(toks), 6) AS top_token_ratio
        |  FROM t),
        |r AS (SELECT *, CASE WHEN n_words < 20 THEN 'too_short'
        |    WHEN distinct_ratio < 0.45 THEN 'low_diversity'
        |    WHEN top_token_ratio > 0.12 THEN 'repetitive' ELSE 'ok' END AS reason FROM m)
        |SELECT doc_id, n_words, distinct_ratio, top_token_ratio, reason, reason = 'ok' AS keep
        |FROM r ORDER BY doc_id""".stripMargin,
    "curate_e2e" ->
      """WITH t AS (SELECT doc_id, source, text,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |q AS (SELECT doc_id, source, text, toks, CAST(len(toks) AS BIGINT) AS n_tokens
        |  FROM t
        |  WHERE len(toks) >= 20
        |    AND round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) >= 0.45
        |    AND round(CAST(list_max(list_transform(list_distinct(toks),
        |      tk -> len(list_filter(toks, x -> x = tk)))) AS DOUBLE) / len(toks), 6) <= 0.12),
        |c AS (SELECT *, CASE WHEN trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) = ''
        |    THEN md5(text)
        |    ELSE md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) END AS canon_md5
        |  FROM q),
        |d AS (SELECT * FROM (SELECT *,
        |    row_number() OVER (PARTITION BY canon_md5 ORDER BY doc_id ASC) AS rn FROM c)
        |  WHERE rn = 1),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 2),
        |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3]))) AS s
        |  FROM t WHERE len(toks) >= 4),
        |cont AS (SELECT DISTINCT doc_id FROM (
        |    SELECT tr.doc_id, e.eval_doc_id
        |    FROM (SELECT doc_id, s FROM sh WHERE doc_id % 50 <> 0) tr
        |    JOIN (SELECT doc_id AS eval_doc_id, s FROM sh WHERE doc_id % 50 = 0) e USING (s)
        |    GROUP BY tr.doc_id, e.eval_doc_id HAVING count(*) >= 2)),
        |m AS (SELECT * FROM d
        |  WHERE doc_id % 50 <> 0 AND doc_id NOT IN (SELECT doc_id FROM cont)
        |    AND md5(CAST(doc_id AS VARCHAR)) <
        |      CASE CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) % 4
        |        WHEN 0 THEN '0d' WHEN 1 THEN '26' WHEN 2 THEN '59'
        |        ELSE 'c0' END),
        |p AS (SELECT source, doc_id, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM m)
        |SELECT source, doc_id, n_tokens,
        |  CAST((cum - n_tokens) // 2048 AS BIGINT) AS bin,
        |  CAST((cum - n_tokens) % 2048 AS BIGINT) AS bin_offset
        |FROM p ORDER BY source, doc_id""".stripMargin,
    // curate_e2e + the near-dup cluster stage on the banded scale
    // path: canon -> band-verified >=0.8 pairs among survivors ->
    // recursive closure -> component minima -> quality -> decontam ->
    // mixture -> pack (stage algebra shared with the standalone keys)
    "curate_full" ->
      """WITH RECURSIVE t AS (SELECT doc_id, source, text,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |c AS (SELECT *, CASE WHEN trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) = ''
        |    THEN md5(text)
        |    ELSE md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) END AS canon_md5
        |  FROM t),
        |d AS (SELECT * FROM (SELECT *,
        |    row_number() OVER (PARTITION BY canon_md5 ORDER BY doc_id ASC) AS rn FROM c)
        |  WHERE rn = 1),
        |sh3 AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS s
        |  FROM d WHERE len(toks) >= 3),
        |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh3 GROUP BY doc_id),
        |com AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
        |  FROM sh3 a JOIN sh3 b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |pairs AS (SELECT d1, d2 FROM com JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id
        |  WHERE round(CAST(common AS DOUBLE) / (c1.n_sh + c2.n_sh - common), 6) >= 0.8),
        |eg AS (SELECT d1 AS src, d2 AS dst FROM pairs UNION SELECT d2, d1 FROM pairs),
        |reach AS (SELECT src, dst FROM eg UNION SELECT r.src, e2.dst FROM reach r JOIN eg e2 ON r.dst = e2.src),
        |cl AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster FROM reach GROUP BY src),
        |reps AS (SELECT d.* FROM d LEFT JOIN cl ON d.doc_id = cl.doc_id
        |  WHERE coalesce(cl.cluster, d.doc_id) = d.doc_id),
        |q AS (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens
        |  FROM reps
        |  WHERE len(toks) >= 20
        |    AND round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) >= 0.45
        |    AND round(CAST(list_max(list_transform(list_distinct(toks),
        |      tk -> len(list_filter(toks, x -> x = tk)))) AS DOUBLE) / len(toks), 6) <= 0.12),
        |sh4 AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 2),
        |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3]))) AS s
        |  FROM t WHERE len(toks) >= 4),
        |cont AS (SELECT DISTINCT doc_id FROM (
        |    SELECT tr.doc_id, e.eval_doc_id
        |    FROM (SELECT doc_id, s FROM sh4 WHERE doc_id % 50 <> 0) tr
        |    JOIN (SELECT doc_id AS eval_doc_id, s FROM sh4 WHERE doc_id % 50 = 0) e USING (s)
        |    GROUP BY tr.doc_id, e.eval_doc_id HAVING count(*) >= 2)),
        |m AS (SELECT * FROM q
        |  WHERE doc_id % 50 <> 0 AND doc_id NOT IN (SELECT doc_id FROM cont)
        |    AND md5(CAST(doc_id AS VARCHAR)) <
        |      CASE CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) % 4
        |        WHEN 0 THEN '0d' WHEN 1 THEN '26' WHEN 2 THEN '59'
        |        ELSE 'c0' END),
        |p AS (SELECT source, doc_id, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM m)
        |SELECT source, doc_id, n_tokens,
        |  CAST((cum - n_tokens) // 2048 AS BIGINT) AS bin,
        |  CAST((cum - n_tokens) % 2048 AS BIGINT) AS bin_offset
        |FROM p ORDER BY source, doc_id""".stripMargin,
    // curate_full's chain with the scrub stage composed in: after the
    // doc-grain representatives (reps), cut every non-primary
    // duplicated 5-gram occurrence (the dedup_substring_apply CTEs
    // over the reps corpus), then the quality gate / token accounting
    // read the SCRUBBED token lists; decontamination stays on the raw
    // corpus (the conservative leak check)
    "curate_scrub" ->
      """WITH RECURSIVE t AS (SELECT doc_id, source, text,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |c AS (SELECT *, CASE WHEN trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) = ''
        |    THEN md5(text)
        |    ELSE md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) END AS canon_md5
        |  FROM t),
        |d AS (SELECT * FROM (SELECT *,
        |    row_number() OVER (PARTITION BY canon_md5 ORDER BY doc_id ASC) AS rn FROM c)
        |  WHERE rn = 1),
        |sh3 AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS s
        |  FROM d WHERE len(toks) >= 3),
        |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh3 GROUP BY doc_id),
        |com AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
        |  FROM sh3 a JOIN sh3 b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |pairs AS (SELECT d1, d2 FROM com JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id
        |  WHERE round(CAST(common AS DOUBLE) / (c1.n_sh + c2.n_sh - common), 6) >= 0.8),
        |eg AS (SELECT d1 AS src, d2 AS dst FROM pairs UNION SELECT d2, d1 FROM pairs),
        |reach AS (SELECT src, dst FROM eg UNION SELECT r.src, e2.dst FROM reach r JOIN eg e2 ON r.dst = e2.src),
        |cl AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster FROM reach GROUP BY src),
        |reps AS (SELECT d.* FROM d LEFT JOIN cl ON d.doc_id = cl.doc_id
        |  WHERE coalesce(cl.cluster, d.doc_id) = d.doc_id),
        |g5 AS (SELECT doc_id, gs.start AS start, gs.gram AS gram FROM (
        |    SELECT doc_id, unnest(list_transform(range(0, len(toks) - 5 + 1),
        |      s -> struct_pack(start := s, gram := array_to_string(toks[s + 1 : s + 5], ' ')))) AS gs
        |    FROM reps WHERE len(toks) >= 5)),
        |dup5 AS (SELECT gram FROM g5 GROUP BY gram HAVING count(*) >= 2),
        |occ5 AS (SELECT doc_id, start,
        |    row_number() OVER (PARTITION BY gram ORDER BY doc_id, start) = 1 AS is_primary
        |  FROM g5 WHERE gram IN (SELECT gram FROM dup5)),
        |cov5 AS (SELECT doc_id, unnest(generate_series(start, start + 4)) AS pos, is_primary FROM occ5),
        |cov6 AS (SELECT doc_id, pos, max(is_primary) AS primary_covered FROM cov5 GROUP BY doc_id, pos),
        |rp AS (SELECT doc_id, unnest(range(len(toks))) AS pos FROM reps),
        |rp2 AS (SELECT rp.doc_id, rp.pos, reps.toks[rp.pos + 1] AS tk FROM rp JOIN reps USING (doc_id)),
        |rj AS (SELECT rp2.doc_id, rp2.pos, rp2.tk,
        |    coalesce(NOT cov6.primary_covered, FALSE) AS removed
        |  FROM rp2 LEFT JOIN cov6 ON rp2.doc_id = cov6.doc_id AND rp2.pos = cov6.pos),
        |scr AS (SELECT reps.doc_id, reps.source,
        |    coalesce(kept.toks2, CAST([] AS VARCHAR[])) AS toks
        |  FROM reps LEFT JOIN (
        |    SELECT doc_id, list(tk ORDER BY pos) FILTER (WHERE NOT removed) AS toks2
        |    FROM rj GROUP BY doc_id) kept USING (doc_id)),
        |q AS (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens
        |  FROM scr
        |  WHERE len(toks) >= 20
        |    AND round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) >= 0.45
        |    AND round(CAST(list_max(list_transform(list_distinct(toks),
        |      tk -> len(list_filter(toks, x -> x = tk)))) AS DOUBLE) / len(toks), 6) <= 0.12),
        |sh4 AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 2),
        |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3]))) AS s
        |  FROM t WHERE len(toks) >= 4),
        |cont AS (SELECT DISTINCT doc_id FROM (
        |    SELECT tr.doc_id, e.eval_doc_id
        |    FROM (SELECT doc_id, s FROM sh4 WHERE doc_id % 50 <> 0) tr
        |    JOIN (SELECT doc_id AS eval_doc_id, s FROM sh4 WHERE doc_id % 50 = 0) e USING (s)
        |    GROUP BY tr.doc_id, e.eval_doc_id HAVING count(*) >= 2)),
        |m AS (SELECT * FROM q
        |  WHERE doc_id % 50 <> 0 AND doc_id NOT IN (SELECT doc_id FROM cont)
        |    AND md5(CAST(doc_id AS VARCHAR)) <
        |      CASE CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) % 4
        |        WHEN 0 THEN '0d' WHEN 1 THEN '26' WHEN 2 THEN '59'
        |        ELSE 'c0' END),
        |p AS (SELECT source, doc_id, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM m)
        |SELECT source, doc_id, n_tokens,
        |  CAST((cum - n_tokens) // 2048 AS BIGINT) AS bin,
        |  CAST((cum - n_tokens) % 2048 AS BIGINT) AS bin_offset
        |FROM p ORDER BY source, doc_id""".stripMargin,
    // the delivery curated incrementally: canonical first-wins over
    // the full corpus, near-dup pairs restricted to the delta's newer
    // side (the index's online policy — the newer member yields), then
    // curate_full's stages 3-6 over the delivery survivors only
    "curate_delta" ->
      """WITH t AS (SELECT doc_id, source, text,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |cut AS (SELECT max(doc_id) * 4 // 5 + 1 AS c FROM documents),
        |c AS (SELECT *, CASE WHEN trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) = ''
        |    THEN md5(text)
        |    ELSE md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) END AS canon_md5
        |  FROM t),
        |dk AS (SELECT * FROM (SELECT *,
        |    row_number() OVER (PARTITION BY canon_md5 ORDER BY doc_id ASC) AS rn FROM c)
        |  WHERE rn = 1 AND doc_id >= (SELECT c FROM cut)),
        |sh3 AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS s
        |  FROM t WHERE len(toks) >= 3),
        |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh3 GROUP BY doc_id),
        |com AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
        |  FROM sh3 a JOIN sh3 b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |drop2 AS (SELECT DISTINCT d2 AS doc_id
        |  FROM com JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id
        |  WHERE d2 >= (SELECT c FROM cut)
        |    AND round(CAST(common AS DOUBLE) / (c1.n_sh + c2.n_sh - common), 6) >= 0.8),
        |reps AS (SELECT * FROM dk WHERE doc_id NOT IN (SELECT doc_id FROM drop2)),
        |q AS (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens
        |  FROM reps
        |  WHERE len(toks) >= 20
        |    AND round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) >= 0.45
        |    AND round(CAST(list_max(list_transform(list_distinct(toks),
        |      tk -> len(list_filter(toks, x -> x = tk)))) AS DOUBLE) / len(toks), 6) <= 0.12),
        |sh4 AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 2),
        |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3]))) AS s
        |  FROM t WHERE len(toks) >= 4),
        |cont AS (SELECT DISTINCT doc_id FROM (
        |    SELECT tr.doc_id, e.eval_doc_id
        |    FROM (SELECT doc_id, s FROM sh4 WHERE doc_id % 50 <> 0) tr
        |    JOIN (SELECT doc_id AS eval_doc_id, s FROM sh4 WHERE doc_id % 50 = 0) e USING (s)
        |    GROUP BY tr.doc_id, e.eval_doc_id HAVING count(*) >= 2)),
        |m AS (SELECT * FROM q
        |  WHERE doc_id % 50 <> 0 AND doc_id NOT IN (SELECT doc_id FROM cont)
        |    AND md5(CAST(doc_id AS VARCHAR)) <
        |      CASE CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) % 4
        |        WHEN 0 THEN '0d' WHEN 1 THEN '26' WHEN 2 THEN '59'
        |        ELSE 'c0' END),
        |p AS (SELECT source, doc_id, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM m)
        |SELECT source, doc_id, n_tokens,
        |  CAST((cum - n_tokens) // 2048 AS BIGINT) AS bin,
        |  CAST((cum - n_tokens) % 2048 AS BIGINT) AS bin_offset
        |FROM p ORDER BY source, doc_id""".stripMargin,
    // curate_delta's chain with the scrub stage composed in: the base
    // gram set mirrors the PERSISTED store (all pre-cutoff docs'
    // 5-grams), delivery survivors are span-cleaned by the delta rule
    // (base-seen => cut; delivery-new duplicated => keep first), and
    // the quality gate / token accounting read the SCRUBBED lists
    "curate_scrub_delta" ->
      """WITH t AS (SELECT doc_id, source, text,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |cut AS (SELECT max(doc_id) * 4 // 5 + 1 AS c FROM documents),
        |c AS (SELECT *, CASE WHEN trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) = ''
        |    THEN md5(text)
        |    ELSE md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) END AS canon_md5
        |  FROM t),
        |dk AS (SELECT * FROM (SELECT *,
        |    row_number() OVER (PARTITION BY canon_md5 ORDER BY doc_id ASC) AS rn FROM c)
        |  WHERE rn = 1 AND doc_id >= (SELECT c FROM cut)),
        |sh3 AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS s
        |  FROM t WHERE len(toks) >= 3),
        |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh3 GROUP BY doc_id),
        |com AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
        |  FROM sh3 a JOIN sh3 b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |drop2 AS (SELECT DISTINCT d2 AS doc_id
        |  FROM com JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id
        |  WHERE d2 >= (SELECT c FROM cut)
        |    AND round(CAST(common AS DOUBLE) / (c1.n_sh + c2.n_sh - common), 6) >= 0.8),
        |reps AS (SELECT * FROM dk WHERE doc_id NOT IN (SELECT doc_id FROM drop2)),
        |bg AS (SELECT DISTINCT array_to_string(toks[s + 1 : s + 5], ' ') AS gram
        |  FROM (SELECT toks, unnest(range(0, len(toks) - 5 + 1)) AS s
        |        FROM t WHERE doc_id < (SELECT c FROM cut) AND len(toks) >= 5)),
        |g5 AS (SELECT doc_id, gs.start AS start, gs.gram AS gram FROM (
        |    SELECT doc_id, unnest(list_transform(range(0, len(toks) - 5 + 1),
        |      s -> struct_pack(start := s, gram := array_to_string(toks[s + 1 : s + 5], ' ')))) AS gs
        |    FROM reps WHERE len(toks) >= 5)),
        |ann AS (SELECT doc_id, start,
        |    gram IN (SELECT gram FROM bg) AS seen,
        |    row_number() OVER (PARTITION BY gram ORDER BY doc_id, start) AS rn,
        |    count(*) OVER (PARTITION BY gram) AS cnt
        |  FROM g5),
        |occ5 AS (SELECT doc_id, start, (NOT seen AND rn = 1) AS is_primary
        |  FROM ann WHERE seen OR cnt >= 2),
        |cov5 AS (SELECT doc_id, unnest(generate_series(start, start + 4)) AS pos, is_primary FROM occ5),
        |cov6 AS (SELECT doc_id, pos, max(is_primary) AS primary_covered FROM cov5 GROUP BY doc_id, pos),
        |rp AS (SELECT doc_id, unnest(range(len(toks))) AS pos FROM reps),
        |rp2 AS (SELECT rp.doc_id, rp.pos, reps.toks[rp.pos + 1] AS tk FROM rp JOIN reps USING (doc_id)),
        |rj AS (SELECT rp2.doc_id, rp2.pos, rp2.tk,
        |    coalesce(NOT cov6.primary_covered, FALSE) AS removed
        |  FROM rp2 LEFT JOIN cov6 ON rp2.doc_id = cov6.doc_id AND rp2.pos = cov6.pos),
        |scr AS (SELECT reps.doc_id, reps.source,
        |    coalesce(kept.toks2, CAST([] AS VARCHAR[])) AS toks
        |  FROM reps LEFT JOIN (
        |    SELECT doc_id, list(tk ORDER BY pos) FILTER (WHERE NOT removed) AS toks2
        |    FROM rj GROUP BY doc_id) kept USING (doc_id)),
        |q AS (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens
        |  FROM scr
        |  WHERE len(toks) >= 20
        |    AND round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) >= 0.45
        |    AND round(CAST(list_max(list_transform(list_distinct(toks),
        |      tk -> len(list_filter(toks, x -> x = tk)))) AS DOUBLE) / len(toks), 6) <= 0.12),
        |sh4 AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 2),
        |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3]))) AS s
        |  FROM t WHERE len(toks) >= 4),
        |cont AS (SELECT DISTINCT doc_id FROM (
        |    SELECT tr.doc_id, e.eval_doc_id
        |    FROM (SELECT doc_id, s FROM sh4 WHERE doc_id % 50 <> 0) tr
        |    JOIN (SELECT doc_id AS eval_doc_id, s FROM sh4 WHERE doc_id % 50 = 0) e USING (s)
        |    GROUP BY tr.doc_id, e.eval_doc_id HAVING count(*) >= 2)),
        |m AS (SELECT * FROM q
        |  WHERE doc_id % 50 <> 0 AND doc_id NOT IN (SELECT doc_id FROM cont)
        |    AND md5(CAST(doc_id AS VARCHAR)) <
        |      CASE CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) % 4
        |        WHEN 0 THEN '0d' WHEN 1 THEN '26' WHEN 2 THEN '59'
        |        ELSE 'c0' END),
        |p AS (SELECT source, doc_id, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM m)
        |SELECT source, doc_id, n_tokens,
        |  CAST((cum - n_tokens) // 2048 AS BIGINT) AS bin,
        |  CAST((cum - n_tokens) % 2048 AS BIGINT) AS bin_offset
        |FROM p ORDER BY source, doc_id""".stripMargin,
    "pii_redact" ->
      """WITH p AS (SELECT doc_id, text || CASE
        |    WHEN doc_id % 7 = 0 THEN ' contact user' || doc_id || '@example.com'
        |    WHEN doc_id % 7 = 3 THEN ' call 555-867-5309 or https://example.com/profile'
        |    ELSE '' END AS pii_text FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(pii_text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(pii_text, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(pii_text, 'https?://[^ ]+')) AS BIGINT) AS n_urls,
        |  md5(regexp_replace(regexp_replace(regexp_replace(pii_text,
        |    'https?://[^ ]+', '<URL>', 'g'),
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS redacted_md5
        |FROM p ORDER BY doc_id""".stripMargin,
    // drop-stage lineage: the oracle replays each stage's rule from its
    // own standalone oracle (quality reasons, canon rank among
    // survivors, the %50 split, shingle contamination, mixture
    // thresholds) and labels by the same first-hit-wins CASE
    "curate_audit" ->
      """WITH t AS (SELECT doc_id, source, text,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |r AS (SELECT doc_id, source, text, toks,
        |    CASE WHEN len(toks) < 20 THEN 'too_short'
        |      WHEN round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) < 0.45 THEN 'low_diversity'
        |      WHEN round(CAST(list_max(list_transform(list_distinct(toks),
        |        tk -> len(list_filter(toks, x -> x = tk)))) AS DOUBLE) / len(toks), 6) > 0.12 THEN 'repetitive'
        |      ELSE 'ok' END AS reason
        |  FROM t),
        |s AS (SELECT doc_id, row_number() OVER (PARTITION BY canon_md5 ORDER BY doc_id ASC) AS rn
        |  FROM (SELECT doc_id, CASE WHEN trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) = ''
        |      THEN md5(text)
        |      ELSE md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) END AS canon_md5
        |    FROM r WHERE reason = 'ok')),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 2),
        |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3]))) AS s
        |  FROM t WHERE len(toks) >= 4),
        |cont AS (SELECT DISTINCT doc_id FROM (
        |    SELECT tr.doc_id, e.eval_doc_id
        |    FROM (SELECT doc_id, s FROM sh WHERE doc_id % 50 <> 0) tr
        |    JOIN (SELECT doc_id AS eval_doc_id, s FROM sh WHERE doc_id % 50 = 0) e USING (s)
        |    GROUP BY tr.doc_id, e.eval_doc_id HAVING count(*) >= 2)),
        |lab AS (SELECT r.doc_id, r.source,
        |    CASE WHEN r.reason <> 'ok' THEN r.reason
        |      WHEN s.rn > 1 THEN 'duplicate'
        |      WHEN r.doc_id % 50 = 0 THEN 'eval_split'
        |      WHEN r.doc_id IN (SELECT doc_id FROM cont) THEN 'contaminated'
        |      WHEN md5(CAST(r.doc_id AS VARCHAR)) >=
        |        CASE CAST(regexp_extract(r.source, '([0-9]+)', 1) AS INT) % 4
        |          WHEN 0 THEN '0d' WHEN 1 THEN '26' WHEN 2 THEN '59'
        |          ELSE 'c0' END THEN 'mixture_sampled_out'
        |      ELSE 'kept' END AS stage
        |  FROM r LEFT JOIN s ON r.doc_id = s.doc_id)
        |SELECT doc_id, source, stage, stage = 'kept' AS kept
        |FROM lab ORDER BY doc_id""".stripMargin,
    // model-scoring inference: the oracle replays the hashed-feature
    // lookup and integer sum bit-for-bit (md5 leading byte = bucket)
    "quality_model_score" ->
      """WITH model AS (SELECT printf('%02x', i) AS bucket, CAST(i % 7 - 3 AS BIGINT) AS weight FROM range(256) t(i)),
        |tk AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS tok FROM documents),
        |f AS (SELECT doc_id, substr(md5(tok), 1, 2) AS bucket FROM tk)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
        |  CAST(sum(weight) AS BIGINT) AS score, sum(weight) > 0 AS keep
        |FROM f JOIN model USING (bucket) GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "decontaminate" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 2),
        |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3]))) AS s
        |  FROM t WHERE len(toks) >= 4),
        |e AS (SELECT doc_id AS eval_doc_id, s FROM sh WHERE doc_id % 50 = 0),
        |tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 50 <> 0)
        |SELECT tr.doc_id, e.eval_doc_id, CAST(count(*) AS BIGINT) AS n_overlap
        |FROM tr JOIN e USING (s) GROUP BY tr.doc_id, e.eval_doc_id
        |HAVING count(*) >= 2 ORDER BY tr.doc_id, e.eval_doc_id""".stripMargin,
    "decontaminate_semantic" ->
      """WITH ev AS (SELECT vec_id AS eval_id, CAST(embedding AS DOUBLE[]) AS ev
        |  FROM embeddings WHERE vec_id % 97 = 0),
        |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id % 97 <> 0)
        |SELECT c.vec_id, ev.eval_id,
        |  round(list_cosine_similarity(c.v, ev.ev), 4) AS cos
        |FROM c CROSS JOIN ev
        |WHERE round(list_cosine_similarity(c.v, ev.ev), 4) >= 0.35
        |ORDER BY vec_id, eval_id""".stripMargin,
    "dedup_levenshtein" ->
      """WITH t AS (SELECT doc_id, text, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents),
        |sh0 AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS shingle
        |  FROM t WHERE len(toks) >= 3),
        |sh AS (SELECT * FROM sh0 WHERE shingle NOT IN (
        |    SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > 1000)),
        |cand AS (SELECT a.doc_id AS d1, b.doc_id AS d2
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |ld AS (SELECT d1, d2, levenshtein(t1.text, t2.text) AS dist,
        |    greatest(len(t1.text), len(t2.text)) AS maxlen
        |  FROM cand JOIN t t1 ON d1 = t1.doc_id JOIN t t2 ON d2 = t2.doc_id)
        |SELECT d1, d2, CAST(dist AS BIGINT) AS dist,
        |  round(CAST(dist AS DOUBLE) / maxlen, 6) AS rel_dist
        |FROM ld WHERE dist <= 0.2 * maxlen
        |ORDER BY d1, d2""".stripMargin,
    // star-bounded edit-distance twin: candidates and the re-derived
    // minShared floor are pair-identical to dedup_levenshtein at
    // fixture DFs (all postings under the 32-pair cap), so the SAME
    // exact oracle hash-gates it
    "dedup_lev_star" ->
      """WITH t AS (SELECT doc_id, text, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents),
        |sh0 AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS shingle
        |  FROM t WHERE len(toks) >= 3),
        |sh AS (SELECT * FROM sh0 WHERE shingle NOT IN (
        |    SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > 1000)),
        |cand AS (SELECT a.doc_id AS d1, b.doc_id AS d2
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |ld AS (SELECT d1, d2, levenshtein(t1.text, t2.text) AS dist,
        |    greatest(len(t1.text), len(t2.text)) AS maxlen
        |  FROM cand JOIN t t1 ON d1 = t1.doc_id JOIN t t2 ON d2 = t2.doc_id)
        |SELECT d1, d2, CAST(dist AS BIGINT) AS dist,
        |  round(CAST(dist AS DOUBLE) / maxlen, 6) AS rel_dist
        |FROM ld WHERE dist <= 0.2 * maxlen
        |ORDER BY d1, d2""".stripMargin,
    "dedup_lev_curated" ->
      """WITH k AS (SELECT doc_id, text,
        |    CASE WHEN trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) = ''
        |      THEN md5(text)
        |      ELSE md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) END AS ck
        |  FROM documents),
        |s AS (SELECT doc_id, text FROM (SELECT doc_id, text,
        |    row_number() OVER (PARTITION BY ck ORDER BY doc_id ASC) AS rn FROM k) WHERE rn = 1),
        |t AS (SELECT doc_id, text, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM s),
        |sh0 AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS shingle
        |  FROM t WHERE len(toks) >= 3),
        |sh AS (SELECT * FROM sh0 WHERE shingle NOT IN (
        |    SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > 1000)),
        |cand AS (SELECT a.doc_id AS d1, b.doc_id AS d2
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |ld AS (SELECT d1, d2, levenshtein(t1.text, t2.text) AS dist,
        |    greatest(len(t1.text), len(t2.text)) AS maxlen
        |  FROM cand JOIN t t1 ON d1 = t1.doc_id JOIN t t2 ON d2 = t2.doc_id)
        |SELECT d1, d2, CAST(dist AS BIGINT) AS dist,
        |  round(CAST(dist AS DOUBLE) / maxlen, 6) AS rel_dist
        |FROM ld WHERE dist <= 0.2 * maxlen
        |ORDER BY d1, d2""".stripMargin,
    "dedup_cluster" ->
      """WITH RECURSIVE t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents),
        |sh0 AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS shingle
        |  FROM t WHERE len(toks) >= 3),
        |sh AS (SELECT * FROM sh0 WHERE shingle NOT IN (
        |    SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > 1000)),
        |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |com AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |pairs AS (SELECT d1, d2 FROM com JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id
        |  WHERE round(CAST(common AS DOUBLE) / (c1.n_sh + c2.n_sh - common), 6) >= 0.3),
        |e AS (SELECT d1 AS src, d2 AS dst FROM pairs UNION SELECT d2, d1 FROM pairs),
        |reach AS (SELECT src, dst FROM e UNION SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
        |cl AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster FROM reach GROUP BY src),
        |m AS (SELECT d.doc_id, coalesce(cl.cluster, d.doc_id) AS cluster
        |  FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id),
        |s AS (SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size FROM m GROUP BY cluster)
        |SELECT m.doc_id, m.cluster, s.cluster_size, m.doc_id = m.cluster AS is_canonical
        |FROM m JOIN s USING (cluster) ORDER BY m.doc_id""".stripMargin,
    // closure over the exact-Jaccard >= 0.8 pair set on the FULL
    // shingle space (no DF cap — minhash's verify space; banding's
    // completeness at 0.8 is the hash-green dedup_minhash_recall
    // contract, which is what licenses a full hash gate here)
    "dedup_cluster_minhash" ->
      """WITH RECURSIVE t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS shingle
        |  FROM t WHERE len(toks) >= 3),
        |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |com AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |pairs AS (SELECT d1, d2 FROM com JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id
        |  WHERE round(CAST(common AS DOUBLE) / (c1.n_sh + c2.n_sh - common), 6) >= 0.8),
        |e AS (SELECT d1 AS src, d2 AS dst FROM pairs UNION SELECT d2, d1 FROM pairs),
        |reach AS (SELECT src, dst FROM e UNION SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
        |cl AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster FROM reach GROUP BY src),
        |m AS (SELECT d.doc_id, coalesce(cl.cluster, d.doc_id) AS cluster
        |  FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id),
        |s AS (SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size FROM m GROUP BY cluster)
        |SELECT m.doc_id, m.cluster, s.cluster_size, m.doc_id = m.cluster AS is_canonical
        |FROM m JOIN s USING (cluster) ORDER BY m.doc_id""".stripMargin,
    // the same >= 0.8 closure, then the quality window: keep the
    // longest member (token count, ties to lowest doc_id) per cluster;
    // linked subgraph only — the drop list a curation anti-join uses
    "dedup_keep_best" ->
      """WITH RECURSIVE t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS shingle
        |  FROM t WHERE len(toks) >= 3),
        |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |com AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |pairs AS (SELECT d1, d2 FROM com JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id
        |  WHERE round(CAST(common AS DOUBLE) / (c1.n_sh + c2.n_sh - common), 6) >= 0.8),
        |e AS (SELECT d1 AS src, d2 AS dst FROM pairs UNION SELECT d2, d1 FROM pairs),
        |reach AS (SELECT src, dst FROM e UNION SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
        |cl AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster FROM reach GROUP BY src),
        |q AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks FROM t),
        |m AS (SELECT cl.doc_id, cl.cluster, q.n_toks FROM cl JOIN q USING (doc_id)),
        |b AS (SELECT cluster, doc_id AS keep_id FROM (
        |    SELECT cluster, doc_id, row_number() OVER (PARTITION BY cluster ORDER BY n_toks DESC, doc_id ASC) AS rn FROM m)
        |  WHERE rn = 1),
        |s AS (SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size FROM m GROUP BY cluster)
        |SELECT m.doc_id, m.cluster, b.keep_id, m.doc_id = b.keep_id AS kept, s.cluster_size
        |FROM m JOIN b USING (cluster) JOIN s USING (cluster) ORDER BY m.doc_id""".stripMargin,
    // incremental-index delta dedup: exact-Jaccard >= 0.8 pairs whose
    // newer side is in the delta (newest ~20% of doc_ids — the same
    // cutoff rule as the engine, integer-division parity via //); the
    // banding-completeness license is dedup_cluster_minhash's
    "dedup_minhash_delta" -> minhashDeltaOracle,
    // identical output contract to dedup_minhash_delta: the streamed
    // appendOnce maintenance yields a bit-identical persisted index
    "stream_index_delta" -> minhashDeltaOracle,
    // the compacted chain must serve bit-identical content: same oracle
    "index_compact_check" -> minhashDeltaOracle,
    "dedup_embedding" ->
      """SELECT a.vec_id AS v1, b.vec_id AS v2,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) AS cos
        |FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) >= 0.35
        |ORDER BY v1, v2""".stripMargin,
    // SemDeDup twin: same deterministic seeding (vec_id < 8), same
    // rounded-cosine argmax with cid tie-break, same keep-first rule
    "dedup_semantic" ->
      """WITH cents AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8),
        |assigned AS (
        |  SELECT e.vec_id, e.embedding, c.cid,
        |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(c.cvec AS DOUBLE[])), 4) AS ccos
        |  FROM embeddings e CROSS JOIN cents c),
        |best AS (
        |  SELECT vec_id, embedding, cid FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
        |    FROM assigned) WHERE rn = 1)
        |SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cluster,
        |  EXISTS(SELECT 1 FROM best b WHERE b.cid = a.cid AND b.vec_id < a.vec_id
        |    AND round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) >= 0.35) AS is_dup
        |FROM best a ORDER BY vec_id""".stripMargin,
    "similarity_topk" ->
      """SELECT query_id, rank, neighbor_id, cos FROM (
        |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
        |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 4) AS cos,
        |    CAST(row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 4) DESC, e.vec_id ASC) AS BIGINT) AS rank
        |  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
        |  WHERE q.vec_id < 10) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "multimodal_frames" ->
      """WITH m AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n_bytes,
        |    CAST(length(text) AS BIGINT) % 30 + 1 AS n_frames FROM documents),
        |f AS (SELECT doc_id, text, (n_bytes + n_frames - 1) // n_frames AS frame_size,
        |    unnest(range(0, n_frames)) AS frame_idx FROM m)
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  md5(substring(text, CAST(frame_idx * frame_size + 1 AS INT), CAST(frame_size AS INT))) AS frame_md5
        |FROM f WHERE frame_idx % 2 = 0 ORDER BY doc_id, frame_idx""".stripMargin,
    // container-derived metadata replayed from the shared formulas;
    // the JPEG pixel stage is the tolerance boolean (lossy codec —
    // the videoRoundtrip hash-gate pattern at the keyframe grain)
    "multimodal_video_mp4" ->
      """WITH m AS (SELECT doc_id, doc_id % 4 + 2 AS nf, doc_id % 6 + 6 AS w,
        |    doc_id % 3 + 6 AS h FROM documents),
        |f AS (SELECT doc_id, w, h, nf, unnest(range(0, nf)) AS frame_idx FROM m)
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(nf AS BIGINT) AS n_samples, TRUE AS sync_ok
        |FROM f WHERE frame_idx % 2 = 0 ORDER BY doc_id, frame_idx""".stripMargin,
    "multimodal_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(octet_length(encode(text)) AS BIGINT) % 640 AS width,
        |  CAST(octet_length(encode(text)) AS BIGINT) * 7 % 480 AS height,
        |  CAST(octet_length(encode(text)) AS BIGINT) % 30 + 1 AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_features" ->
      """WITH l AS (SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |    list_transform(range(0, 8), j -> CAST(coalesce(list_sum(list_transform(
        |      list_filter(range(1, length(text) + 1), p -> (p - 1) % 8 = j),
        |      p -> ascii(substring(text, p, 1)))), 0) AS BIGINT)) AS lanes
        |  FROM documents)
        |SELECT doc_id, n_bytes,
        |  round(sqrt(CAST(list_sum(list_transform(lanes, x -> x * x)) AS DOUBLE)) / 255.0, 6) AS feature_norm,
        |  md5(array_to_string(lanes, ' ')) AS lane_digest
        |FROM l ORDER BY doc_id""".stripMargin,
    "multimodal_resize" ->
      """WITH s AS (SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |    list_transform(range(0, 4), i -> CAST(coalesce(list_sum(list_transform(
        |      list_filter(range(1, length(text) + 1), p -> ((p - 1) % 8) // 2 = i),
        |      p -> ascii(substring(text, p, 1)))), 0) AS BIGINT)) AS psums
        |  FROM documents)
        |SELECT doc_id, n_bytes,
        |  round(CAST(psums[1] AS DOUBLE) / 510.0, 6) AS pooled_0,
        |  round(CAST(psums[2] AS DOUBLE) / 510.0, 6) AS pooled_1,
        |  round(CAST(psums[3] AS DOUBLE) / 510.0, 6) AS pooled_2,
        |  round(CAST(psums[4] AS DOUBLE) / 510.0, 6) AS pooled_3,
        |  md5(array_to_string(psums, ' ')) AS resize_digest
        |FROM s ORDER BY doc_id""".stripMargin,
    // the oracle recomputes the roundtrip fixture's pixels from the
    // SHARED formula alone — the Spark side must recover exactly these
    // values out of a real PNG container for the hash to match
    "multimodal_decode" ->
      """WITH g AS (SELECT doc_id, doc_id % 16 + 8 AS w, doc_id % 8 + 8 AS h FROM documents),
        |d AS (SELECT doc_id, w, h,
        |    list_transform(range(0, 8), j -> CAST(coalesce(list_sum(list_transform(
        |      list_filter(range(0, w * h), i -> i % 8 = j),
        |      i -> (doc_id * 31 + (i % w) * 7 + (i // w) * 13) % 256)), 0) AS BIGINT)) AS lanes
        |  FROM g)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  md5(array_to_string(lanes, ' ')) AS decoded_lane_digest
        |FROM d ORDER BY doc_id""".stripMargin,
    // the audio twin of multimodal_decode: the oracle recomputes the
    // WAV fixture's interleaved PCM samples and container metadata from
    // the SHARED formulas alone — the Spark side must recover exactly
    // these values out of a real RIFF/WAVE container
    "multimodal_audio" ->
      """WITH g AS (SELECT doc_id, doc_id % 2 + 1 AS ch,
        |    (doc_id % 64 + 32) * (doc_id % 2 + 1) AS n,
        |    8000 + (doc_id % 3) * 4000 AS rate FROM documents),
        |d AS (SELECT doc_id, ch, n, rate,
        |    list_transform(range(0, 8), j -> CAST(coalesce(list_sum(list_transform(
        |      list_filter(range(0, n), i -> i % 8 = j),
        |      i -> (doc_id * 37 + i * 11) % 4096 - 2048)), 0) AS BIGINT)) AS lanes
        |  FROM g)
        |SELECT doc_id, CAST(rate AS BIGINT) AS sample_rate,
        |  CAST(ch AS BIGINT) AS channels, CAST(n AS BIGINT) AS n_samples,
        |  md5(array_to_string(lanes, ' ')) AS decoded_sample_digest
        |FROM d ORDER BY doc_id""".stripMargin,
    // real pixel-space resize: the oracle recomputes the 2x2 integer
    // average-pool from the shared pixel formula alone — the Spark side
    // must reproduce it from a decoded real PNG raster
    "multimodal_resize_real" ->
      """WITH g AS (SELECT doc_id, (doc_id % 8 + 4) * 2 AS w, (doc_id % 4 + 4) * 2 AS h FROM documents),
        |d AS (SELECT doc_id, w // 2 AS w2, h // 2 AS h2,
        |    list_transform(range(0, 8), j -> CAST(coalesce(list_sum(list_transform(
        |      list_filter(range(0, (w // 2) * (h // 2)), i -> i % 8 = j),
        |      i -> ((doc_id * 31 + (2 * (i % (w // 2))) * 7 + (2 * (i // (w // 2))) * 13) % 256
        |          + (doc_id * 31 + (2 * (i % (w // 2)) + 1) * 7 + (2 * (i // (w // 2))) * 13) % 256
        |          + (doc_id * 31 + (2 * (i % (w // 2))) * 7 + (2 * (i // (w // 2)) + 1) * 13) % 256
        |          + (doc_id * 31 + (2 * (i % (w // 2)) + 1) * 7 + (2 * (i // (w // 2)) + 1) * 13) % 256) // 4)), 0) AS BIGINT)) AS lanes
        |  FROM g)
        |SELECT doc_id, CAST(w2 AS BIGINT) AS out_w, CAST(h2 AS BIGINT) AS out_h,
        |  md5(array_to_string(lanes, ' ')) AS pooled_lane_digest
        |FROM d ORDER BY doc_id""".stripMargin,
    // windowed audio frames: the oracle recomputes each 16-sample
    // window's exact integer energy and peak from the shared waveform
    // formula — the Spark side must reproduce them from decoded WAV
    "multimodal_audio_frames" ->
      """WITH g AS (SELECT doc_id, (doc_id % 64 + 32) * (doc_id % 2 + 1) AS n FROM documents),
        |f AS (SELECT doc_id, n, UNNEST(range(0, (n + 15) // 16)) AS frame_idx FROM g),
        |e AS (SELECT doc_id, frame_idx,
        |    list_transform(range(frame_idx * 16, least((frame_idx + 1) * 16, n)),
        |      i -> (doc_id * 37 + i * 11) % 4096 - 2048) AS s
        |  FROM f)
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(len(s) AS BIGINT) AS frame_len,
        |  CAST(coalesce(list_sum(list_transform(s, x -> x * x)), 0) AS BIGINT) AS energy,
        |  CAST(coalesce(list_max(list_transform(s, x -> abs(x))), 0) AS BIGINT) AS peak
        |FROM e ORDER BY doc_id, frame_idx""".stripMargin,
    // animated-GIF frame extraction: the oracle recomputes every
    // frame's lane sums from the shared per-frame pixel formula — the
    // Spark side must recover them from a real multi-frame container
    "multimodal_video" ->
      """WITH g AS (SELECT doc_id, doc_id % 4 + 2 AS F, doc_id % 6 + 6 AS w, doc_id % 3 + 6 AS h FROM documents),
        |fr AS (SELECT doc_id, w, h, UNNEST(range(0, F)) AS frame_idx FROM g),
        |d AS (SELECT doc_id, frame_idx, w, h,
        |    list_transform(range(0, 8), j -> CAST(coalesce(list_sum(list_transform(
        |      list_filter(range(0, w * h), i -> i % 8 = j),
        |      i -> (doc_id * 31 + frame_idx * 41 + (i % w) * 7 + (i // w) * 13) % 256)), 0) AS BIGINT)) AS lanes
        |  FROM fr)
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  md5(array_to_string(lanes, ' ')) AS frame_digest
        |FROM d ORDER BY doc_id, frame_idx""".stripMargin)
}
