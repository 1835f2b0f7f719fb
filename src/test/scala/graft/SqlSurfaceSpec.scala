package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.core.Tables

/** The SQL surface — the full triangle (r14 verdict task 5): every
  * `SparkEntry.oracleSql` text is already hash-green on DuckDB vs the
  * DataFrame form; this suite sweeps ALL of them through Spark's OWN
  * SQL engine (views via Tables.registerAll) and requires agreement
  * with the DataFrame form — a third dialect cross-check, and proof
  * the engine serves spark.sql users across the whole portable
  * surface, not a hand-picked sample.
  *
  * Keys written in DuckDB dialect (list_* functions, unnest over
  * lists, struct_pack, generate_series-as-list, quantile_cont,
  * epoch_us, time_bucket, ASOF JOIN, regexp_replace 'g' flags,
  * regexp_matches, grouping(a,b), 4-arg encode, json_extract_string)
  * cannot run on spark.sql BY CONSTRUCTION — DuckDB alone covers
  * those. They are enumerated below and ASSERTED TO FAIL, so the
  * exclusion list can never silently absorb a portable key that
  * regresses: a key leaving the dialect (or a Spark release learning
  * a function) flips the assertion and forces the list update.
  *
  * Timestamp normalization: spark.sql resolves `CAST(x AS TIMESTAMP)`
  * to TIMESTAMP_LTZ where the DataFrame surface standardizes on NTZ;
  * in the UTC session the instants are identical and only the
  * renderer differs, so BOTH sides are normalized to NTZ before
  * comparing — a genuine value difference still fails. */
class SqlSurfaceSpec extends SparkSuite {

  /** DuckDB-dialect keys — do not run on spark.sql (verified by the
    * sweep itself). */
  private val duckdbOnly: Set[String] = Set(
    "agg_countmin_bound", "agg_grouping_id", "agg_heavy_hitters",
    "agg_percentile", "array_funcs", "corpus_dup_rate",
    "corpus_melt", "corpus_stats", "curate_audit",
    "curate_budget", "curate_delta", "curate_e2e",
    "curate_full", "curate_scrub", "curate_scrub_delta",
    "date_arith_funcs", "decontaminate", "decontaminate_semantic",
    "audio_drift_check", "video_drift_check",
    "dedup_audio", "dedup_audio_delta", "dedup_canonical", "dedup_chunks",
    "dedup_chunks_delta", "dedup_cluster",
    "dedup_cluster_minhash", "dedup_embedding", "dedup_keep_best",
    "dedup_lev_curated", "dedup_lev_star", "dedup_levenshtein",
    "dedup_minhash_delta", "dedup_minhash_recall", "dedup_ngram",
    "dedup_phash_delta", "phash_drift_check",
    "dedup_ngram_star", "dedup_phash", "dedup_semantic",
    "dedup_substring", "dedup_substring_apply", "dedup_substring_delta",
    "stream_substring_delta",
    "dedup_video", "dedup_video_delta",
    "stream_audio_delta", "stream_video_delta",
    "dedup_winnow", "doc_chunk", "doc_tokens_pos",
    "embed_pca2", "embed_power_iter", "embed_quantize",
    "events_date_parts", "events_gapfill", "events_props",
    "higher_order_funcs", "index_compact_check", "index_drift_check",
    "index_retrain_apply", "pq_drift_check", "pq_retrain_apply",
    "vocab_retrain_apply", "mix_budget_plan",
    "join_asof", "join_asof_forward",
    "join_asof_tolerance", "map_funcs", "multimodal_audio",
    "multimodal_audio_frames", "multimodal_decode", "multimodal_features",
    "multimodal_frames", "multimodal_meta", "multimodal_resize",
    "multimodal_resize_real", "multimodal_video", "multimodal_video_mp4",
    "pack_sequences", "pii_redact", "profile_drift",
    "profile_merge", "profile_table", "quality_filter",
    "quality_model_score", "regexp_funcs", "sample_hash",
    "sample_importance", "sample_mixture", "sample_stratified",
    "search_partial_regex", "set_union_byname", "similarity_topk",
    "skew_report", "stream_dedup_minhash", "stream_heavy_hitters",
    "stream_profile_drift", "stream_session", "stream_session_tracker",
    "stream_session_window", "stream_session_window_restart",
    "stream_index_delta", "stream_chunks_delta", "stream_vocab_delta",
    "stream_phash_delta",
    "stream_sliding", "text_bm25", "text_fingerprint", "text_langid",
    "text_novelty", "text_perplexity", "text_repetition",
    "text_stats", "text_surprisal", "text_tfidf",
    "text_tokens", "text_winnow", "try_funcs",
    "variant_funcs", "variant_safe", "vocab_coverage", "vocab_drift_check",
    "window_lag", "window_range")

  /** NTZ-normalized, column-name-sorted row strings (the driver's
    * compare normalizes column ORDER by name; both forms here already
    * agree on names, so sorting rows suffices). */
  private def normalized(df: DataFrame): Seq[String] = {
    val cols = df.schema.fields.map { f =>
      if (f.dataType == TimestampType)
        col(f.name).cast(TimestampNTZType).as(f.name)
      else col(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
      .collect().map(_.toString).sorted.toSeq
  }

  test("full sweep: every portable oracle SQL runs on spark.sql and " +
      "matches the DataFrame form; every excluded key genuinely fails") {
    val dir = TestSpark.sfDir
    Tables.registerAll(spark, dir)
    val keys = SparkEntry.oracleSql.keys.toSeq.sorted
    val unknownExclusions = duckdbOnly -- keys.toSet
    assert(unknownExclusions.isEmpty,
      s"exclusion list names unknown keys: $unknownExclusions")
    val problems = keys.flatMap { k =>
      val sqlResult =
        try Right(normalized(spark.sql(SparkEntry.oracleSql(k))))
        catch { case e: Throwable => Left(e) }
      (duckdbOnly(k), sqlResult) match {
        case (true, Left(_)) => None // dialect key, fails as expected
        case (true, Right(_)) => Some(
          s"$k: marked DuckDB-only but RUNS on spark.sql — " +
          "promote it to the portable surface")
        case (false, Left(e)) => Some(
          s"$k: portable key failed on spark.sql: " +
          String.valueOf(e.getMessage).linesIterator
            .find(_.nonEmpty).getOrElse(e.getClass.getName))
        case (false, Right(viaSql)) =>
          val viaDf = normalized(SparkEntry.queries(k)(spark, dir))
          if (viaSql == viaDf) None
          else Some(s"$k: spark.sql != DataFrame form " +
            s"(${viaSql.size} vs ${viaDf.size} rows)")
      }
    }
    assert(problems.isEmpty, problems.mkString("\n"))
    val portable = keys.count(k => !duckdbOnly(k))
    assert(portable >= 80,
      s"portable surface shrank to $portable keys")
  }
}
