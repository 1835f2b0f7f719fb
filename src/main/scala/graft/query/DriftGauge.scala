package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE copy of the retrain-gauge flag algebra shared by every
  * frozen-store drift panel — [[IndexDrift]] (embedding index),
  * [[TextQuality.vocabDriftOf]] (tokenizer vocabulary), and
  * [[graft.multimodal.Phash.bitDriftOf]] (perceptual fingerprints,
  * which AudioFp/VideoFp reuse). The algebra was previously written
  * out at each site; a fourth drift family would have forked it again
  * (r17 verdict finding #3). The semantics are pinned by the five
  * hash-gated gauge keys (`index_drift_check`, `index_retrain_apply`,
  * `vocab_drift_check`, `vocab_retrain_apply`, `phash_drift_check`) —
  * all unchanged by the extraction. */
object DriftGauge {

  /** Occupancy-shift flag: |delta_share − base_share| > 5%, evaluated
    * WITHOUT division as |n_delta·T_base − n_base·T_delta| · 20 >
    * T_base · T_delta in exact wide-integer arithmetic (Spark
    * DECIMAL(38,0), DuckDB HUGEINT — both exact far past any physical
    * corpus; plain BIGINT would silently wrap in Spark's non-ANSI mode
    * once the cross-product passes ~3e9² while DuckDB raises,
    * diverging the engines). */
  def occShift(nDelta: Column, nBase: Column, tDelta: Column,
      tBase: Column): Column =
    abs(nDelta.cast("decimal(38,0)") * tBase -
        nBase.cast("decimal(38,0)") * tDelta) * 20 >
      tBase.cast("decimal(38,0)") * tDelta

  /** Rounded-ratio rate with the empty-delivery guard: den = 0 (the
    * retrained arm's empty delta) must not hit IEEE 0/0 — engines
    * disagree there — so it reads 0.0 by convention. */
  def safeRate(num: Column, den: Column): Column =
    when(den === 0, lit(0.0))
      .otherwise(round(num.cast("double") / den, 6))
}
