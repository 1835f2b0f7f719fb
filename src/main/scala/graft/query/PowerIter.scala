package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Distributed power iteration over the embeddings table in EXACT
  * integer arithmetic — the bootstrap step of PCA/whitening at corpus
  * scale (two matvec passes toward the dominant eigenvector of the
  * un-centered second-moment matrix), kept bit-identical across
  * engines so the result sits under the DuckDB hash gate like any
  * exact key.
  *
  * Determinism design: floating-point matvecs are order-sensitive
  * under distributed aggregation, so everything is integers —
  * embeddings quantize scan-side via `floor(x · 10⁴)` (floor, not
  * cast: DuckDB's double→int cast rounds where the JVM's truncates),
  * each pass's result renormalizes to the fixed target `|r| ≤ 1024` by
  * exact truncated division (JVM `/` and DuckDB `//` both truncate
  * toward zero — verified), and every sum is a LONG sum, associative
  * and order-free.
  *
  * Magnitude bound (the n ceiling of the fixed target): per pass
  * |y[d]| ≤ n · qmax² · 64 · 1024, which the operator REQUIRES to be
  * under Long.MaxValue with 2× margin at run time — at the fixture's
  * qmax ≈ 6·10³ that allows n ≈ 2M vectors; beyond that lower the
  * renormalization target (one knob) or shard-and-merge. The renorm
  * step's ×Target multiply is exempt from this bound — it runs in
  * BigInt/HUGEINT on both engines, so the matvec pass is the only
  * overflow surface the guard must cover.
  *
  * Shape at scale: each pass is one projected scan (quantize +
  * per-row dot against a BROADCAST 64-long direction literal — pure
  * codegen'd array algebra) and one 64-group aggregate with map-side
  * partial sums; the direction vector between passes is a model
  * scalar (the IVF-centroid precedent). Nothing is pairwise, nothing
  * shuffles more than 64 · partitions partial rows. */
object PowerIter {

  private val Dim = 64
  private val Quant = 10000L
  private val Target = 1024L

  /** One exact-integer matvec: y[d] = Σ_i q_i[d] · (q_i · v). */
  private def matvec(q: DataFrame, v: Array[Long]): Array[Long] = {
    val vLit = v.mkString("array(", "L, ", "L)")
    val y = q
      .withColumn("dot", expr(
        s"aggregate(zip_with(q, $vLit, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
      .select(posexplode(expr("transform(q, x -> x * dot)"))
        .as(Seq("d", "w")))
      .groupBy("d").agg(sum("w").as("y"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    Array.tabulate(Dim)(d => y.getOrElse(d, 0L))
  }

  /** Renormalize to |r| ≤ Target by truncated division — the exact
    * operation DuckDB's `//` performs, so the oracle mirrors it. The
    * v·Target product runs through BigInt (oracle: HUGEINT) so renorm
    * itself can never overflow — a matvec result near the guard's
    * Long bound would otherwise wrap silently in the ×Target multiply
    * while DuckDB raised; the quotient is ≤ Target by construction and
    * always fits back into a Long. */
  private def renorm(y: Array[Long]): Array[Long] = {
    val m = y.map(math.abs).max
    require(m > 0, "degenerate corpus: zero matvec")
    val mb = BigInt(m)
    y.map(v => (BigInt(v) * Target / mb).toLong)
  }

  // NOT fanOut (r20 measured ×1.46/×1.17 WITH it on power_iter/pca2):
  // the matvec passes are model-grain collects over a small cached
  // frame — 32 near-empty cached partitions tax every pass with task
  // launches that outweigh the single-task scan they replace. At real
  // n the embeddings table has many splits and the cache is parallel
  // without help.
  private def quantized(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .select(expr(
        s"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $Quant) AS BIGINT))")
        .as("q"))

  /** Overflow guard for a matvec pass over `q`-column rows whose
    * entries are bounded by `qmax` (2× Long margin). */
  private def guardPass(q: DataFrame, qmax: Long): Unit = {
    val n = q.count()
    require(qmax > 0, "degenerate corpus: all-zero vectors")
    require(n <= Long.MaxValue / 2 / qmax / qmax / Dim / Target,
      s"n=$n qmax=$qmax would overflow the fixed $Target target — " +
        "lower the renormalization target")
  }

  private val start = Array.tabulate(Dim)(d => (d % 7 - 3).toLong)

  /** Two power-iteration steps over `q` from the fixed start. */
  private def dominantOf(q: DataFrame): Array[Long] =
    renorm(matvec(q, renorm(matvec(q, start))))

  /** Two power-iteration steps from the fixed start s[d] = d%7 − 3;
    * output: the renormalized direction after pass 2, one row per
    * dimension — 64 exact integers, hash-compared against DuckDB
    * running the identical integer algebra. */
  def embedPowerIter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val q = quantized(spark, dir).cache()
    try {
      val qmax = q.agg(max(expr("array_max(transform(q, x -> abs(x)))")))
        .first().getLong(0)
      guardPass(q, qmax)
      dominantOf(q).zipWithIndex
        .map { case (v, d) => (d.toLong, v) }.toSeq
        .toDF("dim", "component_q")
        .orderBy("dim")
    } finally q.unpersist()
  }

  /** The SECOND principal direction by exact-integer deflation — the
    * step that turns the power-iteration primitive into top-k PCA,
    * still bit-identical across engines. Deflation avoids division
    * entirely: q′ᵢ = qᵢ·(r·r) − (qᵢ·r)·r (exact longs, orthogonal to
    * the first direction r by construction), then scales back into the
    * pass-safe range by a SIGN-SYMMETRIC right shift whose width is
    * derived from the matrix's own max magnitude by integer-only
    * comparison (no float log — a last-ulp log2 flip would change the
    * shift and every output). Two more matvec passes on the deflated
    * matrix give the second direction; the oracle replays the whole
    * chain. The spec checks near-orthogonality to the first component
    * (exact orthogonality is lost to the shift truncation, by design). */
  def embedPca2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val q = quantized(spark, dir).cache()
    try {
      val qmax = q.agg(max(expr("array_max(transform(q, x -> abs(x)))")))
        .first().getLong(0)
      guardPass(q, qmax)
      val first = dominantOf(q)
      val rr = first.map(v => v * v).sum
      val fLit = first.mkString("array(", "L, ", "L)")
      val defl = q
        .withColumn("dot", expr(
          s"aggregate(zip_with(q, $fLit, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
        .select(expr(
          s"zip_with(q, $fLit, (a, b) -> a * ${rr}L - dot * b)").as("qd"))
        .cache()
      try {
        val m = defl
          .agg(max(expr("array_max(transform(qd, x -> abs(x)))")))
          .first().getLong(0)
        require(m > 0, "degenerate corpus: rank-1 second-moment matrix")
        // integer-only shift derivation (the oracle mirrors it with a
        // min-over-range >> comparison)
        var shift = 0
        while ((m >> shift) > 20000L) shift += 1
        val q2 = defl.select(expr(
          s"""transform(qd, v -> CASE WHEN v >= 0 THEN shiftright(v, $shift)
             |  ELSE -shiftright(-v, $shift) END)""".stripMargin).as("q"))
          .cache()
        try {
          guardPass(q2, 20000L)
          dominantOf(q2).zipWithIndex
            .map { case (v, d) => (d.toLong, v) }.toSeq
            .toDF("dim", "component2_q")
            .orderBy("dim")
        } finally q2.unpersist()
      } finally defl.unpersist()
    } finally q.unpersist()
  }
}
