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
  * qmax ≈ 6·10³ that allows n ≈ 3.6M vectors; beyond that lower the
  * renormalization target (one knob) or shard-and-merge.
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
    * operation DuckDB's `//` performs, so the oracle mirrors it. */
  private def renorm(y: Array[Long]): Array[Long] = {
    val m = y.map(math.abs).max
    require(m > 0, "degenerate corpus: zero matvec")
    y.map(v => v * Target / m)
  }

  /** Two power-iteration steps from the fixed start s[d] = d%7 − 3;
    * output: the renormalized direction after pass 2, one row per
    * dimension — 64 exact integers, hash-compared against DuckDB
    * running the identical integer algebra. */
  def embedPowerIter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val q = Tables.load(spark, dir, "embeddings")
      .select(expr(
        s"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $Quant) AS BIGINT))")
        .as("q"))
      .cache()
    try {
      // runtime guard for the documented magnitude bound (2× margin)
      val guard = q.agg(count(lit(1)),
        max(expr("array_max(transform(q, x -> abs(x)))"))).first()
      val (n, qmax) = (guard.getLong(0), guard.getLong(1))
      require(qmax > 0, "degenerate corpus: all-zero embeddings")
      require(n <= Long.MaxValue / 2 / qmax / qmax / Dim / Target,
        s"n=$n qmax=$qmax would overflow the fixed $Target target — " +
          "lower the renormalization target")
      val s = Array.tabulate(Dim)(d => (d % 7 - 3).toLong)
      val r2 = renorm(matvec(q, renorm(matvec(q, s))))
      r2.zipWithIndex
        .map { case (v, d) => (d.toLong, v) }.toSeq
        .toDF("dim", "component_q")
        .orderBy("dim")
    } finally q.unpersist()
  }
}
