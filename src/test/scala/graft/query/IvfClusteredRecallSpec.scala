package graft.query

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The IVF premise, measured on the FAVORABLE case: IvfRecallSpec pins
  * the worst case (uniform-random embeddings, no cluster structure —
  * recall ≈ probed fraction, 0.52 @ nprobe 4/16), and PERF.md's closing
  * claim is that real, CLUSTERED corpora buy the same recall for far
  * fewer probes. This spec builds that corpus — a deterministic
  * mixture-of-Gaussians twin of the fixture (same 500 rows × dim 64
  * float shape, 16 well-separated clusters, hash-derived centers and
  * noise so every run is bit-identical) — and measures the same
  * nprobe-vs-recall curve through the same [[Ivf.similarityIvf]] path.
  *
  * Expected shape: each cluster's members point in nearly the same
  * direction, so Lloyd's assignment puts a whole cluster in one cell
  * and a query's top-probed cell is the one holding its cluster mates —
  * recall saturates at tiny nprobe instead of climbing linearly. */
class IvfClusteredRecallSpec extends SparkSuite {

  /** Write a clustered embeddings.parquet shaped like the driver's
    * fixture: vec_id long, embedding array<float> dim 64, label int.
    * center(c)[i] ~ U[-1,1) from xxhash64; point = center + 0.05·noise
    * (pairwise center cosine ~ N(0, 1/64) — near-orthogonal — while
    * within-cluster cosine ≈ 1, so clusters are unambiguous). */
  private def writeClustered(dir: java.nio.file.Path): String = {
    val emb = expr(
      """transform(sequence(0, 63), i -> cast(
           (pmod(xxhash64('c', vec_id % 16, i), 2000001) / 1000000.0 - 1.0)
           + 0.05 *
           (pmod(xxhash64('n', vec_id, i), 2000001) / 1000000.0 - 1.0)
         as float))""")
    spark.range(500).select(col("id").as("vec_id"))
      .withColumn("embedding", emb)
      .withColumn("label", (col("vec_id") % 16).cast("int"))
      .coalesce(1)
      .write.parquet(s"$dir/embeddings.parquet")
    dir.toString
  }

  test("clustered corpus: recall >= 0.9 at nprobe <= 4/16 — the premise " +
      "that motivates IVF at 100 TB") {
    withTmpDir { tmp =>
      val dir = writeClustered(tmp)
      val truth = TextSim.similarityTopk(spark, dir, k = 5)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val curve = Seq(1, 2, 4, 8).map { np =>
        val approx = Ivf.similarityIvf(spark, dir, k = 5, nprobe = np)
          .select("query_id", "neighbor_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        np -> (truth & approx).size.toDouble / truth.size
      }
      curve.foreach { case (np, r) =>
        info(f"clustered: nprobe=$np%2d/16  recall=$r%.3f")
      }
      assert(curve.map(_._2) === curve.map(_._2).sorted,
        "recall must be monotone non-decreasing in nprobe")
      // the favorable-case claim, now a gate: 1/4 of the worst case's
      // HighRecallNprobe budget holds the same recall bar
      val at4 = curve.find(_._1 == 4).get._2
      assert(at4 >= 0.9,
        f"clustered corpus must reach recall 0.9 by nprobe 4/16, got $at4%.3f")
    }
  }
}
