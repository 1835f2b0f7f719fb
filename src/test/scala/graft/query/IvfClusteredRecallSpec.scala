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
    * within-cluster cosine ≈ 1, so clusters are unambiguous).
    * `clusterOf` maps vec_id → true cluster id; the default is 16
    * equal-mass clusters, the unbalanced variant routes half the rows
    * into cluster 0. */
  private def writeClustered(dir: java.nio.file.Path,
      clusterOf: String = "vec_id % 16"): String = {
    val emb = expr(
      s"""transform(sequence(0, 63), i -> cast(
           (pmod(xxhash64('c', $clusterOf, i), 2000001) / 1000000.0 - 1.0)
           + 0.05 *
           (pmod(xxhash64('n', vec_id, i), 2000001) / 1000000.0 - 1.0)
         as float))""")
    spark.range(500).select(col("id").as("vec_id"))
      .withColumn("embedding", emb)
      .withColumn("label", expr(clusterOf).cast("int"))
      .coalesce(1)
      .write.parquet(s"$dir/embeddings.parquet")
    dir.toString
  }

  /** Recall@5 of [[Ivf.similarityIvf]] vs the brute-force baseline, per
    * (nlist, nprobe) point, on the fixture at `dir`. */
  private def recallCurve(dir: String, nlist: Int, nprobes: Seq[Int])
      : Seq[(Int, Double)] = {
    val truth = TextSim.similarityTopk(spark, dir, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    nprobes.map { np =>
      val approx = Ivf.similarityIvf(spark, dir, k = 5,
          nlist = nlist, nprobe = np)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      np -> (truth & approx).size.toDouble / truth.size
    }
  }

  test("clustered corpus: recall >= 0.9 at nprobe <= 4/16 — the premise " +
      "that motivates IVF at 100 TB") {
    withTmpDir { tmp =>
      val dir = writeClustered(tmp)
      val curve = recallCurve(dir, nlist = 16, nprobes = Seq(1, 2, 4, 8))
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

  // Real corpora don't announce their cluster count: nlist here is
  // wrong by 2x in each direction against the SAME 16-cluster fixture.
  // The favorable case must survive miscalibration — recall >= 0.9 at a
  // probe budget of <= 1/4 of the (wrong) nlist. Under-splitting
  // (nlist 8) merges ~2 true clusters per cell, so a query's top cell
  // still holds its mates; over-splitting (nlist 32) shards a true
  // cluster across ~2 cells, so a 1/4 budget (8 probes) still covers
  // the shards.
  for ((nlist, budget) <- Seq(8 -> 2, 32 -> 8))
  test(s"miscalibrated nlist=$nlist vs 16 true clusters: " +
      s"recall >= 0.9 within a $budget/$nlist probe budget") {
    withTmpDir { tmp =>
      val dir = writeClustered(tmp)
      val curve = recallCurve(dir, nlist,
        nprobes = Seq(1, budget / 2, budget, nlist / 2).distinct.sorted)
      curve.foreach { case (np, r) =>
        info(f"nlist=$nlist%2d: nprobe=$np%2d  recall=$r%.3f")
      }
      val atBudget = curve.find(_._1 == budget).get._2
      assert(atBudget >= 0.9, f"nlist=$nlist must reach recall 0.9 " +
        f"within nprobe=$budget, got $atBudget%.3f")
    }
  }

  test("unbalanced mass (one cluster holds half the corpus): recall " +
      "follows the skew law — >= 0.9 once the probe budget covers the " +
      "query cluster's cells") {
    withTmpDir { tmp =>
      // vec_id < 250 -> cluster 0 (half the rows); the rest spread over
      // clusters 1..15. Queries (vec_id < 10) all sit INSIDE the heavy
      // cluster — the hard side of the skew: k-means balances MASS, so
      // the heavy cluster shards across many cells, and a query's exact
      // top-5 (noise-scale distinctions among ~250 near-identical
      // mates) scatter over all of them. The honest behavior, measured
      // (r11): recall ≈ the probed fraction of the heavy cluster's
      // cells (0.20/0.42/0.78/1.00 at nprobe 1/2/4/8 with the heavy
      // mass in 8 cells) — NOT the balanced case's saturation at 2.
      // The 100 TB consequence, documented at Ivf: under mass skew the
      // probe budget must scale with the query cluster's cell count
      // (equivalently, the probed MASS share), the standard IVF
      // practice of sizing nprobe against imbalance.
      val dir = writeClustered(tmp,
        clusterOf = "CASE WHEN vec_id < 250 THEN 0 ELSE vec_id % 16 END")
      val (_, cells) = Ivf.ensureIndex(spark, dir, nlist = 16)
      val heavyCells = cells.filter(col("vec_id") < 250)
        .select("cid").distinct().count().toInt
      info(s"heavy cluster (250/500 rows) landed in $heavyCells/16 cells")
      // heavyCells/2 is probed EXPLICITLY: with only {1,2,4,heavyCells}
      // probed, an odd heavyCells made find(heavyCells/2) return None and
      // the skew-visibility guard below vacuously skip (r11 advice)
      assert(heavyCells >= 2, "fixture precondition: the heavy cluster " +
        "must shard across >= 2 cells for the skew law to be measurable")
      val curve = recallCurve(dir, nlist = 16,
        nprobes = (Seq(1, 2, 4, heavyCells / 2) :+ heavyCells)
          .distinct.sorted)
      curve.foreach { case (np, r) =>
        info(f"unbalanced: nprobe=$np%2d/16  recall=$r%.3f")
      }
      assert(curve.map(_._2) === curve.map(_._2).sorted,
        "recall must be monotone non-decreasing in nprobe")
      val atHeavy = curve.find(_._1 == heavyCells).get._2
      assert(atHeavy >= 0.9, f"covering the heavy cluster's $heavyCells " +
        f"cells must reach recall 0.9, got $atHeavy%.3f")
      // and the skew is visible: half the budget must NOT already be
      // saturated (otherwise this fixture isn't measuring anything)
      val atHalf = curve.find(_._1 == heavyCells / 2).map(_._2)
      assert(atHalf.isDefined,
        s"nprobe=${heavyCells / 2} must be on the probed curve")
      atHalf.foreach(r => assert(r < 0.9,
        f"expected skew to depress recall at half the budget, got $r%.3f"))
    }
  }
}
