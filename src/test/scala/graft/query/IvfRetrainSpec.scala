package graft.query

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The retrain loop CLOSED (r16 verdict task 6): [[IndexDrift]] is the
  * gauge, [[Ivf.ensureRetrainedIndex]] is the action — this spec
  * drives a planted distribution shift through gauge → decision →
  * store rebuild → recall restoration, and the quiet control through
  * gauge → frozen chain → bit-identical serving state.
  *
  * The planted shift: base (vec_id 10..399) is the standard 16-cluster
  * mixture; the delivery (400..499) AND the query set (vec_id < 10 —
  * [[Ivf]]'s fixed probe contract) sit in 4 FRESH tight clusters at
  * hash-random directions the base model never saw. Under the frozen
  * base-trained centroids a new cluster has no centroid of its own —
  * its members scatter over whichever old cells are nearest (noise
  * decides near-ties), so a query's true mates land outside its probed
  * cells and recall at small nprobe collapses. Retraining on the full
  * corpus gives the new mass its own cells and recall returns. The
  * control corpus draws the delivery from the same 16 base clusters:
  * the gauge must stay quiet and the retrain path must serve exactly
  * the frozen delta chain's answers. */
class IvfRetrainSpec extends SparkSuite {

  private def writeCorpus(dir: java.nio.file.Path, shifted: Boolean)
      : String = DriftFixtures.writeCorpus(spark, dir, shifted)

  /** Recall@5 of `approx` against the brute-force truth at `dir`. */
  private def recallOf(dir: String,
      approx: org.apache.spark.sql.DataFrame): Double = {
    val truth = TextSim.similarityTopk(spark, dir, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = approx.select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (truth & got).size.toDouble / truth.size
  }

  test("planted shift: gauge fires, store chain resets, retrained " +
      "index restores the recall the frozen model lost") {
    withTmpDir { tmp =>
      val dir = writeCorpus(tmp, shifted = true)
      val e = graft.core.Tables.load(spark, dir, "embeddings")
      val cut = e.agg(max(col("vec_id"))).head().getLong(0) * 4 / 5 + 1
      // 1. the gauge fires on the shifted delivery
      val gauge = IndexDrift.indexDriftOf(
        e.filter(col("vec_id") < cut), e.filter(col("vec_id") >= cut))
      assert(gauge.select("index_retrain").head().getBoolean(0),
        "planted shift must flip index_retrain")
      // 2. the store path takes the retrain arm: model swapped, chain
      //    RESET to a single version (the durable decision record)
      val (_, _, retrained) = Ivf.ensureRetrainedIndex(spark, dir)
      assert(retrained, "store build must apply the gauge's decision")
      // 3. recall restoration at a tight probe budget
      val np = 1
      val frozen = recallOf(dir,
        Ivf.similarityIvfDelta(spark, dir, k = 5, nprobe = np))
      val after = recallOf(dir,
        Ivf.similarityIvfRetrain(spark, dir, k = 5, nprobe = np))
      info(f"nprobe=$np/16: frozen recall=$frozen%.3f, " +
        f"retrained recall=$after%.3f")
      assert(frozen <= 0.8,
        f"planted shift must degrade the frozen model (got $frozen%.3f " +
          "— fixture no longer plants damage)")
      assert(after >= 0.9,
        f"retrained index must restore recall >= 0.9, got $after%.3f")
      assert(after - frozen >= 0.15,
        f"retraining must buy a material recall gap, got " +
          f"$frozen%.3f -> $after%.3f")
    }
  }

  test("no shift: gauge quiet, retrain path serves the frozen delta " +
      "chain's answers bit-for-bit") {
    withTmpDir { tmp =>
      val dir = writeCorpus(tmp, shifted = false)
      val (_, _, retrained) = Ivf.ensureRetrainedIndex(spark, dir)
      assert(!retrained, "an in-distribution delivery must stay frozen")
      val viaRetrain = Ivf.similarityIvfRetrain(spark, dir, k = 5)
      val viaDelta = Ivf.similarityIvfDelta(spark, dir, k = 5)
      assert(viaRetrain.count() === viaDelta.count())
      assert(viaRetrain.except(viaDelta).count() === 0L,
        "quiet gauge must not change the serving state")
    }
  }
}
