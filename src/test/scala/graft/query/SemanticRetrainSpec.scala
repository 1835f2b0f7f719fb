package graft.query

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The retrain loop closed for the SECOND frozen-model family: SemDeDup
  * ([[SemanticIndex.ensureRetrainedIndex]]). The retrained arm's
  * semantics are pinned to an EXISTING operator — a full refit is by
  * construction [[TextSim.dedupSemanticKmeansOf]] over the merged
  * corpus — so the spec asserts bit-equality against it, and the quiet
  * arm against the frozen delta chain ([[SemanticIndex.ensureIndex]]).
  * Same planted corpora as IvfRetrainSpec ([[DriftFixtures]]). */
class SemanticRetrainSpec extends SparkSuite {

  private def flagsOf(df: org.apache.spark.sql.DataFrame)
      : Set[(Long, Long, Boolean)] =
    df.select("vec_id", "cluster", "is_dup")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSet

  test("planted shift: gauge fires, chain resets, flags == the " +
      "one-shot full refit") {
    withTmpDir { tmp =>
      val dir = DriftFixtures.writeCorpus(spark, tmp, shifted = true)
      val (flags, retrained) =
        SemanticIndex.ensureRetrainedIndex(spark, dir)
      assert(retrained, "store build must apply the gauge's decision")
      val refit = TextSim.dedupSemanticKmeansOf(
        graft.core.Tables.load(spark, dir, "embeddings"))
      assert(flagsOf(flags) === flagsOf(refit),
        "retrained flags must equal the full one-shot refit")
      // the reset must also have changed SOMETHING vs the frozen
      // chain — otherwise the fixture proves nothing
      val frozen = SemanticIndex.dedupSemanticDelta(spark, dir)
      assert(flagsOf(frozen) !== flagsOf(refit),
        "vacuous fixture: frozen and retrained flags identical")
    }
  }

  test("no shift: gauge quiet, retrain path == the frozen delta " +
      "chain bit-for-bit") {
    withTmpDir { tmp =>
      val dir = DriftFixtures.writeCorpus(spark, tmp, shifted = false)
      val (flags, retrained) =
        SemanticIndex.ensureRetrainedIndex(spark, dir)
      assert(!retrained, "an in-distribution delivery must stay frozen")
      assert(flagsOf(flags) ===
        flagsOf(SemanticIndex.dedupSemanticDelta(spark, dir)),
        "quiet gauge must not change the serving state")
    }
  }

  test("frame-level core mirrors the store path on both arms") {
    withTmpDir { tmp =>
      val dir = DriftFixtures.writeCorpus(spark, tmp, shifted = true)
      val e = graft.core.Tables.load(spark, dir, "embeddings")
      val (flags, retrained) = SemanticIndex.retrainIfDrifted(e)
      assert(retrained)
      assert(flagsOf(flags) ===
        flagsOf(TextSim.dedupSemanticKmeansOf(e)))
    }
  }
}
