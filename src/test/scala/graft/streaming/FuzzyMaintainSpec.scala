package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSuite, TestSpark}
import graft.ingest.SnapshotStore
import graft.query.{FuzzyIndex, FuzzyJoin}

/** Streaming maintenance of the persisted deletion-signature store
  * ([[FuzzyMaintain]]): replay safety via appendOnce — duplicated
  * signature rows silently inflate the candidate mass the equality
  * join pays — and micro-batch boundary independence / streamed ==
  * batch of the served fuzzy matches. */
class FuzzyMaintainSpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  test("a replayed delivery leaves the signature store bit-unchanged") {
    withTmpDir { tmp =>
      val parts = graft.core.Tables.load(spark, dir, "part")
        .select(col("p_partkey"), col("p_name"))
      val cut = FuzzyIndex.deltaCutoff(parts)
      val store = new SnapshotStore(tmp.resolve("sig").toString)
      store.overwrite(FuzzyJoin.signaturesOf(
        parts.filter(col("p_partkey") < cut), 2))
      val delivery = parts.filter(col("p_partkey") >= cut)
      FuzzyMaintain.appendDelivery(delivery, store, batchId = 0L)
      val want = store.read(spark).get.count()
      assert(want > 0)
      // the at-least-once replay: the SAME batch body, verbatim
      FuzzyMaintain.appendDelivery(delivery, store, batchId = 0L)
      assert(store.read(spark).get.count() === want,
        "replay doubled the delivery's signature rows")
      assert(store.versions(spark).size === 2,
        "replay must not add a manifest commit")
    }
  }

  test("streamed maintenance == the batch-built index's delta join, " +
      "and boundaries do not matter") {
    val batch = FuzzyIndex.joinFuzzyDelta(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val two = FuzzyMaintain.joinFuzzyStream(spark, dir, chunks = 2)
      .collect().map(_.toString).sorted.toSeq
    val four = FuzzyMaintain.joinFuzzyStream(spark, dir, chunks = 4)
      .collect().map(_.toString).sorted.toSeq
    assert(batch.nonEmpty, "vacuous: no delivery probes matched")
    assert(two === batch,
      "stream-maintained fuzzy join diverges from the batch form")
    assert(four === batch)
  }

  test("full lifecycle (N-delivery chain + compact + replay) serves " +
      "the same matches as the one-shot index") {
    val batch = FuzzyIndex.joinFuzzyDelta(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val lifecycle = FuzzyMaintain.fuzzyCompactCheck(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(batch.nonEmpty, "vacuous: no delivery probes matched")
    assert(lifecycle === batch,
      "compacted-chain-served fuzzy join diverges from the one-shot " +
        "index — compaction or the post-compaction replay corrupted " +
        "the signature store")
  }

  test("compact folds the delivery tags into the sidecar and the " +
      "post-compaction replay is a no-op") {
    withTmpDir { tmp =>
      val parts = graft.core.Tables.load(spark, dir, "part")
        .select(col("p_partkey"), col("p_name"))
      val cut = FuzzyIndex.deltaCutoff(parts)
      val store = new SnapshotStore(tmp.resolve("sig").toString)
      store.overwrite(FuzzyJoin.signaturesOf(
        parts.filter(col("p_partkey") < cut), 2))
      val maxId = parts.agg(max(col("p_partkey"))).head().getLong(0)
      val span = DriveSupport.deliverySpan(maxId, cut, 4)
      (0 until 4).foreach { c =>
        FuzzyMaintain.appendDelivery(parts.filter(
          col("p_partkey") >= cut + c * span &&
          col("p_partkey") < cut + (c + 1) * span), store, c.toLong)
      }
      def liveDirs(): Int = store.read(spark).get.inputFiles
        .map(f => f.substring(0, f.lastIndexOf('/'))).distinct.length
      assert(liveDirs() === 5,
        "expected a base + four-delivery dir chain")
      val want = store.read(spark).get.count()
      store.compact(spark)
      assert(liveDirs() === 1,
        "compact must collapse the chain to one dir")
      assert(store.read(spark).get.count() === want,
        "compaction must be content-preserving")
      // every delivery's tag survived the dir collapse via the sidecar
      (0 until 4).foreach { c =>
        FuzzyMaintain.appendDelivery(parts.filter(
          col("p_partkey") >= cut + c * span &&
          col("p_partkey") < cut + (c + 1) * span), store, c.toLong)
      }
      assert(store.read(spark).get.count() === want,
        "a post-compaction replay re-appended its signatures")
      assert(liveDirs() === 1,
        "post-compaction replays must not extend the chain")
    }
  }
}
