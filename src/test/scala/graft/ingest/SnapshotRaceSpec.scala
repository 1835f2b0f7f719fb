package graft.ingest

import java.util.concurrent.{CountDownLatch, CyclicBarrier, TimeUnit}

import scala.util.Try

import graft.SparkSuite

/** Concurrent-commit semantics of [[SnapshotStore]] — the real
  * multi-job hazard the manifest design exists for: two writers
  * committing simultaneously must yield EXACTLY ONE winner and a LOUD
  * loser (the `FileContext.rename(NONE)` refuse-existing-destination
  * path), never a corrupt, merged, or silently-replaced manifest; and
  * a reader concurrent with a commit must see only the old or the new
  * FULL version, never a partial one.
  *
  * Determinism: the `beforePublish` seam holds both committers at the
  * commit point (version dir + tmp manifest fully written, manifest
  * rename not yet attempted), so both have computed the SAME target
  * sequence number; they then publish in a forced order. The invariant
  * under test is commit-level (same-seq collision is refused loudly),
  * not syscall-level rename atomicity — that is the filesystem's
  * contract (atomic on HDFS; the production deployment target). */
class SnapshotRaceSpec extends SparkSuite {

  import spark.implicits._

  /** Store that parks at the commit point until every racer arrives,
    * then publishes after `delayMs` — forcing both committers to
    * target one seq with a deterministic publish order. */
  private class HeldStore(path: String, bucket: Option[(String, Int)],
      barrier: CyclicBarrier, delayMs: Long)
      extends SnapshotStore(path, bucket) {
    override protected def beforePublish(seq: Long): Unit = {
      barrier.await(60, TimeUnit.SECONDS)
      if (delayMs > 0) Thread.sleep(delayMs)
    }
  }

  for ((label, bucket) <- Seq(
      "plain parquet" -> None,
      "bucketed" -> Some(("k", 4))))
  test("two simultaneous commits: one winner, loud loser, " +
      s"intact store ($label)") {
    withTmpDir { dir =>
      val path = dir.resolve("s").toString
      // pre-existing live version: the race is over an UPDATE commit,
      // and proves the base version survives whatever the racers do
      new SnapshotStore(path, bucket)
        .overwrite(Seq(("base", 0)).toDF("k", "v"))

      val barrier = new CyclicBarrier(2)
      val results = new Array[Try[Unit]](2)
      val payload = IndexedSeq(
        Seq(("w0", 1)).toDF("k", "v"), Seq(("w1", 2)).toDF("k", "v"))
      val threads = (0 to 1).map { i =>
        val t = new Thread(() => results(i) = Try(
          new HeldStore(path, bucket, barrier, delayMs = i * 500L)
            .overwrite(payload(i))))
        t.start(); t
      }
      threads.foreach(_.join(120000))

      // exactly one winner; the loser fails LOUDLY on the rename(NONE)
      // path — never a silent replace or a merged manifest
      val (winners, losers) = results.partition(_.isSuccess)
      assert(winners.length === 1 && losers.length === 1,
        s"expected 1 winner + 1 loser, got $results")
      val err = losers.head.failed.get
      assert(err.isInstanceOf[java.io.IOException] &&
        err.getMessage.contains("lost race"),
        s"loser must fail loudly on the commit rename, got: $err")

      // the store resolves to exactly the winner's rows
      val live = new SnapshotStore(path, bucket).read(spark).get
        .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
      val winnerRow = if (results(0).isSuccess) ("w0", 1) else ("w1", 2)
      assert(live === Seq(winnerRow))

      // manifest integrity: one manifest per seq, no tmp leftovers
      val names = new java.io.File(path).listFiles().map(_.getName)
      val manifests = names.filter(_.startsWith("MANIFEST-")).sorted
      assert(manifests.toSeq === Seq("MANIFEST-0", "MANIFEST-1"))
      assert(!names.exists(_.startsWith(".manifest-tmp")),
        "loser must clean up its tmp manifest")

      // the loser retries and lands cleanly on the next seq
      val loserIdx = results.indexWhere(_.isFailure)
      new SnapshotStore(path, bucket).overwrite(payload(loserIdx))
      val after = new SnapshotStore(path, bucket).read(spark).get
        .collect().map(_.getString(0)).toSeq
      assert(after === Seq(s"w$loserIdx"))
    }
  }

  test("a reader concurrent with a commit sees the old full version, " +
      "then the new one — never a partial") {
    withTmpDir { dir =>
      val path = dir.resolve("s").toString
      val store = new SnapshotStore(path)
      store.overwrite(Seq(("old", 1), ("old2", 2)).toDF("k", "v"))

      val atCommitPoint = new CountDownLatch(1)
      val proceed = new CountDownLatch(1)
      val held = new SnapshotStore(path) {
        override protected def beforePublish(seq: Long): Unit = {
          atCommitPoint.countDown()
          assert(proceed.await(60, TimeUnit.SECONDS),
            "reader thread never released the commit")
        }
      }
      val writer = new Thread(() =>
        held.overwrite(Seq(("new", 3)).toDF("k", "v")))
      writer.start()
      assert(atCommitPoint.await(60, TimeUnit.SECONDS),
        "writer never reached the commit point")
      // mid-commit (new version dir fully written, manifest not yet
      // flipped): a reader must resolve the OLD version, complete
      val mid = store.read(spark).get.collect()
        .map(_.getString(0)).toSeq.sorted
      assert(mid === Seq("old", "old2"),
        "reader during a commit must see the old full version")
      proceed.countDown()
      writer.join(120000)
      // post-commit: the new full version
      assert(store.read(spark).get.collect()
        .map(_.getString(0)).toSeq === Seq("new"))
      // and a plan RESOLVED against the old version still collects in
      // full after the flip (bounded retention keeps the predecessor)
      val resolvedBefore = store.readAt(spark, 0)
      assert(resolvedBefore.isDefined &&
        resolvedBefore.get.collect().length === 2)
    }
  }
}
