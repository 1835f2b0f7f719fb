package graft.ingest

import graft.SparkSuite

/** The check-then-act window INSIDE one appendOnce call (r19 advice):
  * [[SnapshotStore.appendOnce]]'s tag-absent pre-check and its
  * commit's own manifest read are separate filesystem reads, so a
  * concurrent same-tag committer can publish BETWEEN them. Before the
  * r20 fix the loser then saw the winner's manifest as just a new
  * head, appended its tagged dir at seq+1, and the tag landed twice —
  * double delivery. [[AppendOnceRaceSpec]] cannot catch this: its
  * children park at `beforePublish`, which is AFTER commit's read, so
  * it only exercises the same-seq rename refusal. This spec plants
  * the publish in the exact window via the `beforeCommitRead` seam
  * and asserts the commit-side tag re-check (derived from the SAME
  * manifest snapshot the sequence comes from) refuses loudly, writes
  * nothing, and leaves the replay path a quiet no-op. */
class AppendOnceWindowSpec extends SparkSuite {

  import spark.implicits._

  test("same-tag publish between appendOnce's pre-check and commit's " +
      "manifest read: loud refusal, delivery lands exactly once") {
    withTmpDir { dir =>
      val storePath = dir.resolve("s").toString
      val plain = new SnapshotStore(storePath)
      plain.overwrite(Seq(("base", 1L)).toDF("k", "v"))

      @volatile var fired = false
      val hooked = new SnapshotStore(storePath) {
        override protected def beforeCommitRead(): Unit =
          if (!fired) {
            fired = true
            // the concurrent committer: same tag, publishing AFTER the
            // outer appendOnce's tag-absent pre-check and BEFORE its
            // commit's own manifest read — the r19-advice window
            assert(new SnapshotStore(storePath)
              .appendOnce(Seq(("d7", 7L)).toDF("k", "v"), "7"),
              "planted committer must win its (uncontended) commit")
          }
      }
      val e = intercept[java.io.IOException](
        hooked.appendOnce(Seq(("d7", 7L)).toDF("k", "v"), "7"))
      assert(e.getMessage.contains("already applied"),
        s"expected the loud lost-race refusal, got: ${e.getMessage}")

      // exactly-once audit: the delivery's rows land once, the tag
      // rides exactly one live dir
      val live = plain.read(spark).get
      val rows = live.collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(rows.sorted === Seq(("base", 1L), ("d7", 7L)),
        s"delivery must land exactly once, got $rows")
      val liveDirs = live.inputFiles
        .map(f => f.substring(0, f.lastIndexOf('/'))).distinct
      assert(liveDirs.count(_.matches(".*-t7$")) === 1,
        s"tag must ride exactly one live dir, got ${liveDirs.toSeq}")

      // the re-check fires BEFORE any data write: no orphan version
      // dir, no tmp manifest left by the loser
      val names = new java.io.File(storePath).listFiles().map(_.getName)
      assert(!names.exists(_.startsWith(".manifest-tmp")),
        "loser must leave no tmp manifest")
      assert(names.count(_.startsWith("v-")) === 2,
        s"loser must write no orphan dir, got ${names.toSeq}")

      // and a post-race replay is the documented quiet no-op
      assert(!plain.appendOnce(Seq(("d7", 7L)).toDF("k", "v"), "7"),
        "post-race replay must be a no-op")
    }
  }
}
