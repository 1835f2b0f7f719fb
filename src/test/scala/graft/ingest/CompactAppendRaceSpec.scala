package graft.ingest

import java.nio.file.Files
import java.util.concurrent.TimeUnit

import graft.SparkSuite

/** Compact-vs-append cross-PROCESS race ([[SnapshotStore.compact]]
  * racing [[SnapshotStore.appendOnce]] from two separate JVMs) — the
  * maintenance hazard the r17 scaladoc deferred to a prose
  * "single-maintainer window" caveat, now a tested contract: a
  * compaction job and a streaming delivery hitting one store
  * concurrently must leave (1) exactly one winner and one LOUD loser,
  * (2) no torn state — the live manifest always resolves to full
  * committed content, (3) NO LOST TAG in either interleaving: the
  * loser's retry converges to the same final state — content
  * base+d7+d8+d9, one compacted dir, sidecar {7,8,9}, every replay a
  * no-op — regardless of which side won.
  *
  * Both interleavings run as their own case (the held child released
  * first wins deterministically via [[CompactAppendChild]]'s order
  * arg), so the "compaction erased my tag dir mid-append" and the
  * "append slipped in under my compaction" paths are each pinned. */
class CompactAppendRaceSpec extends SparkSuite {

  import spark.implicits._

  import ForkedJvm.{awaitFile, forkChild}

  for ((label, compactOrder) <- Seq(
      "compact wins, append loses" -> "first",
      "append wins, compact loses" -> "second"))
  test(s"compact racing appendOnce: $label — loud loser, no torn " +
      "state, no lost tag") {
    withTmpDir { dir =>
      val path = dir.resolve("s").toString
      val barrier = Files.createDirectories(dir.resolve("barrier"))
      // a live append chain: base + two tagged deliveries — the state
      // both a compaction and the next delivery would race over
      val st = new SnapshotStore(path)
      st.overwrite(Seq(("base", 1L)).toDF("k", "v"))
      assert(st.appendOnce(Seq(("d7", 2L)).toDF("k", "v"), "7"))
      assert(st.appendOnce(Seq(("d8", 3L)).toDF("k", "v"), "8"))

      val appendOrder = if (compactOrder == "first") "second" else "first"
      val compactChild = forkChild("graft.ingest.CompactAppendChild",
        Seq(path, barrier.toString, "0", "compact", compactOrder),
        barrier, 0)
      val appendChild = forkChild("graft.ingest.CompactAppendChild",
        Seq(path, barrier.toString, "1", "append", appendOrder),
        barrier, 1)
      val procs = Seq(compactChild, appendChild)
      try {
        val readies = (0 to 1).map(i => barrier.resolve(s"ready-$i"))
        readies.zipWithIndex.foreach { case (r, i) =>
          awaitFile(r, s"child $i commit point", alive = procs)
        }
        // both computed their seq BEFORE either published — a genuine
        // same-sequence collision between the two maintenance jobs
        val seqs = readies.map(r => Files.readString(r).trim)
        assert(seqs.toSet === Set("3"),
          s"both children must target seq 3, got $seqs")
        Files.writeString(barrier.resolve("go"), "")

        procs.foreach(p => assert(p.waitFor(120, TimeUnit.SECONDS),
          "child did not finish after release"))
        val codes = procs.map(_.exitValue())
        val expected =
          if (compactOrder == "first") Seq(0, 10) else Seq(10, 0)
        assert(codes === expected,
          s"expected (compact, append) exits $expected, got $codes — " +
            s"child logs under $barrier")

        // mid-state audit from a THIRD process (this JVM): the live
        // manifest resolves to full committed content either way
        val mid = st.read(spark).get.collect()
          .map(r => (r.getString(0), r.getLong(1))).toSet
        if (compactOrder == "first") {
          // compact won: content bit-preserved, chain collapsed, tags
          // folded; the append's payload never landed
          assert(mid === Set(("base", 1L), ("d7", 2L), ("d8", 3L)))
          assert(st.sidecarTags(spark) === Set("7", "8"))
          // the loser's tag was NOT falsely consumed: the retry lands
          assert(st.appendOnce(Seq(("d9", 4L)).toDF("k", "v"), "9"),
            "losing append's tag was burned without its data")
        } else {
          // append won: delivery visible, chain one dir longer; the
          // compaction simply didn't happen (its retry below folds the
          // new delivery too — strictly better than the stale plan)
          assert(mid === Set(("base", 1L), ("d7", 2L), ("d8", 3L),
            ("d9", 4L)))
          st.compact(spark)
        }
        if (compactOrder == "first") st.compact(spark)

        // CONVERGED end state, identical across interleavings: all
        // three tags remembered, all replays no-ops, content complete
        assert(st.sidecarTags(spark) === Set("7", "8", "9"))
        Seq("7" -> ("d7", 2L), "8" -> ("d8", 3L), "9" -> ("d9", 4L))
          .foreach { case (tag, (k, v)) =>
            assert(!st.appendOnce(Seq((k, v)).toDF("k", "v"), tag),
              s"replay of delivery $tag re-appended")
          }
        assert(st.read(spark).get.collect()
          .map(r => (r.getString(0), r.getLong(1))).toSet ===
          Set(("base", 1L), ("d7", 2L), ("d8", 3L), ("d9", 4L)))
        val liveDirs = st.read(spark).get.inputFiles
          .map(f => f.substring(0, f.lastIndexOf('/'))).distinct
        assert(liveDirs.length === 1,
          s"expected one compacted live dir, got ${liveDirs.length}")
        assert(!new java.io.File(path).listFiles()
          .exists(_.getName.startsWith(".manifest-tmp")),
          "loser must clean up its tmp manifest")
      } finally procs.foreach(_.destroyForcibly())
    }
  }
}
