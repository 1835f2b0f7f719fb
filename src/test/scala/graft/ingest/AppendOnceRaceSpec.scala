package graft.ingest

import java.nio.file.Files
import java.util.concurrent.TimeUnit

import graft.SparkSuite

/** appendOnce-vs-appendOnce cross-PROCESS race with the SAME tag (r18
  * verdict task 5) — the double-delivery interleaving
  * [[CompactAppendRaceSpec]] does not cover: two delivery workers (or
  * an at-least-once scheduler's duplicate dispatch) commit the same
  * tagged delivery concurrently; both check the tag ABSENT, both write
  * a version dir, both reach the rename. The contract: exactly ONE
  * winner; the loser fails LOUDLY (the rename-to-fresh-name refusal)
  * and its RETRY is a NO-OP, not an error and not a second copy; the
  * delivery's rows land exactly once; the tag is present exactly once
  * in the live chain. Both release orders run as their own case. */
class AppendOnceRaceSpec extends SparkSuite {

  import spark.implicits._

  import ForkedJvm.{awaitFile, forkChild}

  for ((label, orders) <- Seq(
      "child 0 wins" -> ("first", "second"),
      "child 1 wins" -> ("second", "first")))
  test(s"two appendOnce committers, one tag, $label: one winner, " +
      "loud loser whose retry no-ops, delivery lands exactly once") {
    withTmpDir { dir =>
      val path = dir.resolve("s").toString
      val barrier = Files.createDirectories(dir.resolve("barrier"))
      val st = new SnapshotStore(path)
      st.overwrite(Seq(("base", 1L)).toDF("k", "v"))
      assert(st.appendOnce(Seq(("d8", 3L)).toDF("k", "v"), "8"))

      val procs = Seq(
        forkChild("graft.ingest.AppendOnceChild",
          Seq(path, barrier.toString, "0", orders._1), barrier, 0),
        forkChild("graft.ingest.AppendOnceChild",
          Seq(path, barrier.toString, "1", orders._2), barrier, 1))
      try {
        val readies = (0 to 1).map(i => barrier.resolve(s"ready-$i"))
        readies.zipWithIndex.foreach { case (r, i) =>
          awaitFile(r, s"child $i commit point", alive = procs)
        }
        // both parked: both read the tag as absent and derived the
        // SAME next sequence — the genuine double-delivery collision
        val seqs = readies.map(r => Files.readString(r).trim)
        assert(seqs.toSet === Set("2"),
          s"both children must target seq 2, got $seqs")
        Files.writeString(barrier.resolve("go"), "")

        procs.foreach(p => assert(p.waitFor(120, TimeUnit.SECONDS),
          "child did not finish after release"))
        val codes = procs.map(_.exitValue())
        val expected = if (orders._1 == "first") Seq(0, 11) else Seq(11, 0)
        assert(codes === expected,
          s"expected exits $expected (0=won, 11=lost loudly + retry " +
            s"no-op), got $codes — child logs under $barrier")

        // exactly-once audit from a third process (this JVM)
        val rows = st.read(spark).get.collect()
          .map(r => (r.getString(0), r.getLong(1))).toSeq
        assert(rows.count(_ == ("d9", 4L)) === 1,
          s"delivery must land exactly once, got $rows")
        assert(rows.toSet === Set(("base", 1L), ("d8", 3L), ("d9", 4L)))
        // the tag appears exactly once across the live chain's dir
        // names + sidecars, and a same-JVM replay is a no-op
        val liveDirs = st.read(spark).get.inputFiles
          .map(f => f.substring(0, f.lastIndexOf('/'))).distinct
        assert(liveDirs.count(_.matches(".*-t9$")) === 1,
          s"tag must ride exactly one live dir, got ${liveDirs.toSeq}")
        assert(!st.appendOnce(Seq(("d9", 4L)).toDF("k", "v"), "9"),
          "post-race replay re-appended")
        assert(!new java.io.File(path).listFiles()
          .exists(_.getName.startsWith(".manifest-tmp")),
          "loser must clean up its tmp manifest")
      } finally procs.foreach(_.destroyForcibly())
    }
  }
}
