package graft.ingest

import java.nio.file.Files
import java.util.concurrent.TimeUnit

import graft.SparkSuite

/** commitDeltaCowOnce-vs-commitDeltaCowOnce cross-PROCESS race with
  * the SAME tag — the bucketed-store counterpart of
  * [[AppendOnceRaceSpec]], and the tested contract for this round's
  * overwriteCow re-check (r18 advice: the sidecar-read-vs-publish
  * window): two workers commit one tagged delivery concurrently; both
  * pass the fast-path replay check, both merge, both reach the
  * rename. Exactly ONE wins; the loser fails LOUDLY and its retry is
  * a None no-op; the merged content shows the delivery applied ONCE;
  * the tag rides the live sidecar exactly once. Both release orders
  * run as their own case. */
class CowOnceRaceSpec extends SparkSuite {

  import spark.implicits._

  import ForkedJvm.{awaitFile, forkChild}

  for ((label, orders) <- Seq(
      "child 0 wins" -> ("first", "second"),
      "child 1 wins" -> ("second", "first")))
  test(s"two CoW exactly-once committers, one tag, $label") {
    withTmpDir { dir =>
      val path = dir.resolve("s").toString
      val barrier = Files.createDirectories(dir.resolve("barrier"))
      val st = new SnapshotStore(path, bucket = Some(("k", 4)))
      // generation start: keys 1..8, all "base"
      st.overwrite((1L to 8L).map(k => (k, "base")).toDF("k", "v"))

      val procs = Seq(
        forkChild("graft.ingest.CowOnceChild",
          Seq(path, barrier.toString, "0", orders._1), barrier, 0),
        forkChild("graft.ingest.CowOnceChild",
          Seq(path, barrier.toString, "1", orders._2), barrier, 1))
      try {
        val readies = (0 to 1).map(i => barrier.resolve(s"ready-$i"))
        readies.zipWithIndex.foreach { case (r, i) =>
          awaitFile(r, s"child $i commit point", alive = procs)
        }
        // both parked: both read the tag as absent, both derived the
        // same next sequence from one manifest snapshot
        val seqs = readies.map(r => Files.readString(r).trim)
        assert(seqs.toSet === Set("1"),
          s"both children must target seq 1, got $seqs")
        Files.writeString(barrier.resolve("go"), "")

        procs.foreach(p => assert(p.waitFor(120, TimeUnit.SECONDS),
          "child did not finish after release"))
        val codes = procs.map(_.exitValue())
        val expected = if (orders._1 == "first") Seq(0, 11) else Seq(11, 0)
        assert(codes === expected,
          s"expected exits $expected (0=won, 11=lost loudly + retry " +
            s"None), got $codes — child logs under $barrier")

        // exactly-once audit from a third process (this JVM): the
        // delivery's field-level $set applied exactly once
        val rows = st.read(spark).get.collect()
          .map(r => (r.getLong(0), r.getString(1))).toSet
        assert(rows === ((1L to 8L).toSet - 7L).map(k => (k, "base"))
          + (7L -> "wk2"),
          s"merged content wrong: $rows")
        assert(st.sidecarTags(spark) === Set("wk2"),
          "tag must ride the live sidecar exactly once")
        // a same-JVM replay is a no-op
        assert(Upsert.commitDeltaCowOnce(st, st.read(spark).get,
          Seq((7L, "wk2")).toDF("k", "v"), "k", tag = "wk2",
          mergeWholly = Set.empty).isEmpty,
          "post-race replay re-committed")
        assert(!new java.io.File(path).listFiles()
          .exists(_.getName.startsWith(".manifest-tmp")),
          "loser must clean up its tmp manifest")
      } finally procs.foreach(_.destroyForcibly())
    }
  }
}
