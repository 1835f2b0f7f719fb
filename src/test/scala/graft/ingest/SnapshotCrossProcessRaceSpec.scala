package graft.ingest

import java.nio.file.Files
import java.util.concurrent.TimeUnit

import graft.SparkSuite

/** Cross-PROCESS concurrent-commit race for [[SnapshotStore]] — the
  * production multi-job hazard: two separate JVMs (each its own
  * SparkSession, as two independent Spark jobs would be) racing the
  * manifest rename against ONE store path. The same-JVM
  * `SnapshotRaceSpec` proves the protocol through an in-process
  * barrier; here nothing in-process can coordinate the racers — the
  * only thing standing between the committers and a silent lost update
  * is the `FileContext.rename(Options.Rename.NONE)`
  * refuse-existing-destination contract, which is exactly what this
  * spec exercises across a process boundary.
  *
  * Mechanics: each forked child ([[SnapshotRaceChild]]) parks at the
  * commit point and reports its target sequence number through a
  * `ready-<id>` file; the parent asserts both children reached the SAME
  * seq (a true collision), releases them with a `go` file, and then
  * asserts the same invariants as the in-process spec: exactly one
  * winner (exit 0), one LOUD loser (exit 10), the store resolves to
  * exactly the winner's rows, the base version is intact, no tmp
  * manifest leaks, and the loser's payload retries cleanly onto the
  * next seq. Run on both the plain and the bucketed store.
  */
class SnapshotCrossProcessRaceSpec extends SparkSuite {

  import spark.implicits._

  import ForkedJvm.{awaitFile, forkChild}

  for ((label, bucketed) <- Seq("plain parquet" -> false,
      "bucketed" -> true))
  test("two JVMs racing one commit: one winner, loud loser, " +
      s"intact store ($label)") {
    withTmpDir { dir =>
      val path = dir.resolve("s").toString
      val barrier = Files.createDirectories(dir.resolve("barrier"))
      val bucket = if (bucketed) Some(("k", 4)) else None
      // pre-existing live version: the race is over an UPDATE commit
      // and must leave this base version resolvable throughout
      new SnapshotStore(path, bucket)
        .overwrite(Seq(("base", 0)).toDF("k", "v"))

      val procs = (0 to 1).map(i => forkChild(
        "graft.ingest.SnapshotRaceChild",
        Seq(path, bucketed.toString, barrier.toString, i.toString),
        barrier, i))
      // third JVM: an independent reader hammering read() across the
      // whole commit window — every observation must be a full
      // committed version, never a torn or partial state
      val reader = forkChild("graft.ingest.SnapshotReaderChild",
        Seq(path, bucketed.toString, barrier.toString, "2"), barrier, 2)
      try {
        val readies = (0 to 1).map(i => barrier.resolve(s"ready-$i"))
        readies.zipWithIndex.foreach { case (r, i) =>
          awaitFile(r, s"child $i commit point", alive = procs)
        }
        awaitFile(barrier.resolve("reader-ready-2"),
          "reader's first observation", alive = Seq(reader))
        // both children computed their seq BEFORE either published:
        // a genuine same-sequence collision, not a serialized pair
        val seqs = readies.map(r => Files.readString(r).trim)
        assert(seqs.toSet === Set("1"),
          s"both children must target seq 1, got $seqs")
        Files.writeString(barrier.resolve("go"), "")

        procs.foreach(p => assert(p.waitFor(120, TimeUnit.SECONDS),
          "child did not finish after release"))
        val codes = procs.map(_.exitValue())
        assert(codes.sorted == Seq(0, 10),
          s"expected one winner (0) + one loud loser (10), got $codes — " +
            s"child logs under $barrier")

        // the store resolves to exactly the winner's rows, from a
        // THIRD process's perspective (this test JVM — which for the
        // bucketed store also proves the catalog-free fallback read)
        val winner = codes.indexOf(0)
        val live = new SnapshotStore(path, bucket).read(spark).get
          .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
        assert(live === Seq((s"w$winner", winner + 1)))

        // manifest integrity + base version intact through the race
        val names = new java.io.File(path).listFiles().map(_.getName)
        assert(names.filter(_.startsWith("MANIFEST-")).sorted.toSeq ===
          Seq("MANIFEST-0", "MANIFEST-1"))
        assert(!names.exists(_.startsWith(".manifest-tmp")),
          "loser must clean up its tmp manifest")
        val base = new SnapshotStore(path, bucket).readAt(spark, 0)
        assert(base.isDefined && base.get.collect()
          .map(_.getString(0)).toSeq === Seq("base"))

        // the reader samples read() in a loop, so it observes a version
        // only while that version is live; before superseding the
        // winner's commit with the retry, WAIT until the reader has
        // sampled it — otherwise on a loaded box the reader JVM can be
        // descheduled through the brief winner-live window and the
        // final audit would miss a version no torn read ever produced
        val obsFile = barrier.resolve("obs-2")
        def awaitObservation(obs: String, what: String): Unit = {
          val deadline = System.nanoTime() + 120L * 1000L * 1000L * 1000L
          while (!(Files.exists(obsFile) &&
              Files.readString(obsFile).linesIterator.contains(obs))) {
            assert(reader.isAlive, "reader died mid-window; log:\n" +
              Files.readString(reader.log))
            assert(System.nanoTime() < deadline,
              s"reader never observed $what")
            Thread.sleep(50)
          }
        }
        awaitObservation(s"w$winner:${winner + 1}", "the winner's commit")

        // the loser's payload retries cleanly onto the next seq
        val loser = codes.indexOf(10)
        new SnapshotStore(path, bucket)
          .overwrite(Seq((s"w$loser", loser + 1)).toDF("k", "v"))
        assert(new SnapshotStore(path, bucket).read(spark).get
          .collect().map(_.getString(0)).toSeq === Seq(s"w$loser"))

        // reader invariant: wait until it has observed the retry
        // commit's state (so the record spans the entire window), then
        // stop it and audit every distinct observation — full committed
        // versions ONLY, in commit order, never partial/empty/loser
        val retryObs = s"w$loser:${loser + 1}"
        awaitObservation(retryObs, "the retry commit")
        Files.writeString(barrier.resolve("reader-stop"), "")
        assert(reader.waitFor(60, TimeUnit.SECONDS), "reader hung on stop")
        assert(reader.exitValue() === 0, "reader exited non-zero; log:\n" +
          Files.readString(reader.log))
        val observations = Files.readString(obsFile).linesIterator.toSeq
        assert(observations ===
          Seq("base:0", s"w$winner:${winner + 1}", retryObs),
          s"reader must see exactly the committed versions in order, " +
            s"got $observations")
      } finally (procs :+ reader).foreach(_.destroyForcibly())
    }
  }
}
