package graft.ingest

import java.nio.file.Files
import java.util.concurrent.TimeUnit

import graft.SparkSuite

/** CRASH-safety for [[SnapshotStore]] — kill, not race: a committer
  * SIGKILLed mid-commit (a real forked JVM, destroyForcibly) at the two
  * held stages the commit protocol exposes:
  *
  *  - `crash-post-tmp`: version dir + tmp manifest fully written, the
  *    atomic rename never attempted — the widest crash window;
  *  - `crash-mid-tmp`: killed INSIDE the tmp-manifest body write, half
  *    the pointer flushed — the torn-file case.
  *
  * Invariants, on both store layouts: the store stays readable at the
  * old version throughout (a tmp file — torn or complete — is never
  * taken for a manifest, because readers resolve only `MANIFEST-<seq>`
  * names); the next commit SUCCEEDS over the debris and its GC sweeps
  * both the stale tmp (age-gated — here staleTmpMs=0) and the crashed
  * committer's orphan version dir. */
class SnapshotCrashSpec extends SparkSuite {

  import spark.implicits._
  import ForkedJvm.{awaitFile, forkChild}

  for ((label, bucketed) <- Seq("plain parquet" -> false,
        "bucketed" -> true);
      (stage, mode) <- Seq(
        "after the tmp-manifest write" -> "crash-post-tmp",
        "mid tmp-manifest write (torn file)" -> "crash-mid-tmp"))
  test(s"SIGKILL a committer $stage: store intact, " +
      s"next commit cleans the debris ($label)") {
    withTmpDir { dir =>
      val path = dir.resolve("s").toString
      val barrier = Files.createDirectories(dir.resolve("barrier"))
      val bucket = if (bucketed) Some(("k", 4)) else None
      new SnapshotStore(path, bucket)
        .overwrite(Seq(("base", 0)).toDF("k", "v"))

      val proc = forkChild("graft.ingest.SnapshotRaceChild",
        Seq(path, bucketed.toString, barrier.toString, "0", mode),
        barrier, 0)
      try {
        awaitFile(barrier.resolve("ready-0"), s"$mode hold point",
          alive = Seq(proc))
        proc.destroyForcibly() // SIGKILL — no shutdown hooks, no cleanup
        assert(proc.waitFor(30, TimeUnit.SECONDS), "kill did not land")

        // the crash left real debris: a tmp manifest (torn in the
        // mid-write stage) and an orphan version dir
        def names() = new java.io.File(path).listFiles().map(_.getName)
        assert(names().exists(_.startsWith(".manifest-tmp")),
          "precondition: the crash must leave a tmp manifest behind")
        assert(names().count(_.startsWith("v-")) === 2,
          "precondition: the crash must leave its version dir behind")

        // debris is inert: a fresh store resolves the BASE version, and
        // the only committed manifest is seq 0
        val live0 = new SnapshotStore(path, bucket).read(spark).get
          .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
        assert(live0 === Seq(("base", 0)))
        assert(new SnapshotStore(path, bucket).versions(spark) === Seq(0L))

        // the next commit succeeds over the debris and sweeps it
        new SnapshotStore(path, bucket, staleTmpMs = 0L)
          .overwrite(Seq(("next", 1)).toDF("k", "v"))
        val after = names()
        assert(!after.exists(_.startsWith(".manifest-tmp")),
          s"stale tmp manifest must be GC'd, got ${after.toSeq}")
        assert(after.filter(_.startsWith("MANIFEST-")).sorted.toSeq ===
          Seq("MANIFEST-0", "MANIFEST-1"))
        assert(after.count(_.startsWith("v-")) === 2,
          s"orphan version dir must be GC'd, got ${after.toSeq}")
        assert(new SnapshotStore(path, bucket).read(spark).get
          .collect().map(r => (r.getString(0), r.getInt(1))).toSeq ===
          Seq(("next", 1)))
        // retention window still serves the pre-crash base version
        assert(new SnapshotStore(path, bucket).readAt(spark, 0).get
          .collect().map(_.getString(0)).toSeq === Seq("base"))
      } finally proc.destroyForcibly()
    }
  }

  for ((label, bucketed) <- Seq("plain parquet" -> false,
      "bucketed" -> true))
  test("the age gate PROTECTS a fresh tmp: a just-written tmp manifest " +
      s"survives another commit's GC sweep at the default gate ($label)") {
    // The crash tests prove stale tmps ARE swept (staleTmpMs=0); this is
    // the protective direction — a CONCURRENT committer's in-flight tmp,
    // written moments ago, must NOT be deleted by another commit's GC,
    // or its rename turns into a spurious lost-race failure. Previously
    // only implied by the cross-process race's clean loser retry.
    withTmpDir { dir =>
      val path = dir.resolve("s").toString
      val bucket = if (bucketed) Some(("k", 4)) else None
      val store = new SnapshotStore(path, bucket) // default staleTmpMs
      store.overwrite(Seq(("base", 0)).toDF("k", "v"))
      // a live committer's in-flight tmp: fully written, rename pending
      val tmp = java.nio.file.Paths.get(path,
        s".manifest-tmp-${java.util.UUID.randomUUID()}")
      Files.writeString(tmp, "v-99-in-flight")
      store.overwrite(Seq(("next", 1)).toDF("k", "v"))
      assert(Files.exists(tmp),
        "a fresh tmp manifest must survive the GC sweep at the default " +
          "age gate — deleting it would break a concurrent commit")
      // and it stayed inert: the sweep's survivor never resolves as a
      // manifest, the store reads the committed version
      assert(new SnapshotStore(path, bucket).read(spark).get
        .collect().map(_.getString(0)).toSeq === Seq("next"))
    }
  }

  test("a crash during the very FIRST commit leaves a readable empty " +
      "store, and the first retry starts cleanly at seq 0") {
    withTmpDir { dir =>
      val path = dir.resolve("s").toString
      val barrier = Files.createDirectories(dir.resolve("barrier"))
      val proc = forkChild("graft.ingest.SnapshotRaceChild",
        Seq(path, "false", barrier.toString, "0", "crash-post-tmp"),
        barrier, 0)
      try {
        awaitFile(barrier.resolve("ready-0"), "first-commit hold point",
          alive = Seq(proc))
        proc.destroyForcibly()
        assert(proc.waitFor(30, TimeUnit.SECONDS))
        val store = new SnapshotStore(path, staleTmpMs = 0L)
        assert(!store.exists(spark), "torn first commit must not exist")
        assert(store.read(spark).isEmpty)
        store.overwrite(Seq(("first", 1)).toDF("k", "v"))
        assert(store.versions(spark) === Seq(0L))
        assert(store.read(spark).get.collect()
          .map(_.getString(0)).toSeq === Seq("first"))
        val names = new java.io.File(path).listFiles().map(_.getName)
        assert(!names.exists(_.startsWith(".manifest-tmp")))
      } finally proc.destroyForcibly()
    }
  }
}
