package graft.ingest

import java.nio.file.Files
import java.util.concurrent.TimeUnit

import graft.SparkSuite

/** Cross-PROCESS build race for [[StoreBootstrap]] — the hazard the
  * per-commit rename guard cannot close: two independent Spark jobs
  * both finding a cold index tag and both running the two-commit
  * (base overwrite + delta append) build. Under the pre-bootstrap
  * call-site pattern the interleaved commits could publish a chain
  * referencing the delta dir TWICE (double-counted rows no
  * `versions.size` check detects); the bootstrap makes the whole build
  * atomic — staged under a uuid'd root, published by one
  * refuse-existing-destination rename — and this spec proves it where
  * it matters: across a process boundary, with no shared memory.
  *
  * Both children ([[BootstrapRaceChild]]) stage their COMPLETE chains
  * before either publish is attempted (file barrier), so the parent
  * can assert the strongest invariant first: the root does not exist
  * until a publish wins — a reader can never observe a half-built
  * index. Then: exactly one publisher, a clean loser that loads the
  * winner's root, a 2-version chain whose content holds the delta
  * exactly ONCE, and no staging leftovers. */
class BootstrapCrossProcessRaceSpec extends SparkSuite {

  import ForkedJvm.{awaitFile, forkChild}

  test("two JVMs racing one build-or-load: single publish, " +
      "delta exactly once, no staging leaks") {
    withTmpDir { dir =>
      // nested root: the bootstrap must create the parent itself
      val root = dir.resolve("idx").resolve("tag0")
      val barrier = Files.createDirectories(dir.resolve("barrier"))
      val procs = (0 to 1).map(i => forkChild(
        "graft.ingest.BootstrapRaceChild",
        Seq(root.toString, barrier.toString, i.toString), barrier, i))
      try {
        (0 to 1).foreach { i =>
          awaitFile(barrier.resolve(s"ready-$i"),
            s"child $i publish point", alive = procs)
        }
        // both builds are COMPLETE in staging, nothing is published:
        // no process can ever observe a half-built root
        assert(!Files.exists(root),
          "root must not exist before a publish wins")
        Files.writeString(barrier.resolve("go"), "")

        procs.foreach(p => assert(p.waitFor(120, TimeUnit.SECONDS),
          "child did not finish after release"))
        val codes = procs.map(_.exitValue())
        assert(codes.sorted == Seq(0, 10),
          s"expected one publisher (0) + one loader (10), got $codes — " +
            s"child logs under $barrier")

        // the published chain: exactly two versions (base + ONE delta
        // append), content holds the delta exactly once — the
        // double-append corruption is structurally impossible
        val store = new SnapshotStore(s"$root/counts")
        assert(store.versions(spark) === Seq(0L, 1L))
        val rows = store.read(spark).get
          .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
        assert(rows === Seq(("a", 1L), ("b", 2L), ("c", 3L)),
          s"chain content corrupt: $rows")

        // loser cleaned its staging root; no .broken-* either (no
        // recovery arm fired on a healthy race)
        val siblings = root.getParent.toFile.listFiles().map(_.getName)
        assert(!siblings.exists(_.startsWith(".staging-")),
          s"staging leak: ${siblings.mkString(",")}")
        assert(!siblings.exists(_.startsWith(".broken-")),
          s"spurious recovery: ${siblings.mkString(",")}")

        // a third process (this JVM) build-or-loads the same root:
        // pure load, no republish
        var built = false
        val republished = new StoreBootstrap(root.toString).ensure(spark)(
            StoreBootstrap.chains(spark, "counts" -> 2)) { _ =>
          built = true
        }
        assert(!republished && !built,
          "a complete root must load without rebuilding")
      } finally procs.foreach(_.destroyForcibly())
    }
  }

  test("legacy incomplete root: moved aside atomically and rebuilt") {
    withTmpDir { dir =>
      import spark.implicits._
      val root = dir.resolve("idx2")
      // stage the pre-bootstrap crash window: base committed, delta
      // append never landed (a state the bootstrap itself can no
      // longer produce)
      new SnapshotStore(s"$root/counts")
        .overwrite(Seq(("stale", 9L)).toDF("w", "n"))
      val complete = StoreBootstrap.chains(spark, "counts" -> 2)
      assert(!complete(root.toString), "precondition: incomplete root")
      val published = new StoreBootstrap(root.toString)
          .ensure(spark)(complete) { b =>
        val st = new SnapshotStore(s"$b/counts")
        st.overwrite(Seq(("a", 1L)).toDF("w", "n"))
        st.append(Seq(("b", 2L)).toDF("w", "n"))
      }
      assert(published, "rebuild must publish")
      val rows = new SnapshotStore(s"$root/counts").read(spark).get
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      assert(rows === Seq(("a", 1L), ("b", 2L)))
      // the damaged chain went aside whole, not deleted — auditable
      // until the age-gated sweep takes it
      val broken = root.getParent.toFile.listFiles()
        .filter(_.getName.startsWith(".broken-idx2-"))
      assert(broken.length === 1)
    }
  }

  test("stale staging/broken leftovers are age-swept; fresh ones kept") {
    withTmpDir { dir =>
      import spark.implicits._
      val root = dir.resolve("idx3")
      val stale = Files.createDirectories(
        dir.resolve(".staging-idx3-deadbeef"))
      val fresh = Files.createDirectories(
        dir.resolve(".staging-idx3-cafe"))
      assert(stale.toFile.setLastModified(
        System.currentTimeMillis() - 7200000L))
      new StoreBootstrap(root.toString).ensure(spark)(
          StoreBootstrap.chains(spark, "counts" -> 1)) { b =>
        new SnapshotStore(s"$b/counts")
          .overwrite(Seq(("a", 1L)).toDF("w", "n"))
      }
      assert(!Files.exists(stale),
        "stale staging dir must be swept")
      assert(Files.exists(fresh),
        "a moments-old staging dir may belong to a live builder")
    }
  }
}
