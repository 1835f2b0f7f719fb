package graft.ingest

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Bucket-grain copy-on-write commits ([[SnapshotStore.overwriteCow]] +
  * [[Upsert.commitDeltaCow]]): a delivery must rewrite ONLY the buckets
  * it hashes into — untouched bucket files are inherited byte-identical
  * from the previous version (hard-linked locally), and the read-back
  * content equals the full O(corpus) merge's. This is the O(delta)
  * write cost the reference's per-record Mongo upsert has natively
  * (data_processor.py:95-113). */
class BucketedCowSpec extends SparkSuite {

  import spark.implicits._

  private val nBuckets = 8

  private def snapData: DataFrame =
    (0 until 200).map(i => (s"code$i", s"name$i", i.toLong))
      .toDF("code", "name", "v")

  /** A delivery hitting few keys ⇒ few buckets. */
  private def deltaData: DataFrame =
    Seq(("code3", "updated3", 1000L), ("code7", "updated7", 1000L),
        ("newkey", "brand-new", 1000L))
      .toDF("code", "name", "v")

  private def dataFiles(dir: java.nio.file.Path): Map[String, java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    Files.list(dir).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .map(p => p.getFileName.toString -> p).toMap
  }

  private def versionDir(root: java.nio.file.Path): java.nio.file.Path = {
    import scala.jdk.CollectionConverters._
    // resolve through the manifest like a reader would: max-seq manifest
    val manifest = Files.list(root).iterator().asScala
      .filter(_.getFileName.toString.startsWith("MANIFEST-"))
      .maxBy(_.getFileName.toString.drop("MANIFEST-".length).toLong)
    root.resolve(new String(Files.readAllBytes(manifest), "UTF-8").trim)
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("untouched bucket files are inherited, not rewritten; content == full merge") {
    withTmpDir { dir =>
      val store = new SnapshotStore(dir.resolve("prod").toString,
        bucket = Some(("code", nBuckets)))
      store.overwrite(snapData)
      val v0 = versionDir(dir.resolve("prod"))
      val v0Files = dataFiles(v0)

      val snapshot = store.read(spark).get
      val touched = Upsert.commitDeltaCow(store, snapshot, deltaData,
        key = "code", version = Seq(col("v")), mergeWholly = Set.empty)
      assert(touched.nonEmpty && touched.size < nBuckets,
        s"fixture delta must touch a strict subset of buckets: $touched")

      val v1 = versionDir(dir.resolve("prod"))
      assert(v1 !== v0)
      val v1Files = dataFiles(v1)

      val bucketOf = (name: String) =>
        org.apache.spark.sql.graftbridge.Bridge.bucketId(name).get
      // every untouched v0 file is present in v1 under its ORIGINAL
      // name and is the same inode (hard link — inherited, not copied)
      val untouchedV0 = v0Files.filterNot { case (n, _) =>
        touched.contains(bucketOf(n)) }
      assert(untouchedV0.nonEmpty, "every bucket touched — vacuous")
      untouchedV0.foreach { case (name, path) =>
        val inV1 = v1Files.get(name)
        assert(inV1.isDefined, s"untouched file $name not inherited")
        assert(Files.isSameFile(path, inV1.get),
          s"untouched file $name was rewritten, not linked")
      }
      // fresh (non-inherited) files exist ONLY for touched buckets:
      // write volume is bucket-grain O(delta), never O(corpus)
      val fresh = v1Files.keySet -- v0Files.keySet
      assert(fresh.nonEmpty)
      assert(fresh.forall(n => touched.contains(bucketOf(n))),
        s"fresh files outside touched buckets: $fresh")

      // read-back equality with the full O(corpus) merge — also the
      // canary for any drift between pmod(hash(key), n) and bucketBy's
      // own assignment (a mismatch would duplicate or lose keys)
      val full = Upsert.mergeFieldsJoin(snapData, deltaData, "code",
        version = Seq(col("v")), mergeWholly = Set.empty)
      assert(sortedRows(store.read(spark).get) === sortedRows(full))
    }
  }

  test("cow chain survives GC: inherited inodes outlive their birth dir") {
    withTmpDir { dir =>
      val store = new SnapshotStore(dir.resolve("prod").toString,
        bucket = Some(("code", nBuckets)))
      store.overwrite(snapData)
      val v0 = versionDir(dir.resolve("prod"))
      var expect: DataFrame = snapData
      // three deliveries: v0's dir is GC'd after the second commit
      // (retention = live + previous), but files inherited out of it
      // must stay readable through the links
      (1 to 3).foreach { i =>
        val delta = Seq((s"code${i * 11}", s"touch$i", 1000L + i))
          .toDF("code", "name", "v")
        Upsert.commitDeltaCow(store, store.read(spark).get, delta,
          key = "code", version = Seq(col("v")), mergeWholly = Set.empty)
        expect = Upsert.mergeFieldsJoin(expect, delta, "code",
          version = Seq(col("v")), mergeWholly = Set.empty)
      }
      assert(!Files.exists(v0), "retention should have GC'd v0's dir")
      assert(sortedRows(store.read(spark).get) === sortedRows(expect))
    }
  }

  test("commitDeltaCowOnce: a replayed delivery commits nothing, the " +
      "tag memory rides every CoW commit forward, and a plain " +
      "overwrite retires it") {
    withTmpDir { dir =>
      val store = new SnapshotStore(dir.resolve("prod").toString,
        bucket = Some(("code", nBuckets)))
      store.overwrite(snapData)
      // first delivery commits
      val t1 = Upsert.commitDeltaCowOnce(store, store.read(spark).get,
        deltaData, key = "code", tag = "wk-01",
        version = Seq(col("v")), mergeWholly = Set.empty)
      assert(t1.isDefined && t1.get.nonEmpty)
      val afterFirst = sortedRows(store.read(spark).get)
      val versionsAfterFirst = store.versions(spark)
      // the at-least-once replay: same delivery, same tag — no commit,
      // no new version, content bit-unchanged
      assert(Upsert.commitDeltaCowOnce(store, store.read(spark).get,
        deltaData, key = "code", tag = "wk-01",
        version = Seq(col("v")), mergeWholly = Set.empty).isEmpty)
      assert(store.versions(spark) === versionsAfterFirst)
      assert(sortedRows(store.read(spark).get) === afterFirst)
      // a second delivery carries the FIRST's tag forward (CoW commits
      // retire the previous dir — the sidecar is the only carrier), so
      // a stale replay of delivery 1 AFTER delivery 2 still no-ops:
      // the out-of-interleaving case a blindly-idempotent merge would
      // get wrong once version columns collide
      val delta2 = Seq(("code3", "newer3", 2000L)).toDF("code", "name", "v")
      assert(Upsert.commitDeltaCowOnce(store, store.read(spark).get,
        delta2, key = "code", tag = "wk-02",
        version = Seq(col("v")), mergeWholly = Set.empty).isDefined)
      assert(store.sidecarTags(spark) === Set("wk-01", "wk-02"))
      assert(Upsert.commitDeltaCowOnce(store, store.read(spark).get,
        deltaData, key = "code", tag = "wk-01",
        version = Seq(col("v")), mergeWholly = Set.empty).isEmpty)
      // a PLAIN (tag-less) CoW delivery between exactly-once ones must
      // carry the generation's memory forward — it updates content the
      // tags still guard (the r18-review hazard: a mixed Once/non-Once
      // caller dropping the sidecar mid-generation)
      val plain = Seq(("code7", "plain7", 3000L)).toDF("code", "name", "v")
      Upsert.commitDeltaCow(store, store.read(spark).get, plain,
        key = "code", version = Seq(col("v")), mergeWholly = Set.empty)
      assert(store.sidecarTags(spark) === Set("wk-01", "wk-02"),
        "a plain CoW commit dropped the generation's tag memory")
      assert(Upsert.commitDeltaCowOnce(store, store.read(spark).get,
        deltaData, key = "code", tag = "wk-01",
        version = Seq(col("v")), mergeWholly = Set.empty).isEmpty)
      // a rebuild-from-scratch overwrite starts a new generation: the
      // old tags no longer guard anything and must not suppress
      store.overwrite(snapData)
      assert(store.sidecarTags(spark) === Set.empty)
      assert(Upsert.commitDeltaCowOnce(store, store.read(spark).get,
        deltaData, key = "code", tag = "wk-01",
        version = Seq(col("v")), mergeWholly = Set.empty).isDefined)
    }
  }

  test("cow on an empty store degrades to a plain overwrite") {
    withTmpDir { dir =>
      val store = new SnapshotStore(dir.resolve("prod").toString,
        bucket = Some(("code", nBuckets)))
      store.overwriteCow(snapData, Set(0))
      assert(sortedRows(store.read(spark).get) === sortedRows(snapData))
    }
  }

  test("plan: cow merge still reads the bucketed snapshot exchange-free") {
    withTmpDir { dir =>
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      val store = new SnapshotStore(dir.resolve("prod").toString,
        bucket = Some(("code", nBuckets)))
      store.overwrite(snapData)
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", nBuckets.toString)
      try {
        val snapshot = store.read(spark).get
        val bucketOf = pmod(hash(col("code")), lit(nBuckets))
        val merged = Upsert.mergeFieldsJoin(
          snapshot.filter(bucketOf.isin(1, 2)), deltaData, "code",
          version = Seq(col("v")), mergeWholly = Set.empty)
        merged.collect()
        val exchanges = graft.PlanNodes.all(merged)
          .count(_.isInstanceOf[ShuffleExchangeExec])
        // one exchange: the delta's collapse; the filtered bucketed
        // snapshot joins in place
        assert(exchanges === 1,
          s"expected 1 exchange (delta side only), got $exchanges")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }
}
