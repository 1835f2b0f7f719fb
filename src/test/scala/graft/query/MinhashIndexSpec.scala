package graft.query

import org.apache.spark.sql.functions._

import graft.{SparkSuite, TestSpark}

/** Incremental MinHash-LSH index maintenance (dedup_minhash_delta):
  * the weekly-delivery regime applied to near-dup dedup. Unlike the
  * IVF delta (frozen centroids ⇒ drift bound), minhash maintenance is
  * EXACT — signatures are per-doc aggregations — so the incrementally-
  * built index must reproduce the from-scratch batch operator
  * bit-for-bit, with the delivery costing one O(delta) manifest append
  * per store. */
class MinhashIndexSpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  private def cutoff: Long = graft.core.Tables
    .load(spark, dir, "documents")
    .agg(max(col("doc_id"))).head().getLong(0) * 4 / 5 + 1

  test("delta dedup == the batch operator restricted to delta pairs") {
    val cut = cutoff
    val batch = TextSim.dedupMinhash(spark, dir, threshold = 0.8)
      .filter(col("d2") >= cut)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val delta = MinhashIndex.dedupMinhashDelta(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(delta === batch,
      "incrementally-indexed delta pairs diverge from the batch operator")
    assert(delta.nonEmpty, "fixture yields no delta pairs — vacuous test")
  }

  test("no base-vs-base pair leaks into the delta result") {
    val cut = cutoff
    val leaked = MinhashIndex.dedupMinhashDelta(spark, dir)
      .filter(col("d2") < cut).count()
    assert(leaked === 0L)
  }

  test("delivery is O(delta): both stores read base dirs PLUS a delta dir") {
    val (buckets, postings, _) = MinhashIndex.ensureIndex(spark, dir)
    for ((df, name) <- Seq((buckets, "buckets"), (postings, "postings"))) {
      val dirs = df.inputFiles
        .map(f => f.substring(0, f.lastIndexOf('/')))
        .map(d => d.replaceAll(".*/(v-\\d+)-[^/]*.*", "$1")).distinct
      assert(dirs.length >= 2,
        s"$name live manifest reads from ${dirs.mkString(",")} — append " +
          "rewrote the base instead of referencing it")
    }
  }

  test("persisted postings equal a fresh shingle pass (index is exact)") {
    val (_, postings, _) = MinhashIndex.ensureIndex(spark, dir)
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val fresh = TextSim.shingleHashesOf(docs)
    assert(postings.count() === fresh.count())
    assert(postings.except(fresh).count() === 0L)
  }

  test("a builder crashed between commits rebuilds, never double-appends") {
    // build complete, then simulate the crash window: the base
    // overwrite committed but the delta append did not (one manifest
    // on disk). The completeness check (>= 2 versions on BOTH stores)
    // must rebuild from scratch via chain-resetting overwrites, so the
    // recovered index equals the clean one — not a base-only index,
    // and not a double-appended delta. HERMETIC: staged on a private
    // copy of the corpus (own dir → own index tag/store), because the
    // chain-resetting rebuild GCs version dirs that other suites'
    // memoized plans over the SHARED fixture index still reference —
    // the documented bounded-retention tradeoff, not a defect.
    val tmp = java.nio.file.Files.createTempDirectory("graft-mhix")
      .toString
    try {
      graft.core.Tables.load(spark, dir, "documents")
        .write.parquet(s"$tmp/documents.parquet")
      val want = MinhashIndex.dedupMinhashDelta(spark, tmp)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(want.nonEmpty, "vacuous: no delta pairs on the staged copy")
      val (buckets, _, _) = MinhashIndex.ensureIndex(spark, tmp)
      val someFile = new java.io.File(buckets.inputFiles.head
        .stripPrefix("file:"))
      // store root = .../<tag>/buckets/<version-dir>/part-...
      val bucketsRoot = someFile.getParentFile.getParentFile
      val manifests = bucketsRoot.listFiles()
        .filter(_.getName.startsWith("MANIFEST-")).sortBy(_.getName)
      assert(manifests.length >= 2, "precondition: append chain missing")
      assert(manifests.last.delete(), "could not stage the crash state")
      // the local FS keeps a checksum sidecar per file; a raw delete
      // must take it too or the rebuilt manifest reads as corrupt
      new java.io.File(bucketsRoot, s".${manifests.last.getName}.crc")
        .delete()
      // a NEW session: the per-session memo must not mask disk state
      val s2 = spark.newSession()
      val got = MinhashIndex.dedupMinhashDelta(s2, tmp)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(got === want,
        "post-crash rebuild diverges from a clean build")
      val rebuilt = bucketsRoot.listFiles()
        .filter(_.getName.startsWith("MANIFEST-"))
      assert(rebuilt.length >= 2, "rebuild did not re-commit the append")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(tmp))
  }
}
