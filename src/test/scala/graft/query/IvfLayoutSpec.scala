package graft.query

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.types.LongType

import graft.{SparkSuite, TestSpark}

/** The IVF scaladoc's 100 TB claim — "one cell ↔ one partition
  * bucket; queries touch nprobe partitions instead of the full scan" —
  * as an ON-DISK observability gate (PartitionedSpec's contract
  * applied to the ANN index): the inverted file is laid out
  * `partitionBy(cid)`, the probe path turns the probed cids into
  * literal partition filters, and the executed scan must read only
  * those cells' files. */
class IvfLayoutSpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  test("cells read back with cid as a LongType column (schema sidecar)") {
    val (_, cells) = Ivf.ensureIndex(spark, dir)
    assert(cells.schema("cid").dataType === LongType,
      "partition-dir type inference leaked through the schema sidecar")
    assert(cells.columns.toSeq === Seq("vec_id", "cid", "embedding"),
      "sidecar must pin the writer's column order")
  }

  test("probe scan shows PartitionFilters on cid and reads only probed cells") {
    val (_, cells) = Ivf.ensureIndex(spark, dir)
    val nCells = cells.select("cid").distinct().count()
    assert(nCells > 10, s"index has $nCells cells — pruning unobservable")

    // nprobe=1: 10 queries probe ≤ 10 of the ~16 cells, so a pruned
    // scan MUST touch strictly fewer files than the store holds
    val q = Ivf.similarityIvf(spark, dir, k = 5, nprobe = 1)
    q.collect() // execute so AQE finalizes and scan metrics populate
    val scans = graft.PlanNodes.all(q).collect {
      case f: FileSourceScanExec if f.metadata
        .get("Location").exists(_.contains("graft-ivf")) => f
    }
    assert(scans.nonEmpty, "no file scan over the IVF cell store found")
    assert(scans.forall(_.metadata.get("PartitionFilters")
        .exists(f => f.contains("cid") && f.contains("IN"))),
      "plan shows no literal IN partition filter on cid")
    val filesRead = scans.map(_.metrics("numFiles").value).sum
    val totalFiles = cells.inputFiles.length
    assert(filesRead < totalFiles,
      s"scan read $filesRead of $totalFiles files — no file-level pruning")
  }

  test("layout never changes answers: partitioned probe == pre-layout plan") {
    // re-derive the probe-and-score result from the same persisted
    // index WITHOUT the partition-pruning filter: same rows prove the
    // layout is a pure access-path change
    val (cent, cells) = Ivf.ensureIndex(spark, dir)
    val pruned = Ivf.similarityIvf(spark, dir, k = 5).collect().toSeq
    val e = graft.core.Tables.load(spark, dir, "embeddings")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val probeW = Window.partitionBy("query_id")
      .orderBy(col("qcos").desc, col("cid").asc)
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .crossJoin(broadcast(cent))
      .withColumn("qcos", graft.functions.cosine_sim(col("qv"), col("cvec")))
      .withColumn("prn", row_number().over(probeW))
      .filter(col("prn") <= 8)
      .select(col("query_id"), col("qv"), col("cid").as("probe_cid"))
    val scored = cells.join(broadcast(probes),
        cells("cid") === probes("probe_cid") &&
          col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(graft.functions.cosine_sim(col("qv"), col("embedding")), 4)
          .as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    val unpruned = scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select("query_id", "rank", "neighbor_id", "cos")
      .orderBy("query_id", "rank").collect().toSeq
    assert(pruned === unpruned)
  }
}
