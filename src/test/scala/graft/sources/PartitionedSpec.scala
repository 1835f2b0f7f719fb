package graft.sources

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.{SparkSuite, TestSpark}

/** Partition pruning must be OBSERVABLE: the one-day query's scan reads
  * only that day's files, not the whole store. */
class PartitionedSpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  test("one-day query reads only one partition's files") {
    val all = Partitioned.eventsByDay(spark, dir)
    val nDays = all.select("day").distinct().count()
    assert(nDays > 1, "fixture has a single day — pruning unobservable")

    val pruned = Partitioned.eventsPruned(spark, dir)
    pruned.collect() // execute so AQE finalizes and scan metrics populate
    // AQE nests the real operators inside leaf-like stage wrappers —
    // graft.PlanNodes recurses through them to reach the scans
    val scans = graft.PlanNodes.all(pruned).collect {
      case f: FileSourceScanExec if f.metadata
        .get("Location").exists(_.contains("graft_events_by_day")) => f
    }
    assert(scans.nonEmpty, "no file scan over the partitioned store found")
    val filesRead = scans.map(_.metrics("numFiles").value).sum
    val totalFiles = all.inputFiles.length
    assert(filesRead < totalFiles,
      s"scan read $filesRead of $totalFiles files — no pruning")
    assert(scans.forall(_.metadata.get("PartitionFilters")
        .exists(_.contains("day"))),
      "plan shows no PartitionFilters on day")
  }

  test("layout never changes answers: partitioned result == direct agg") {
    val direct = {
      val ev = graft.core.Tables.load(spark, dir, "events")
      val firstDay = ev.agg(min(to_date(col("ts")))).collect()(0).getDate(0)
      ev.filter(to_date(col("ts")) === lit(firstDay))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          graft.core.Tables.moneySum(col("value")).as("total_value"))
        .orderBy("event_type")
    }
    assert(Partitioned.eventsPruned(spark, dir).collect().toSeq ===
      direct.collect().toSeq)
  }
}
