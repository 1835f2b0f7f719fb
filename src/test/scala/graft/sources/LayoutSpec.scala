package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.{PlanNodes, SparkSuite, TestSpark}
import graft.core.Tables

/** Z-order layout: the Morton code must interleave correctly, and the
  * clustered layout must actually PRUNE — fewer rows surviving the
  * parquet scan than the same query over an unclustered copy. */
class LayoutSpec extends SparkSuite {

  import spark.implicits._

  test("zValue interleaves bits (a even, b odd)") {
    val out = Seq((3L, 0L), (0L, 1L), (3L, 3L), (5L, 2L))
      .toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"))).as[Long].collect().toSeq
    // (11, 00) -> 0101; (00, 01) -> 10; (11, 11) -> 1111;
    // (101, 010) -> b2 a2 b1 a1 b0 a0 = 011001 = 25
    assert(out === Seq(5L, 2L, 15L, 25L))
  }

  test("z-order layout prunes the box scan; unclustered copy cannot") {
    val dir = TestSpark.sfDir

    def scanRows(df: DataFrame): Long = {
      df.collect()
      // AQE traversal can reach the same scan via stage reuse — dedupe
      // by node identity or the metric double-counts
      PlanNodes.all(df)
        .collect { case s: FileSourceScanExec => s }
        .distinctBy(System.identityHashCode)
        .map(_.metrics("numOutputRows").value).sum
    }

    withTmpDir { ws =>
      // unclustered control: same file count, clustered on the WRONG
      // (single, unrelated) dimension — what a naive layout gives you
      Tables.load(spark, dir, "lineitem")
        .repartitionByRange(16, col("l_orderkey"))
        .write.parquet(ws.resolve("plain").toString)

      def box(df: DataFrame): DataFrame =
        df.filter(col("l_partkey").between(1, 40) &&
            col("l_suppkey").between(1, 10))
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            "l_quantity")

      // box() with no sort on either side: a global orderBy adds a
      // range-sampling pass that re-executes the scan and doubles its
      // numOutputRows metric — not a pruning difference
      val zRows = scanRows(
        box(spark.read.parquet(Layout.ensureZordered(spark, dir))))
      val pRows = scanRows(
        box(spark.read.parquet(ws.resolve("plain").toString)))
      info(s"scan rows after pruning: zorder=$zRows plain=$pRows")
      assert(zRows < pRows / 2,
        s"z-order must prune at least half the scan ($zRows vs $pRows)")

      // layout never changes the answer
      val zres = Layout.scanZorder(spark, dir)
        .collect().map(_.toString).sorted.toSeq
      val pres = box(Tables.load(spark, dir, "lineitem"))
        .orderBy("l_orderkey", "l_linenumber")
        .collect().map(_.toString).sorted.toSeq
      assert(zres === pres)
    }
  }
}
