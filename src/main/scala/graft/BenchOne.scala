package graft

import org.apache.spark.sql.SparkSession

/** Single-key bench runner for iterating on one operator's cost:
  * `runMain graft.BenchOne <key>[,<key>...]` — warmup + 2 timed runs
  * per key over SPARK_GRAFT_SF_DIR (default sf0.1), same session conf
  * as Bench. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val keys = args.headOption.map(_.split(",").toSeq)
      .getOrElse(sys.error("usage: BenchOne <key>[,<key>...]"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    keys.foreach { k =>
      val fn = SparkEntry.queries.getOrElse(k,
        sys.error(s"unknown key $k"))
      val times = (0 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"BENCHONE $k%-24s warm=${times(0)._1}%.2fs " +
        f"t1=${times(1)._1}%.2fs t2=${times(2)._1}%.2fs " +
        f"rows=${times(1)._2}")
    }
    spark.stop()
  }
}
