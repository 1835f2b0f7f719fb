package graft

// Diagnostic (not a suite): classify every oracleSql key by whether
// its SQL parses/runs on spark.sql and matches the DataFrame form.
//   sbt "Test/runMain graft.SqlSweep"
import org.apache.spark.sql.SparkSession

object SqlSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    graft.core.Tables.registerAll(spark, dir)
    val keys = SparkEntry.oracleSql.keys.toSeq.sorted
    val out = keys.map { k =>
      val status =
        try {
          val viaSql = spark.sql(SparkEntry.oracleSql(k))
            .collect().map(_.toString).sorted.toSeq
          val viaDf =
            try Some(SparkEntry.queries(k)(spark, dir)
              .collect().map(_.toString).sorted.toSeq)
            catch { case e: Throwable => None }
          viaDf match {
            case Some(df) if df == viaSql => "MATCH"
            case Some(_) => "MISMATCH"
            case None => "DF_ERROR"
          }
        } catch {
          case e: org.apache.spark.sql.AnalysisException =>
            "PARSE:" + e.getMessage.linesIterator.next().take(80)
          case e: Throwable =>
            "RUN:" + (e.getClass.getSimpleName + " " +
              String.valueOf(e.getMessage).linesIterator.next().take(80))
        }
      s"$k\t$status"
    }
    out.foreach(println)
    println("SUMMARY match=" + out.count(_.endsWith("\tMATCH")) +
      " mismatch=" + out.count(_.endsWith("\tMISMATCH")) +
      " other=" + out.count(l => !l.endsWith("\tMATCH") &&
        !l.endsWith("\tMISMATCH")))
    spark.stop()
  }
}
