package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.concurrent.TrieMap

/** Job-level profiler for one bench key (guide §1: measure first).
  * Runs the key once untimed (warmup: codegen + footer caches), then
  * once with a listener that records every Spark job's wall time, task
  * count and description — the local-mode stand-in for the Spark UI's
  * Jobs page (UI is disabled in the bench session). Prints a per-job
  * table plus the gap between SQL-job wall and end-to-end wall (driver
  * think time: planning, driver-side actions, non-Spark work).
  *
  * Usage: runMain graft.ProfileOne <key> [<key> ...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object ProfileOne {
  private final case class JobRec(desc: String, start: Long,
    var end: Long = 0L, var stages: Int = 0, var tasks: Int = 0)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileOne <key> [<key> ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new TrieMap[Int, JobRec]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs.put(js.jobId, JobRec(desc, js.time))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.get(je.jobId).foreach(_.end = je.time)
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        // attribute the stage to the job that contains it via timing —
        // good enough for a local profile; jobGroup would need more state
        val si = sc.stageInfo
        jobs.values.toSeq
          .filter(j => j.end == 0L || si.completionTime.forall(_ <= j.end))
          .lastOption.foreach { j => j.stages += 1; j.tasks += si.numTasks }
      }
    }

    args.foreach { key =>
      val fn = SparkEntry.queries.getOrElse(key, sys.error(s"unknown key $key"))
      // warmup (untimed, same as Bench)
      fn(spark, sfDir).count()
      jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(200) // let listener events drain
      val recs = jobs.toSeq.sortBy(_._1)
      val jobSum = recs.map { case (_, r) =>
        if (r.end > r.start) (r.end - r.start) / 1e3 else 0.0 }.sum
      println(f"\nPROFILE $key rows=$n wall=$wall%.2fs jobs=${recs.size} " +
        f"job-wall-sum=$jobSum%.2fs (overlap possible) " +
        f"gap=${wall - jobSum}%.2fs")
      recs.foreach { case (id, r) =>
        val dur = if (r.end > r.start) (r.end - r.start) / 1e3 else -1.0
        println(f"  job $id%3d ${dur}%7.3fs stages=${r.stages}%2d " +
          f"tasks=${r.tasks}%4d  ${r.desc.take(110)}")
      }
    }
    spark.stop()
  }
}
