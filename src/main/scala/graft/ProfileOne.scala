package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import scala.collection.concurrent.TrieMap

/** Job/stage-level profiler for one bench key (guide §1: measure
  * first). Runs the key once untimed (warmup: codegen + footer
  * caches), then once with a listener that records every Spark job and
  * stage — the local-mode stand-in for the Spark UI's Jobs/Stages
  * pages (the UI is disabled in the bench session). Prints: job count
  * and total wall, then the stages sorted by wall time with task
  * counts, summed task run time (CPU-side cost) and the stage's
  * call-site name — which is how a 1-task stage burning a second of
  * CPU (post-AQE-coalesce serialization of CPU-heavy work) or a
  * 50-job driver-roundtrip profile (iterative loops, checkpoint
  * actions) becomes visible.
  *
  * Usage: runMain graft.ProfileOne <key> [<key> ...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object ProfileOne {
  private final case class StageRec(name: String, submitted: Long,
    completed: Long, tasks: Int, taskTimeMs: Long)

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

    val taskMs = new TrieMap[Int, Long] // stageId -> summed task run time
    val stages = new TrieMap[Int, StageRec]
    @volatile var jobs = 0
    @volatile var jobWallMs = 0L
    val jobStart = new TrieMap[Int, Long]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs += 1; jobStart.put(js.jobId, js.time)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobStart.get(je.jobId).foreach(t0 => jobWallMs += je.time - t0)
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskInfo != null)
          taskMs.updateWith(te.stageId)(v =>
            Some(v.getOrElse(0L) + te.taskInfo.duration))
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        // RDD operation scopes name the SQL operators running in this
        // stage (Scan/Exchange/WholeStageCodegen/Generate/...) — far
        // more useful than the AQE future's call site
        val ops = si.rddInfos.flatMap(_.scope).map(_.name).distinct
          .filterNot(_ == "DeserializeToObject").mkString(",")
        stages.put(si.stageId, StageRec(
          if (ops.nonEmpty) ops else si.name,
          si.submissionTime.getOrElse(0L), si.completionTime.getOrElse(0L),
          si.numTasks, taskMs.getOrElse(si.stageId, 0L)))
      }
    }

    args.foreach { key =>
      val fn = SparkEntry.queries.getOrElse(key, sys.error(s"unknown key $key"))
      fn(spark, sfDir).count() // warmup (untimed, same as Bench)
      stages.clear(); taskMs.clear(); jobStart.clear()
      jobs = 0; jobWallMs = 0L
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(300) // let listener events drain
      val recs = stages.values.toSeq.sortBy(r => -(r.completed - r.submitted))
      val stageWall = recs.map(r => r.completed - r.submitted).sum / 1e3
      val taskTotal = recs.map(_.taskTimeMs).sum / 1e3
      println(f"\nPROFILE $key rows=$n wall=$wall%.2fs jobs=$jobs " +
        f"jobwall=${jobWallMs / 1e3}%.2fs stages=${recs.size} " +
        f"stagewall=$stageWall%.2fs tasktime=$taskTotal%.2fs")
      recs.take(25).foreach { r =>
        println(f"  stage ${(r.completed - r.submitted) / 1e3}%7.3fs " +
          f"tasks=${r.tasks}%3d tasktime=${r.taskTimeMs / 1e3}%7.3fs  " +
          r.name.take(100))
      }
    }
    spark.stop()
  }
}
