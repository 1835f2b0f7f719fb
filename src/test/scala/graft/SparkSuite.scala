package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole forked test JVM (sbt `Test /
  * fork := true` runs every suite in a single JVM, so this is built
  * once). Mirrors the driver's Verify session: UTC, small shuffle
  * fan-out, quiet UI. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Smallest driver-provided fixture tables. */
  val sfDir = "/root/testdata/sf0.001"
}

/** Physical-plan traversal that sees through AQE. AdaptiveSparkPlanExec
  * and QueryStageExec are leaf-like nodes TreeNode.collect does NOT
  * descend into — any plan assertion using bare `.collect` is vacuously
  * green under AQE. Every plan-shape test must traverse via this. */
object PlanNodes {
  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

  def all(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _ => Nil
    }
    p +: (p.children ++ inner).flatMap(all)
  }

  def all(df: org.apache.spark.sql.DataFrame): Seq[SparkPlan] =
    all(df.queryExecution.executedPlan)
}

/** Base class: shared session + tmp-dir helper under target/. */
abstract class SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  def withTmpDir[A](f: java.nio.file.Path => A): A = {
    val dir = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/root/repo/target/test-tmp/" +
        java.util.UUID.randomUUID()))
    try f(dir)
    finally {
      import java.util.Comparator
      java.nio.file.Files.walk(dir)
        .sorted(Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
