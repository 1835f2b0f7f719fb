package graft.query

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables

/** Throwaway stage profiler for the curate chain (not a test — a main
  * run by hand while hunting the next plan win):
  * `sbt "Test/runMain graft.query.CurateStageProf"`. */
object CurateStageProf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    // warm the fixture read
    val docs = Tables.load(spark, dir, "documents")
    docs.count()

    (1 to 2).foreach { round =>
      println(s"--- pass $round")
      val wDedup = Window.partitionBy("canon_md5")
        .orderBy(col("doc_id").asc)
      val canon = docs
        .withColumn("canon_md5", TextSim.canonicalMd5(col("text")))
        .withColumn("rn", row_number().over(wDedup))
        .filter(col("rn") === 1)
        .drop("canon_md5", "rn")
      t("canon window")(canon.count())
      val pairs = TextSim.dedupMinhashStarOf(canon, threshold = 0.8)
      t("minhash star pairs")(pairs.count())
      val labels = Cluster.connectedComponents(
        pairs.select(col("d1").as("src"), col("d2").as("dst")))
      t("connected components")(labels.count())
      val reps0 = canon.join(labels, Seq("doc_id"), "left")
        .filter(coalesce(col("cluster"), col("doc_id")) === col("doc_id"))
        .drop("cluster")
      val survivors = t("reps localCheckpoint")(reps0.localCheckpoint())
      val kept = t("substring kept toks")(
        survivors.drop("text").join(
          TextSim.substringKeptToksOf(survivors)
            .select(col("doc_id"), col("toks")), Seq("doc_id"))
          .localCheckpoint())
      t("full chain e2e")(TextQuality.curateFullOf(docs,
        scrubSpans = true).count())
    }
    spark.stop()
  }
}
