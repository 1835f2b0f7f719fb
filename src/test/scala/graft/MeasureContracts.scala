package graft

// Scratch measurement harness for the round-11 contract keys — prints
// the fixture's actual margins so the thresholds/floors in
// graft.query.Contracts are measured, not guessed. Run:
//   sbt "Test/runMain graft.MeasureContracts /root/testdata/sf0.01"
// Not part of the test suite; deleted once thresholds are pinned? No —
// kept as the reproducible record of how the floors were chosen.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.query.{Contracts, Ivf, TextSim}

object MeasureContracts {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (dir <- dirs) {
      println(s"===== $dir =====")
      // minhash: full organic pair set vs banding catches, by jaccard
      val truth = TextSim.dedupNgram(spark, dir, threshold = 0.3)
      val found = TextSim.dedupMinhash(spark, dir)
        .select(col("d1"), col("d2"), lit(true).as("__hit"))
      val joined = truth.join(found, Seq("d1", "d2"), "left").cache()
      val total = joined.count()
      val missed = joined.filter(col("__hit").isNull)
        .orderBy(col("jaccard").desc)
      val nMissed = missed.count()
      println(s"minhash: ngram pairs(j>=0.3)=$total missed=$nMissed")
      missed.show(20, false)
      println("jaccard deciles of truth pairs:")
      joined.groupBy(floor(col("jaccard") * 10).as("decile"))
        .agg(count(lit(1)).as("n"),
          count(when(col("__hit").isNull, 1)).as("n_missed"))
        .orderBy("decile").show()
      joined.unpersist()

      // lsh per-query hits
      println("lsh per-query hits (of 5):")
      val t5 = TextSim.similarityTopk(spark, dir, 5)
        .select("query_id", "neighbor_id")
      t5.join(TextSim.similarityLsh(spark, dir, 5)
          .select(col("query_id"), col("neighbor_id"),
            lit(true).as("__hit")),
          Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id").agg(count(col("__hit")).as("hits"))
        .orderBy("query_id").show(20)

      // ivf per-query hits at HighRecallNprobe
      println(s"ivf per-query hits at nprobe=${Ivf.HighRecallNprobe}:")
      t5.join(Ivf.similarityIvf(spark, dir, 5,
            nprobe = Ivf.HighRecallNprobe)
          .select(col("query_id"), col("neighbor_id"),
            lit(true).as("__hit")),
          Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id").agg(count(col("__hit")).as("hits"))
        .orderBy("query_id").show(20)

      // planted-twin ann recall
      val ann = Contracts.dedupEmbeddingAnnRecall(spark, dir)
      println("ann planted twins: total=" + ann.count() +
        " missed=" + ann.filter(!col("caught")).count())

      // percentile bands + approx distinct
      println("percentile bands:")
      Contracts.approxPercentileBound(spark, dir).show()
      println("approx distinct:")
      Contracts.approxDistinctBound(spark, dir).show()

      // simhash completeness
      val sc = Contracts.simhashComplete(spark, dir)
      println("simhash: docs=" + sc.count() +
        " incomplete=" + sc.filter(!col("lsh_complete")).count())
    }
    spark.stop()
  }
}
