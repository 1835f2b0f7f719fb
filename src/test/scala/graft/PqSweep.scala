package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement main behind [[graft.query.Pq]]'s default geometry: the
  * per-query hit counts (vs brute-force top-5) across the
  * (m, ks, rerank) grid on a fixture dir. Run:
  *
  *   sbt "Test/runMain graft.PqSweep /root/testdata/sf0.1"
  *
  * r14 measurements on the uniform-random fixtures (min hits/5 over
  * the 10 standard queries):
  *
  *   | m  | ks | rerank | sf0.001 | sf0.01 | sf0.1 |
  *   |----|----|--------|---------|--------|-------|
  *   |  8 | 16 |  32    |    -    |   1    |   -   |
  *   |  8 | 16 | 128    |    4    |   5    |   1   |
  *   |  8 | 32 | 128    |    -    |   -    |   3   |
  *   | 16 | 32 | 128    |    5    |   4    |   5   |
  *
  * -> defaults m=16, ks=32, rerank=128: the coarse geometries hold at
  * 500 rows and collapse at 2000 (quantization error ~ the cosine
  * spread of uniform vectors); 4-dim subspaces give the resolution
  * back. */
object PqSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val truth = graft.query.TextSim.similarityTopk(spark, dir, 5)
      .select("query_id", "neighbor_id")
    for (m <- Seq(8, 16); ks <- Seq(16, 32); rr <- Seq(32, 128)) {
      val approx = graft.query.Pq.similarityPq(spark, dir, 5, rerank = rr,
        m = m, ks = ks)
      val hits = truth.join(
          approx.select(col("query_id"), col("neighbor_id"),
            lit(true).as("h")),
          Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id").agg(count(col("h")).as("hits"))
        .orderBy("query_id")
        .collect().map(r => r.getLong(1))
      println(s"SWEEP m=$m ks=$ks rerank=$rr hits=${hits.mkString(",")} min=${hits.min}")
    }
    spark.stop()
  }
}
