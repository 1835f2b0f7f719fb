package graft.query

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shared planted-distribution-shift corpora for the retrain-loop
  * specs (IvfRetrainSpec, SemanticRetrainSpec): fixture-shaped
  * embeddings.parquet (500 × dim-64 float), bit-deterministic.
  *
  * Shifted: queries (vec_id 0..9) + the delivery (400..499) sit in 4
  * FRESH clusters (ids 100..103 — a direction space disjoint from the
  * base's 0..15 by hash salt). Base clusters are tight (0.05 noise);
  * the fresh clusters are DIFFUSE (0.35): wide enough that under a
  * frozen base-trained model a member's nearest-centroid ranking
  * varies per member (the cluster scatters over several cells),
  * narrow enough that members are still unambiguous mates
  * (within-cluster cos ≈ 0.9 vs ≈ 0.1 across) — so only a retrained
  * centroid can gather them. Control: every row from the 16 base
  * clusters. */
object DriftFixtures {

  def writeCorpus(spark: SparkSession, dir: java.nio.file.Path,
      shifted: Boolean): String = {
    val cl =
      if (shifted)
        "CASE WHEN vec_id >= 10 AND vec_id < 400 THEN vec_id % 16 " +
          "ELSE vec_id % 4 + 100 END"
      else "vec_id % 16"
    val noise = s"CASE WHEN ($cl) >= 100 THEN 0.35 ELSE 0.05 END"
    val emb = expr(
      s"""transform(sequence(0, 63), i -> cast(
           (pmod(xxhash64('c', $cl, i), 2000001) / 1000000.0 - 1.0)
           + ($noise) *
           (pmod(xxhash64('n', vec_id, i), 2000001) / 1000000.0 - 1.0)
         as float))""")
    spark.range(500).select(col("id").as("vec_id"))
      .withColumn("embedding", emb)
      .coalesce(1)
      .write.parquet(s"$dir/embeddings.parquet")
    dir.toString
  }
}
