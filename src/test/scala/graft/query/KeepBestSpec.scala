package graft.query

import org.apache.spark.sql.functions._
import graft.{SparkSuite, TestSpark}

/** Quality-aware cluster representative selection
  * ([[Cluster.dedupKeepBest]]): one kept member per cluster, the kept
  * member is the longest (ties to lowest doc_id), and the membership
  * is exactly [[Cluster.dedupClusterMinhash]]'s non-singleton
  * clusters. */
class KeepBestSpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  test("one kept representative per cluster; keep rule = longest " +
      "member, ties to lowest doc_id") {
    import spark.implicits._
    val out = Cluster.dedupKeepBest(spark, dir)
      .as[(Long, Long, Long, Boolean, Long)].collect()
    assert(out.nonEmpty, "fixture has no near-dup clusters")
    val toks = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        size(TextSim.tokens(col("text"))).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    out.groupBy(_._2).foreach { case (cluster, members) =>
      assert(members.length >= 2, s"cluster $cluster: singleton emitted")
      assert(members.length === members.head._5,
        s"cluster $cluster: cluster_size mismatch")
      val kept = members.filter(_._4)
      assert(kept.length === 1, s"cluster $cluster: ${kept.length} kept")
      val keepId = kept.head._1
      assert(members.forall(_._3 == keepId),
        s"cluster $cluster: keep_id disagrees across members")
      val want = members.map(_._1)
        .minBy(id => (-toks(id), id)) // longest, then lowest id
      assert(keepId === want,
        s"cluster $cluster: kept $keepId, want $want")
    }
  }

  test("membership is exactly dedupClusterMinhash's non-singleton " +
      "clusters") {
    import spark.implicits._
    val kb = Cluster.dedupKeepBest(spark, dir)
      .select("doc_id", "cluster").as[(Long, Long)].collect().toSet
    val cm = Cluster.dedupClusterMinhash(spark, dir)
      .filter(col("cluster_size") >= 2)
      .select("doc_id", "cluster").as[(Long, Long)].collect().toSet
    assert(kb === cm)
  }
}
