package graft.query

import graft.{SparkSuite, TestSpark}

/** dedupCluster = transitive closure of the n-gram near-dup pairs:
  * checked against the pair set it was built from, not against itself. */
class ClusterSpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  private lazy val clusters: Map[Long, Long] =
    Cluster.dedupCluster(spark, dir)
      .select("doc_id", "cluster")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private lazy val pairs: Seq[(Long, Long)] =
    TextSim.dedupNgram(spark, dir).select("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("every near-dup pair lands in the same cluster") {
    pairs.foreach { case (a, b) =>
      assert(clusters(a) === clusters(b),
        s"pair ($a,$b) split across clusters ${clusters(a)}/${clusters(b)}")
    }
    assert(pairs.nonEmpty, "fixture produced no near-dup pairs")
  }

  test("cluster label is the minimum member id, and a member itself") {
    clusters.groupBy(_._2).foreach { case (label, members) =>
      assert(members.keys.min === label)
    }
  }

  test("total mapping: one row per document, unlinked docs are singletons") {
    val n = graft.core.Tables.load(spark, dir, "documents").count()
    assert(clusters.size.toLong === n)
    val linked = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    clusters.collect { case (d, c) if !linked.contains(d) =>
      assert(c === d, s"unlinked doc $d mapped to foreign cluster $c")
    }
  }
}
