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

  test("minhash-edge clustering == ngram-edge clustering at the 0.8 bar") {
    // at test SFs the DF cap never binds and banding is contract-
    // complete (dedup_minhash_recall), so the two edge sources derive
    // the SAME >=0.8 pair set — the labelings must coincide exactly;
    // a divergence means banding dropped a pair or verify drifted
    val viaMinhash = Cluster.dedupClusterMinhash(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    val viaNgram = Cluster.dedupClusterOf(spark, dir,
        TextSim.dedupNgram(spark, dir, threshold = 0.8))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    assert(viaMinhash === viaNgram)
    assert(viaMinhash.exists(!_._4),
      "fixture produced no multi-doc cluster at 0.8 — vacuous check")
  }

  test("adversarial 1000-node chain collapses in O(log n) star rounds") {
    import spark.implicits._
    // a path graph is the worst case for naive label propagation
    // (diameter = n); large-star/small-star must finish in ~log2(n)
    // rounds — maxRounds=15 would be exceeded by any diameter-bound loop
    val n = 1000L
    val chain = (0L until n - 1).map(i => (i, i + 1)).toDF("src", "dst")
    val labels = Cluster.connectedComponents(chain, maxRounds = 15)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size === n)
    assert(labels.values.forall(_ === 0L), "chain must collapse to root 0")
  }

  test("random graphs: star rounds agree with in-JVM union-find") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val nodes = 60
      val edges = Seq.fill(50)((rnd.nextInt(nodes).toLong,
        rnd.nextInt(nodes).toLong)).filter(p => p._1 != p._2)
      // reference: classic union-find over the same edges
      val parent = Array.tabulate(nodes)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(p => Seq(p._1, p._2)).distinct
        .map(v => v -> {
          // component min under union-find
          val root = find(v.toInt)
          (0 until nodes).filter(u => find(u) == root)
            .filter(u => edges.exists(e => e._1 == u || e._2 == u)).min.toLong
        }).toMap
      val got = Cluster.connectedComponents(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"trial $trial diverged from union-find")
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
