package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.Tables

/** Near-duplicate CLUSTERING: the step after pairwise dedup. MinHash /
  * n-gram stages emit similar PAIRS; a curation pipeline needs the
  * transitive closure — connected components — so each group of mutual
  * near-dups keeps exactly one canonical document.
  *
  * Algorithm: iterative min-label propagation over the (deterministic)
  * n-gram Jaccard pair set — every node adopts the smallest doc_id
  * reachable so far; fixpoint when no label changes. Each round is one
  * hash-partitioned join + one aggregation (both keyed on doc_id — the
  * exchange is reused across rounds), and the round count is the graph
  * diameter, which for near-dup graphs is tiny (dup groups are cliques or
  * short chains — 2 rounds at both test SFs). A 100 TB corpus with
  * adversarially long chains would swap the loop body for the
  * alternating large-star/small-star rounds of Kiveris et al.,
  * "Connected Components in MapReduce" (SoCC'14) — O(log n) rounds, same
  * join+min primitive, same output contract.
  */
object Cluster {

  /** doc_id → cluster (= min doc_id of its component) + component size.
    * Singletons cluster to themselves. Oracle twin: DuckDB recursive CTE
    * transitive closure over the identical pair set. */
  def dedupCluster(spark: SparkSession, dir: String,
      threshold: Double = 0.3, maxIters: Int = 20): DataFrame = {
    val pairs = TextSim.dedupNgram(spark, dir, threshold)
      .select(col("d1"), col("d2"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // undirected: propagate labels both ways
    val edges = pairs.union(pairs.select(col("d2"), col("d1")))
      .toDF("src", "dst")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // propagate over the LINKED subgraph only — near-dup graphs are a
    // vanishing fraction of the corpus, so iterating over every document
    // would shuffle the full doc_id set once per round for nothing;
    // unlinked docs become singletons in one final projection instead
    val docs = Tables.load(spark, dir, "documents").select("doc_id")
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster", col("doc_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      // neighbor labels flow along edges; keep the smallest seen
      val prop = edges
        .join(labels.withColumnRenamed("doc_id", "dst"), "dst")
        .select(col("src").as("doc_id"), col("cluster"))
      val next = labels.select("doc_id", "cluster").union(prop)
        .groupBy("doc_id").agg(min("cluster").as("cluster"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val changed = next.as("n")
        .join(labels.as("l"), col("n.doc_id") === col("l.doc_id"))
        .filter(col("n.cluster") =!= col("l.cluster"))
        .count() // one small driver action per round = convergence check
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    // a silent non-converged result would violate the transitive-closure
    // contract (same component, different cluster ids) — fail loudly;
    // raise maxIters (or switch to large-star/small-star) for corpora
    // with >maxIters-long near-dup chains
    if (!converged) throw new IllegalStateException(
      s"dedupCluster did not converge within $maxIters rounds")

    // truncate the iterative lineage so downstream plans don't drag the
    // whole loop along, then release the per-round caches
    val finalLabels = labels.localCheckpoint()
    labels.unpersist(); pairs.unpersist(); edges.unpersist()

    // singleton completion: every unlinked doc is its own cluster
    val mapping = docs.join(finalLabels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("doc_id")).as("cluster"))
    val sizes = mapping.groupBy("cluster")
      .agg(count(lit(1)).as("cluster_size"))
    mapping.join(sizes, "cluster")
      .select(col("doc_id"), col("cluster"), col("cluster_size"),
        (col("doc_id") === col("cluster")).as("is_canonical"))
      .orderBy("doc_id")
  }
}
