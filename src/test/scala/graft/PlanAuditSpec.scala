package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** The manual `.explain` sweep as a regression gate: every
  * cheap-to-construct query's physical plan must stay free of
  * cartesian products and unpruned scans. (Keys whose CONSTRUCTION
  * runs jobs — iterative clustering, IVF training, streaming fixtures,
  * bucketed-table writes, tfidf's corpus count — are audited by their
  * own suites instead; building them here would re-run those jobs.) */
class PlanAuditSpec extends SparkSuite {

  private val expensive = Set(
    "dedup_cluster", "similarity_ivf", "text_tfidf", "join_bucketed",
    "events_pruned", "ingest_e2e_products", "ingest_e2e_control")
  // similarity_ivf's 16-row broadcast-model scoring is the one sanctioned
  // nested-loop join (it is excluded above anyway — kept for clarity)
  private val bnljAllowed = Set("similarity_ivf")

  private def leaves(p: SparkPlan): Seq[SparkPlan] = p.collectLeaves()

  test("no cartesian product; every parquet scan is column-pruned") {
    val dir = TestSpark.sfDir
    val audited = SparkEntry.queries.keys.filterNot(expensive).toSeq.sorted
    val failures = audited.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan
      val cart = plan.collect { case c: CartesianProductExec => c }
      val bnlj =
        if (bnljAllowed(name)) Nil
        else plan.collect { case j: BroadcastNestedLoopJoinExec => j }
      val wideScans = leaves(plan).collect {
        case l if l.nodeName.contains("Scan") && l.output.length >= 9 => l
      }
      (cart.map(_ => s"$name: CartesianProduct") ++
        bnlj.map(_ => s"$name: BroadcastNestedLoopJoin") ++
        wideScans.map(s => s"$name: scan reads ${s.output.length} cols"))
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    assert(audited.size >= 50, s"audit shrank to ${audited.size} keys")
  }
}
