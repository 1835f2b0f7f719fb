package graft.query

import org.apache.spark.sql.functions._
import graft.{SparkSuite, TestSpark}

/** Edit-distance join ([[FuzzyJoin]]): the load-bearing claim is the
  * Ed-Join prefix filter's COMPLETENESS — the blocked form must equal
  * the unblocked brute-force predicate, pair for pair, before the
  * best-match rollup ever runs. */
class FuzzyJoinSpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  /** The unblocked truth: full levenshtein predicate + the same
    * best-match rule. */
  private def bruteForce(k: Int = 2) = {
    val parts = graft.core.Tables.load(spark, dir, "part")
      .select(col("p_partkey"), col("p_name"))
    val probes = parts.filter(col("p_partkey") % 50 === 0)
      .select(col("p_partkey").as("probe_id"),
        concat(substring(col("p_name"), 1, 2),
          expr("substring(p_name, 4)")).as("probe_name"))
    probes.crossJoin(parts)
      .withColumn("dist",
        levenshtein(col("probe_name"), col("p_name")).cast("long"))
      .filter(col("dist") <= k)
      .groupBy("probe_id", "probe_name")
      .agg(min(struct(col("dist"), col("p_partkey"), col("p_name")))
        .as("m"))
      .select(col("probe_id"), col("probe_name"),
        col("m.p_partkey").as("match_key"),
        col("m.p_name").as("match_name"), col("m.dist").as("dist"))
  }

  test("blocked form == unblocked brute force on the fixture") {
    val blocked = FuzzyJoin.joinFuzzy(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(blocked.nonEmpty, "vacuous: no probes matched")
    assert(blocked ===
      bruteForce().collect().map(_.toString).sorted.toSeq)
  }

  test("every probe finds its source part within distance 1") {
    val rows = FuzzyJoin.joinFuzzy(spark, dir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("dist") <= 1L,
        s"probe ${r.getAs[Long]("probe_id")} best match is farther " +
          "than its own source")
    }
    // the probe set is every 50th part — all of them must surface
    val nProbes = graft.core.Tables.load(spark, dir, "part")
      .filter(col("p_partkey") % 50 === 0).count()
    assert(rows.length.toLong === nProbes)
  }
}
