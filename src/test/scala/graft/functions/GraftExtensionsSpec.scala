package graft.functions

import org.apache.spark.sql.SparkSession

import graft.SparkSuite

/** End-to-end injection: a session BUILT with GraftExtensions resolves
  * the graft SQL functions without any registerAll call. */
class GraftExtensionsSpec extends SparkSuite {

  test("a session built with GraftExtensions resolves graft functions") {
    val base = spark // materialize the shared context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = try SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      finally {
        SparkSession.setDefaultSession(base)
        SparkSession.setActiveSession(base)
      }
    assert(s2 ne base, "builder reused the base session — not injected")
    val cos = s2.sql(
      "SELECT cosine_sim(array(3.0D, 4.0D), array(3.0D, 4.0D)) AS c")
      .collect()(0).getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
    val dot = s2.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(dot === 11.0)
    val sh = s2.sql("SELECT simhash64(array('a', 'b')) AS h")
      .collect()(0).getLong(0)
    val sh2 = s2.sql("SELECT simhash64(array('a', 'b')) AS h")
      .collect()(0).getLong(0)
    assert(sh === sh2) // resolves through the injected registry, stable

    // injected optimizer rule: the reference-shaped literal regex
    // becomes a substring probe; a metacharacter term stays a regex
    import s2.implicits._
    // a file-backed relation: ConvertToLocalRelation would otherwise
    // evaluate the filter at optimization time and hide the expression
    val part = s2.read.parquet(s"${graft.TestSpark.sfDir}/part.parquet")
    def optimized(pattern: String): String = part
      .filter(org.apache.spark.sql.functions.col("p_name").rlike(pattern))
      .queryExecution.optimizedPlan.toString
    assert(optimized("(?i).*BOLT.*").contains("Contains(translate(") &&
      !optimized("(?i).*BOLT.*").contains("RLIKE"),
      "literal term must rewrite to a translated contains")
    assert(optimized("(?i).*b.lt.*").contains("RLIKE"),
      "metacharacter term must keep the regex")
    // ASCII-only fold parity: lower('İ') would CONTAIN 'i' (combining
    // dot), but Java's (?i) does not match it — nor may the rewrite
    val tricky = Seq("İSTANBUL", "istanbul").toDF("s").repartition(1)
    val trickyHits = tricky
      .filter(org.apache.spark.sql.functions.col("s").rlike("(?i).*i.*"))
      .as[String].collect().toSeq
    assert(trickyHits === Seq("istanbul"),
      s"rewrite must keep ASCII-only case folding, got $trickyHits")
    // and the rewrite is semantics-preserving: rewritten regex search
    // equals the literal-contains form on the same data
    val viaRegex = part
      .filter(org.apache.spark.sql.functions.col("p_name")
        .rlike("(?i).*BOLT.*"))
      .select("p_partkey").as[Long].collect().sorted.toSeq
    val viaContains = part
      .filter(org.apache.spark.sql.functions
        .lower(org.apache.spark.sql.functions.col("p_name"))
        .contains("bolt"))
      .select("p_partkey").as[Long].collect().sorted.toSeq
    assert(viaRegex === viaContains && viaRegex.nonEmpty)
  }
}
