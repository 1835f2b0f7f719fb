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
  }
}
