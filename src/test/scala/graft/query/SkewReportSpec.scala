package graft.query

import org.apache.spark.sql.functions._
import graft.{SparkSuite, TestSpark}

/** Join-key skew panel ([[Profile.skewReport]]): the report's numbers
  * re-derived from the raw table — the hottest key really has the max
  * group size, the ratio is max/mean, and p99 bounds between mean and
  * max. The value surface is DuckDB-hash-gated at all SFs. */
class SkewReportSpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  test("report invariants re-derived from the raw table") {
    val rows = Profile.skewReport(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("l_orderkey", "l_partkey", "l_suppkey"))
    val li = graft.core.Tables.load(spark, dir, "lineitem")
    rows.foreach { r =>
      val (c, nKeys, nRows, maxG, p99, ratio, topKey) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), r.getLong(6))
      val sizes = li.groupBy(col(c)).agg(count(lit(1)).as("n"))
        .collect().map(x => (x.getLong(0), x.getLong(1)))
      assert(nKeys === sizes.length.toLong, s"$c n_keys")
      assert(nRows === sizes.map(_._2).sum, s"$c n_rows")
      assert(maxG === sizes.map(_._2).max, s"$c max_group")
      // hottest key: max size, ties to lowest key
      val want = sizes.filter(_._2 == maxG).map(_._1).min
      assert(topKey === want, s"$c top_key")
      val mean = nRows.toDouble / nKeys
      assert(math.abs(ratio - maxG / mean) < 1e-5, s"$c skew_ratio")
      val minG = sizes.map(_._2).min
      assert(p99 >= minG - 1e-9 && p99 <= maxG + 1e-9, s"$c p99 bounds")
    }
  }
}
