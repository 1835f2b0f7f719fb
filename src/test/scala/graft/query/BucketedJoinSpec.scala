package graft.query

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.{SparkSuite, TestSpark}
import graft.core.Tables
import graft.core.Tables.moneySum

/** The bucketed layout's whole value is the PLAN: the same join that
  * shuffles both fact tables in the plain layout must read bucket-aligned
  * and shuffle neither. Asserted on the physical plan, with broadcast
  * and AQE disabled so the shuffle count is unambiguous. */
class BucketedJoinSpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }.size

  private def withConf[A](pairs: (String, String)*)(f: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed join shuffles neither side; plain join shuffles both") {
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") {
      val bucketed = Bucketed.joinBucketed(spark, dir)
      val plain = {
        val o = Tables.load(spark, dir, "orders")
        val l = Tables.load(spark, dir, "lineitem")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .groupBy("o_orderstatus")
          .agg(moneySum(col("l_extendedprice")).as("sum_price"),
            count(lit(1)).as("n_lineitems"))
          .orderBy("o_orderstatus")
      }
      val (b, p) = (shuffles(bucketed), shuffles(plain))
      info(s"shuffle exchanges: bucketed=$b plain=$p")
      // the two join-input shuffles vanish; agg + sort exchanges remain
      assert(b === p - 2)
      // and the results are identical
      assert(bucketed.collect().toSeq === plain.collect().toSeq)
    }
  }
}
