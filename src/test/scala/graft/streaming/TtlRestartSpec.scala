package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{TTLConfig, Trigger}

import graft.SparkSuite

/** TTL'd `transformWithState` state ACROSS a checkpoint restart — the
  * two halves of the contract a churning-keys production job restarts
  * against, neither previously tested (RestartRecoverySpec proves tws
  * recovery without TTL; StreamScale's tws_ttl measures eviction
  * within one incarnation):
  *
  *  1. UNEXPIRED state survives the restart — the TTL index rides the
  *     RocksDB snapshot/changelog like the primary rows, and a running
  *     count continues (a lost or mis-restored TTL'd ValueState would
  *     restart the count from zero);
  *  2. state whose TTL elapsed WHILE THE QUERY WAS DOWN is gone after
  *     recovery — expiration is wall-clock against the persisted
  *     expiry timestamp, not "time the query was running", so a
  *     restarted job must NOT resurrect keys that died during the
  *     outage.
  *
  * Drive mechanics: TimeMode.ProcessingTime (which a non-NONE TTL
  * selects) makes `processAllAvailable` never settle — the operator
  * always requests another micro-batch for timer/TTL work — so each
  * incarnation runs a throttled processing-time trigger and polls the
  * progress stream for its delivery's consumption (the StreamScale
  * tws_ttl pattern), draining emissions through the capped
  * DriveSupport.bufferBatch. */
class TtlRestartSpec extends SparkSuite {

  private val rocks = Some("org.apache.spark.sql.execution.streaming." +
    "state.RocksDBStateStoreProvider")

  private def mkEvents(users: Seq[Long]): DataFrame = {
    import spark.implicits._
    users.map(u => (u, "purchase",
        new java.sql.Timestamp(86400000L * (u + 1)), 100.0))
      .toDF("user_id", "event_type", "ts", "value")
  }

  /** Run one incarnation against `ckpt` until `expect` input rows are
    * consumed, then stop. */
  private def incarnation(out: DataFrame, ckpt: String,
      buf: ConcurrentLinkedQueue[Row], expect: Long): Unit = {
    val q = out.writeStream.outputMode("update")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        DriveSupport.bufferBatch(buf, b)
      }.start()
    try {
      val deadline = System.nanoTime() + 90L * 1000000000L
      while (q.recentProgress.map(_.numInputRows).sum < expect) {
        require(System.nanoTime() < deadline,
          s"ttl restart drive stalled waiting for $expect rows")
        Thread.sleep(100)
      }
    } finally q.stop()
  }

  for ((label, ttlSec, downMs, wantN) <- Seq(
      ("unexpired state SURVIVES the restart", 300L, 0L, 2L),
      ("state expired while DOWN is gone after recovery", 2L, 5000L, 1L)))
  test(s"tws TTL across a checkpoint restart: $label") {
    DriveSupport.withWorkspace("graft-ttl-restart") { ws =>
      DriveSupport.withStreamConfs(spark, provider = rocks) {
        import spark.implicits._
        val eDir = ws.resolve("events").toString
        mkEvents(Seq(1L, 2L, 3L, 4L)).coalesce(1).write.parquet(eDir)
        val schema = spark.read.parquet(eDir).schema
        val out = EventStreams.runningTotals(
          spark.readStream.schema(schema).parquet(eDir)
            .as[EventStreams.UserEvent],
          TTLConfig(java.time.Duration.ofSeconds(ttlSec))).toDF()
        val ckpt = ws.resolve("ckpt").toString
        val buf = new ConcurrentLinkedQueue[Row]

        incarnation(out, ckpt, buf, expect = 4)
        if (downMs > 0) Thread.sleep(downMs) // the outage the TTL spans
        mkEvents(Seq(1L)).coalesce(1).write.mode("append").parquet(eDir)
        incarnation(out, ckpt, buf, expect = 1)

        import scala.jdk.CollectionConverters._
        val user1 = buf.asScala.toSeq.filter(_.getLong(0) == 1L)
          .map(_.getLong(1)) // n_events per emission
        // anti-vacuity: user 1 must have been emitted by BOTH
        // incarnations — an unprocessed second delivery would fake the
        // expired case's n=1
        assert(user1.size === 2,
          s"expected an emission from each incarnation, got $user1")
        assert(user1.max === wantN,
          s"user 1's recovered running count must be $wantN, " +
            s"got ${user1.max} (emissions: $user1)")
        // untouched users are emitted exactly once, by incarnation 1
        val others = buf.asScala.toSeq.filter(_.getLong(0) != 1L)
        assert(others.size === 3 && others.forall(_.getLong(1) == 1L))
      }
    }
  }
}
