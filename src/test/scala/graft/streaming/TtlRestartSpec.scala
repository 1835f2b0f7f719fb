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
  * incarnation runs a throttled processing-time trigger and waits for
  * a PROGRESS entry whose file-source offset covers its delivery
  * (progress is emitted after the batch commits, so the delivery's
  * emissions are in the buffer when the wait returns), draining
  * through the capped DriveSupport.bufferBatch.
  *
  * foreachBatch is AT-LEAST-ONCE: a stop landing between sink output
  * and commit-log write makes the next incarnation re-execute that
  * batch, duplicating its emissions. Every assertion here is therefore
  * replay-tolerant: per-incarnation buffers, per-user MAX counts (a
  * replayed emission repeats an already-seen count, never a larger
  * one), and delivery processing established via the committed offset
  * — not emission cardinality. */
class TtlRestartSpec extends SparkSuite {

  private val rocks = Some("org.apache.spark.sql.execution.streaming." +
    "state.RocksDBStateStoreProvider")

  private def mkEvents(users: Seq[Long]): DataFrame = {
    import spark.implicits._
    users.map(u => (u, "purchase",
        new java.sql.Timestamp(86400000L * (u + 1)), 100.0))
      .toDF("user_id", "event_type", "ts", "value")
  }

  /** Run one incarnation against `ckpt` until a progress entry shows
    * the file source committed through `untilLogOffset`, then stop. */
  private def incarnation(out: DataFrame, ckpt: String,
      buf: ConcurrentLinkedQueue[Row], untilLogOffset: Long): Unit = {
    val q = out.writeStream.outputMode("update")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        DriveSupport.bufferBatch(buf, b)
      }.start()
    try {
      val deadline = System.nanoTime() + 90L * 1000000000L
      def committed: Boolean = q.recentProgress.exists(p =>
        p.sources.nonEmpty && "\\d+".r
          .findFirstIn(String.valueOf(p.sources(0).endOffset))
          .exists(_.toLong >= untilLogOffset))
      while (!committed) {
        require(System.nanoTime() < deadline,
          s"ttl restart drive stalled before logOffset $untilLogOffset")
        Thread.sleep(100)
      }
    } finally q.stop()
  }

  /** Max emitted n_events per user in a buffer — the replay-stable
    * view (a replayed batch repeats counts, never invents larger). */
  private def maxN(buf: ConcurrentLinkedQueue[Row]): Map[Long, Long] = {
    import scala.jdk.CollectionConverters._
    buf.asScala.toSeq.groupBy(_.getLong(0))
      .map { case (u, rows) => u -> rows.map(_.getLong(1)).max }
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
        val buf1 = new ConcurrentLinkedQueue[Row]
        val buf2 = new ConcurrentLinkedQueue[Row]

        // incarnation 1 commits the first delivery (logOffset 0)
        incarnation(out, ckpt, buf1, untilLogOffset = 0)
        if (downMs > 0) Thread.sleep(downMs) // the outage the TTL spans
        mkEvents(Seq(1L)).coalesce(1).write.mode("append").parquet(eDir)
        // incarnation 2 commits the second delivery (logOffset 1) —
        // established via the offset, not emission counts, so a
        // replayed first batch cannot satisfy the wait spuriously
        incarnation(out, ckpt, buf2, untilLogOffset = 1)

        // incarnation 1 saw every user exactly once (replay-stable max)
        assert(maxN(buf1) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L),
          s"incarnation 1 emissions: ${maxN(buf1)}")
        // anti-vacuity + the TTL contract: incarnation 2 EMITTED user 1
        // (its delivery committed per the offset wait), and the
        // recovered running count is wantN — 2 when unexpired state
        // survived, 1 when the outage expired it. A replayed
        // incarnation-1 batch only repeats n=1 rows and cannot raise
        // (survived case) or fake (expired case) the max.
        val m2 = maxN(buf2)
        assert(m2.contains(1L),
          s"incarnation 2 must emit user 1, got $m2")
        assert(m2(1L) === wantN,
          s"user 1's recovered running count must be $wantN, got $m2")
        // untouched users never advance past 1 in either incarnation
        (maxN(buf1) ++ (m2 - 1L)).filterNot(_._1 == 1L).foreach {
          case (u, n) => assert(n === 1L, s"user $u advanced to $n")
        }
      }
    }
  }
}
