package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** True streaming forms of the event-time windows (B17/B18) driven
  * through MemoryStream micro-batches; results must match the batch
  * (oracle-checked) window semantics on the same rows. */
class EventStreamsSpec extends SparkSuite {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  // (user_id, event_type, ts, value)
  private val fixture = Seq(
    ("u1", "click", ts(0), 1.0),
    ("u1", "click", ts(10), 2.0),
    ("u2", "view", ts(20), 3.0),
    ("u1", "click", ts(75), 4.0),   // u1: >30m gap → new session
    ("u2", "view", ts(130), 5.0))

  private def runStream(makeQuery: org.apache.spark.sql.DataFrame =>
      org.apache.spark.sql.DataFrame, name: String) = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Timestamp, Double)]
    val events = mem.toDF()
      .toDF("user_id", "event_type", "ts", "value")
    val q = makeQuery(events).writeStream
      .format("memory").queryName(name).outputMode("complete").start()
    try {
      // two micro-batches to exercise incremental state
      mem.addData(fixture.take(3))
      q.processAllAvailable()
      mem.addData(fixture.drop(3))
      q.processAllAvailable()
      spark.table(name).collect()
    } finally q.stop()
  }

  test("streaming tumbling counts match the batch window semantics") {
    val rows = runStream(EventStreams.tumbling(_), "t_tumbling")
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(rows === Set(
      (Timestamp.valueOf("2024-01-01 10:00:00"), "click", 2L),
      (Timestamp.valueOf("2024-01-01 10:00:00"), "view", 1L),
      (Timestamp.valueOf("2024-01-01 11:00:00"), "click", 1L),
      (Timestamp.valueOf("2024-01-01 12:00:00"), "view", 1L)))
  }

  test("streaming session windows merge within the gap and split across it") {
    val rows = runStream(EventStreams.sessions(_), "t_sessions")
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(3)))
      .toSet
    assert(rows === Set(
      // u1: events at :00/:10 in one session; :75 alone (65m gap)
      ("u1", Timestamp.valueOf("2024-01-01 10:00:00"), 2L),
      ("u1", Timestamp.valueOf("2024-01-01 11:15:00"), 1L),
      // u2: :20 and :130 are 110m apart → two sessions
      ("u2", Timestamp.valueOf("2024-01-01 10:20:00"), 1L),
      ("u2", Timestamp.valueOf("2024-01-01 12:10:00"), 1L)))
  }

  test("stream-stream interval join pairs purchases with in-range views") {
    implicit val sqlCtx = spark.sqlContext
    val pMem = MemoryStream[(Long, Timestamp, Double)]
    val vMem = MemoryStream[(Long, Timestamp, Double)]
    val purchases = pMem.toDF().toDF("user_id", "ts", "value")
    val views = vMem.toDF().toDF("v_user", "view_ts", "value")
    val q = EventStreams.intervalJoin(purchases, views).writeStream
      .format("memory").queryName("t_ivj").outputMode("append").start()
    try {
      vMem.addData(Seq(
        (1L, ts(0), 10.0),   // 20 min before the purchase → in range
        (1L, ts(50), 11.0),  // after the purchase → out
        (2L, ts(15), 12.0))) // other user's purchase only
      pMem.addData(Seq((1L, ts(20), 5.0), (2L, ts(30), 6.0)))
      q.processAllAvailable()
      val rows = spark.table("t_ivj")
        .select("user_id", "view_value").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(rows === Set((1L, 10.0), (2L, 12.0)))
    } finally q.stop()
  }

  test("left-outer stream-stream join defers null-extension to the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val pMem = MemoryStream[(Long, Timestamp, Double)]
    val vMem = MemoryStream[(Long, Timestamp, Double)]
    val purchases = pMem.toDF().toDF("user_id", "ts", "value")
    val views = vMem.toDF().toDF("v_user", "view_ts", "value")
    val q = EventStreams.intervalJoinLeftOuter(purchases, views)
      .writeStream
      .format("memory").queryName("t_ivjlo").outputMode("append").start()
    try {
      def emitted() = spark.table("t_ivjlo")
        .select("user_id", "view_value").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSet
      vMem.addData(Seq((1L, ts(0), 10.0)))  // in range for u1's purchase
      pMem.addData(Seq((1L, ts(20), 5.0),
        (2L, ts(30), 6.0)))                 // u2: no view at all
      q.processAllAvailable()
      // matches emit eagerly; the unmatched row must NOT be out yet —
      // a view for u2 could still arrive under the current watermark
      assert(emitted() === Set((1L, Some(10.0))),
        "unmatched row emitted before the watermark allowed it")
      // push both watermarks far past u2's join range (wm lags one
      // micro-batch, so nudge twice)
      for (m <- Seq(300, 310)) {
        vMem.addData(Seq((99L, ts(m), 0.0)))
        pMem.addData(Seq((99L, ts(m), 0.0)))
        q.processAllAvailable()
      }
      assert(emitted().contains((2L, None)),
        "watermark passage must null-extend the unmatched purchase")
      // and exactly once: one physical null row for u2 (set-dedup would
      // mask a double emission, so count rows in the sink itself)
      assert(spark.table("t_ivjlo").where("user_id = 2").count() === 1)
    } finally q.stop()
  }

  test("full-outer stream-stream join null-extends BOTH sides exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val pMem = MemoryStream[(Long, Timestamp, Double)]
    val vMem = MemoryStream[(Long, Timestamp, Double)]
    val purchases = pMem.toDF().toDF("user_id", "ts", "value")
    val views = vMem.toDF().toDF("v_user", "view_ts", "value")
    val q = EventStreams.intervalJoinFullOuter(purchases, views)
      .writeStream
      .format("memory").queryName("t_ivjfo").outputMode("append").start()
    try {
      def emitted() = spark.table("t_ivjfo")
        .select("user_id", "view_user", "view_value").collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      vMem.addData(Seq(
        (1L, ts(0), 10.0),   // in range for u1's purchase → matches
        (3L, ts(5), 30.0)))  // u3: view no purchase will ever claim
      pMem.addData(Seq((1L, ts(20), 5.0),
        (2L, ts(30), 6.0)))  // u2: purchase with no view at all
      q.processAllAvailable()
      // the match emits eagerly; neither unmatched row may be out yet
      assert(emitted() === Set((Some(1L), Some(1L), Some(10.0))),
        "unmatched rows emitted before the watermark allowed them")
      // push both watermarks far past both join ranges (wm lags one
      // micro-batch, so nudge twice)
      for (m <- Seq(300, 310)) {
        vMem.addData(Seq((99L, ts(m), 0.0)))
        pMem.addData(Seq((99L, ts(m), 0.0)))
        q.processAllAvailable()
      }
      val out = emitted()
      assert(out.contains((Some(2L), None, None)),
        "watermark passage must null-extend the unmatched purchase")
      assert(out.contains((None, Some(3L), Some(30.0))),
        "watermark passage must null-extend the unclaimed view")
      // exactly once each — count physical sink rows, not the set
      assert(spark.table("t_ivjfo").where("user_id = 2").count() === 1)
      assert(spark.table("t_ivjfo")
        .where("view_user = 3 AND user_id IS NULL").count() === 1)
    } finally q.stop()
  }

  test("windowed top-k: the custom aggregate's merge path survives multi-batch state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val events = mem.toDF().toDF("event_id", "ts", "value")
    val q = EventStreams.windowedTopK(events, k = 2).writeStream
      .format("memory").queryName("t_wtopk").outputMode("complete").start()
    try {
      // batch 1: partial picture of window 10:00, and one 11:00 event
      mem.addData(Seq((1L, ts(0), 1.0), (2L, ts(10), 5.0),
        (10L, ts(70), 9.0)))
      q.processAllAvailable()
      // batch 2: a NEW MAX for window 10:00 arrives late — the stored
      // k-buffer must merge it in, not just append
      mem.addData(Seq((3L, ts(20), 7.0), (4L, ts(30), 2.0),
        (11L, ts(80), 7.5)))
      q.processAllAvailable()
      val rows = spark.table("t_wtopk")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1),
          r.getLong(2), r.getDouble(3))).toSet
      val w10 = Timestamp.valueOf("2024-01-01 10:00:00")
      val w11 = Timestamp.valueOf("2024-01-01 11:00:00")
      assert(rows === Set(
        (w10, 1L, 3L, 7.0), (w10, 2L, 2L, 5.0),   // late max displaced id 1
        (w11, 1L, 10L, 9.0), (w11, 2L, 11L, 7.5)))
    } finally q.stop()
  }

  test("transformWithState running totals accumulate across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // the V2 stateful operator requires the RocksDB provider; scope the
    // conf to this query (captured at start) and restore after
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(Long, String, Timestamp, Double)]
    val events = mem.toDF().toDF("user_id", "event_type", "ts", "value")
      .as[EventStreams.UserEvent]
    val q = EventStreams.runningTotals(events).writeStream
      .format("memory").queryName("t_tws").outputMode("update").start()
    try {
      mem.addData(Seq((1L, "view", ts(0), 2.0), (1L, "view", ts(1), 3.0),
        (2L, "view", ts(2), 10.0)))
      q.processAllAvailable()
      mem.addData(Seq((1L, "click", ts(3), 5.0)))
      q.processAllAvailable()
      val rows = spark.table("t_tws").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // batch 1 emits both users' partials; batch 2 re-emits u1 with
      // state carried over — NOT a fresh (1, 5.0)
      assert(rows === Set((1L, 2L, 5.0), (2L, 1L, 10.0), (1L, 3L, 10.0)))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState recovers state across a query stop/restart") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files
      .createTempDirectory("tws-recovery").toString
    val mem = MemoryStream[(Long, String, Timestamp, Double)]
    val events = mem.toDF().toDF("user_id", "event_type", "ts", "value")
      .as[EventStreams.UserEvent]
    // the memory sink refuses checkpoint recovery; foreachBatch is the
    // recovery-capable sink — collect each micro-batch into a buffer
    val buf =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double)]
    import scala.jdk.CollectionConverters._
    def bufSet = buf.asScala.toSet
    def start() = EventStreams.runningTotals(events)
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[
          EventStreams.UserRunning], _: Long) =>
        ds.collect().foreach(r => buf.add((r.user_id, r.n_events, r.total)))
      }.start()
    val q1 = start()
    try {
      mem.addData(Seq((1L, "view", ts(0), 2.0), (1L, "view", ts(1), 3.0),
        (2L, "view", ts(2), 10.0)))
      q1.processAllAvailable()
      assert(bufSet === Set((1L, 2L, 5.0), (2L, 1L, 10.0)))
    } finally q1.stop()
    // restart from the SAME checkpoint — the production property: the
    // RocksDB state (u1 → (2, 5.0)) must be restored, not rebuilt
    buf.clear()
    val q2 = start()
    try {
      mem.addData(Seq((1L, "click", ts(3), 5.0)))
      q2.processAllAvailable()
      // a fresh (state-lost) run would emit (1, 1, 5.0)
      assert(bufSet === Set((1L, 3L, 10.0)),
        s"state must continue across restart; got $bufSet")
    } finally {
      q2.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming dedup drops re-delivered events (exactly-once restore)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp, Double)]
    val events = mem.toDF().toDF("event_id", "event_type", "ts", "value")
    val q = EventStreams.dedup(events).writeStream
      .format("memory").queryName("t_dedup").outputMode("append").start()
    try {
      mem.addData(Seq((1L, "click", ts(0), 1.0), (2L, "view", ts(5), 2.0)))
      q.processAllAvailable()
      // at-least-once source re-delivers event 1 in a later micro-batch
      mem.addData(Seq((1L, "click", ts(0), 1.0), (3L, "click", ts(10), 3.0)))
      q.processAllAvailable()
      val ids = spark.table("t_dedup").select("event_id")
        .collect().map(_.getLong(0)).toSeq.sorted
      assert(ids === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("sessionTracker closes on logout immediately, on gap via watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[EventStreams.UserEvent]
    val q = EventStreams.sessionTracker(mem.toDS()).writeStream
      .format("memory").queryName("t_tracker").outputMode("append").start()
    try {
      mem.addData(Seq(
        EventStreams.UserEvent(1L, "click", ts(0), 1.0),
        EventStreams.UserEvent(1L, "click", ts(10), 2.0),
        EventStreams.UserEvent(1L, "logout", ts(12), 0.0), // closes u1
        EventStreams.UserEvent(2L, "view", ts(5), 5.0)))   // u2 stays open
      q.processAllAvailable()
      // advance the watermark far past u2's gap so its timeout fires
      mem.addData(Seq(EventStreams.UserEvent(3L, "click", ts(300), 1.0)))
      q.processAllAvailable()
      mem.addData(Seq(EventStreams.UserEvent(3L, "click", ts(301), 1.0)))
      q.processAllAvailable()
      val rows = spark.table("t_tracker")
        .select("user_id", "n_events", "session_value", "closed_by")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getString(3))).toSet
      assert(rows.contains((1L, 3L, 3.0, "logout")), s"got $rows")
      assert(rows.contains((2L, 1L, 5.0, "gap")), s"got $rows")
    } finally q.stop()
  }

  test("streaming sliding windows double-count each event across 2 windows") {
    val rows = runStream(EventStreams.sliding(_), "t_sliding")
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    // every event appears in exactly 2 sliding windows
    assert(rows.map(_._3).sum === fixture.size * 2L)
  }

  test("stream-static enrichment: every event kept, dim left-joined per batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Timestamp, Double)]
    val events = mem.toDF().toDF("user_id", "event_type", "ts", "value")
    // u3 exists only in the dim: a left join must NOT resurrect it;
    // u2 exists only in the stream: it must survive null-extended
    val dim = Seq(("u1", "gold"), ("u3", "silver")).toDF("user_id", "segment")
    val q = EventStreams.enrich(events, dim).writeStream
      .format("memory").queryName("t_enrich").outputMode("append").start()
    try {
      mem.addData(fixture.take(3))
      q.processAllAvailable()
      mem.addData(fixture.drop(3))
      q.processAllAvailable()
      val out = spark.table("t_enrich").collect()
      assert(out.length === fixture.size, "left join must keep every event")
      val pairs = out.map(r =>
        (r.getAs[String]("user_id"), r.getAs[String]("segment"))).toSet
      assert(pairs === Set(("u1", "gold"), ("u2", null)))
    } finally q.stop()
  }
}
