package graft.streaming

import java.nio.file.Path
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.StreamBridge

import graft.{PlanNodes, SparkSuite}

/** The streaming analogue of PlanAuditSpec's no-cartesian gate: every
  * drive's EXECUTED micro-batch plan must contain exactly the expected
  * stateful operator (and only that one) and exactly the expected
  * number of shuffles — plan shape is where a silent second exchange
  * into state, or a second stateful operator, would hide. Runs each
  * machine over a tiny staged file source (same source type as the SF
  * drives; streaming plans have no AQE, so the shape is identical at
  * any data size) and audits the IncrementalExecution via StreamBridge.
  */
class StreamPlanAuditSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def tinyEvents = {
    import spark.implicits._
    Seq(
      (1L, 101L, "view", ts("2024-01-01 09:50:00"), 1.0),
      (1L, 102L, "purchase", ts("2024-01-01 10:00:00"), 5.0),
      (2L, 103L, "view", ts("2024-01-01 10:05:00"), 2.0),
      (2L, 104L, "view", ts("2024-01-01 10:12:00"), 3.0))
      .toDF("user_id", "event_id", "event_type", "ts", "value")
  }

  /** Stage `df` once and return it as a file-source stream. */
  private def staged(ws: Path, name: String, df: DataFrame): DataFrame = {
    val d = ws.resolve(name).toString
    df.coalesce(1).write.parquet(d)
    spark.readStream.schema(df.schema).parquet(d)
  }

  /** Run one micro-batch of `build`'s output and return the executed
    * plan's nodes (AQE-aware traversal, though streaming disables AQE). */
  private def audited(mode: String, provider: Option[String] = None)
      (build: Path => DataFrame): Seq[SparkPlan] =
    DriveSupport.withWorkspace("graft-planaudit") { ws =>
      DriveSupport.withStreamConfs(spark, provider = provider) {
        val q = build(ws).writeStream.format("memory")
          .queryName(DriveSupport.sinkName("audit"))
          .option("checkpointLocation", ws.resolve("ckpt").toString)
          .outputMode(mode).start()
        DriveSupport.draining(q) {
          q.processAllAvailable()
          PlanNodes.all(StreamBridge.lastExecutedPlan(q))
        }
      }
    }

  // every stateful-operator family the engine can plan; each audit pins
  // BOTH its own operator's count and the total, so an unexpected
  // second stateful op of any kind fails the gate
  private val stateMarkers = Seq("StreamingSymmetricHashJoin",
    "SessionWindowStateStoreSave", "StateStoreSave",
    "FlatMapGroupsWithState", "TransformWithState",
    "StreamingDeduplicate")

  private def stateCount(nodes: Seq[SparkPlan], marker: String): Int =
    nodes.count(_.nodeName.contains(marker))

  // count NODES (not marker hits): "SessionWindowStateStoreSave"
  // contains "StateStoreSave" and must not count twice
  private def statefulTotal(nodes: Seq[SparkPlan]): Int =
    nodes.count(n => stateMarkers.exists(n.nodeName.contains))

  private def shuffles(nodes: Seq[SparkPlan]): Int =
    nodes.collect { case e: ShuffleExchangeExec => e }.size

  private def describe(nodes: Seq[SparkPlan]): String =
    nodes.map(_.nodeName).mkString(", ")

  private def assertShape(nodes: Seq[SparkPlan], marker: String,
      nShuffles: Int, hint: String): Unit = {
    assert(stateCount(nodes, marker) === 1,
      s"$hint: expected exactly one $marker in ${describe(nodes)}")
    assert(statefulTotal(nodes) === 1,
      s"$hint: unexpected extra stateful operator in ${describe(nodes)}")
    assert(shuffles(nodes) === nShuffles,
      s"$hint: expected $nShuffles exchanges in ${describe(nodes)}")
  }

  for (mode <- Seq("inner", "left", "full"))
    test(s"$mode interval join plans 1 symmetric-hash join, 1 exchange per side") {
      val nodes = audited("append") { ws =>
        val p = staged(ws, "p", tinyEvents
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"),
            col("value")))
        val v = staged(ws, "v", tinyEvents
          .filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("event_id"),
            col("ts").as("view_ts"), col("value")))
        mode match {
          case "inner" => EventStreams.intervalJoin(p, v, keyed = true)
          case "left" =>
            EventStreams.intervalJoinLeftOuter(p, v, keyed = true)
          case "full" =>
            EventStreams.intervalJoinFullOuter(p, v, keyed = true)
        }
      }
      assertShape(nodes, "StreamingSymmetricHashJoin", 2,
        s"ivj $mode")
    }

  test("session_window plans 1 session state op, 1 exchange") {
    val nodes = audited("append") { ws =>
      EventStreams.sessions(staged(ws, "e", tinyEvents
        .select(col("user_id"), col("ts"), col("value"))))
    }
    assertShape(nodes, "SessionWindowStateStoreSave", 1, "session_window")
  }

  test("fMGWS session tracker plans 1 state op, 1 exchange") {
    import spark.implicits._
    val nodes = audited("append") { ws =>
      EventStreams.sessionTracker(staged(ws, "e", tinyEvents
        .select(col("user_id"), col("event_type"), col("ts"),
          col("value")))
        .as[EventStreams.UserEvent]).toDF()
    }
    assertShape(nodes, "FlatMapGroupsWithState", 1, "tracker")
  }

  test("dropDuplicatesWithinWatermark plans 1 dedup state op, 1 exchange") {
    val nodes = audited("append") { ws =>
      EventStreams.dedup(staged(ws, "e", tinyEvents
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts"), col("value"))))
    }
    assertShape(nodes, "StreamingDeduplicate", 1, "dedup")
  }

  test("windowed top-k plans 1 stateful aggregate, 1 exchange") {
    val nodes = audited("append") { ws =>
      EventStreams.windowedTopK(staged(ws, "e", tinyEvents
        .select(col("event_id"), col("ts"), col("value"))))
    }
    assertShape(nodes, "StateStoreSave", 1, "windowed top-k")
  }

  test("transformWithState plans 1 state op, 1 exchange") {
    import spark.implicits._
    val nodes = audited("update", provider = Some(
      "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")) { ws =>
      EventStreams.runningTotals(staged(ws, "e", tinyEvents
        .select(col("user_id"), col("event_type"), col("ts"),
          col("value")))
        .as[EventStreams.UserEvent]).toDF()
    }
    assertShape(nodes, "TransformWithState", 1, "transformWithState")
  }
}
