package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.query.TextSim

/** Online MinHash-LSH dedup (stream_dedup_minhash): the per-bucket
  * state machine must equal the batch operator's verified pair set —
  * arrival order and micro-batch boundaries move WHEN a pair surfaces,
  * never WHETHER — and the bucket posting lists (a List[(id, shingle
  * array)] state codec) must survive a checkpoint restart on both
  * state-store providers. */
class MinhashStreamSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def batchPairs = TextSim.dedupMinhash(spark, dir, threshold = 0.8)

  test("multi-batch drive equals the batch operator's pair set") {
    val got = MinhashStream.dedup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val want = batchPairs
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(want.nonEmpty, "fixture yields no 0.8-pairs — vacuous test")
    assert(got === want, "streaming pair set diverges from batch")
  }

  test("state IS the index: one state row per distinct band bucket") {
    // the machine's scale law is the inverse of the windowed drives'
    // (no watermark plateau — a dedup service's state is the product):
    // after draining, the state store must hold EXACTLY the persisted
    // index's bucket table, one row per distinct (band, bh) group —
    // neither dropped buckets (lost dedup coverage) nor extras
    val rows = MinhashStream.bandedDocs(spark, dir)
    val wantGroups = rows.select("band", "bh").distinct().count()
    DriveSupport.withWorkspace("graft-mh-state") { ws =>
      DriveSupport.withStreamConfs(spark) {
        import spark.implicits._
        val inDir = ws.resolve("arrivals").toString
        rows.repartitionByRange(4, col("doc_id")).write.parquet(inDir)
        val stream = spark.readStream.schema(rows.schema)
          .option("maxFilesPerTrigger", 1).parquet(inDir)
        val q = MinhashStream.machine(
            stream.as[MinhashStream.BandArrival], 0.8).toDF()
          .writeStream.format("memory")
          .queryName(DriveSupport.sinkName("mh_state"))
          .option("checkpointLocation", ws.resolve("ckpt").toString)
          .outputMode("append").start()
        DriveSupport.draining(q) {
          q.processAllAvailable()
          val st = q.lastProgress.stateOperators
          assert(st.nonEmpty, "no state operator in the progress")
          assert(st.head.numRowsTotal === wantGroups,
            s"state rows ${st.head.numRowsTotal} != index bucket " +
              s"groups $wantGroups")
        }
      }
    }
  }

  test("duplicate delivery is a state no-op: no double postings, " +
      "no re-emission") {
    // the at-least-once regime: the SAME arrivals delivered twice must
    // leave the bucket state unchanged (no doubled member lists) and
    // emit each pair set once per delivery at most — a double-insert
    // would both bloat state permanently and re-verify every pair
    val rows = MinhashStream.bandedDocs(spark, dir)
    val wantGroups = rows.select("band", "bh").distinct().count()

    // one drive helper: stream `nCopies` identical delivery files
    // through a fresh machine, return (stateRows, rawEmissions, pairs)
    def drive(nCopies: Int): (Long, Long, Set[(Long, Long, Double)]) =
      DriveSupport.withWorkspace(s"graft-mh-replay$nCopies") { ws =>
        DriveSupport.withStreamConfs(spark) {
          import spark.implicits._
          val inDir = ws.resolve("arrivals").toString
          rows.coalesce(1).write.parquet(inDir)
          val one = spark.read.parquet(inDir)
          (1 until nCopies).foreach(_ =>
            one.coalesce(1).write.mode("append").parquet(inDir))
          val stream = spark.readStream.schema(rows.schema)
            .option("maxFilesPerTrigger", 1).parquet(inDir)
          val name = DriveSupport.sinkName(s"mh_replay$nCopies")
          val q = MinhashStream.machine(
              stream.as[MinhashStream.BandArrival], 0.8).toDF()
            .writeStream.format("memory").queryName(name)
            .option("checkpointLocation", ws.resolve("ckpt").toString)
            .outputMode("append").start()
          DriveSupport.draining(q) {
            q.processAllAvailable()
            val st = q.lastProgress.stateOperators.head.numRowsTotal
            val raw = spark.table(name).count()
            val pairs = spark.table(name)
              .select("d1", "d2", "jaccard").distinct().collect()
              .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
              .toSet
            (st, raw, pairs)
          }
        }
      }

    val (st1, raw1, pairs1) = drive(1)
    val (st2, raw2, pairs2) = drive(2)
    assert(st1 === wantGroups && st2 === wantGroups,
      s"bucket count drifted: $st1 / $st2 != $wantGroups")
    // the replayed file contributes ZERO emissions (in-band multi-
    // emission of one delivery is fine and identical in both drives)
    assert(raw2 === raw1,
      s"replay re-emitted pairs: $raw2 raw vs $raw1 baseline")
    assert(pairs1 === pairs2)
    val want = batchPairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs2 === want)
  }

  private val providers: Seq[(String, Option[String])] = Seq(
    "hdfs store" -> None,
    "rocksdb store" -> Some("org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider"))

  for ((label, provider) <- providers)
    test(s"bucket postings survive a restart ($label)") {
      // straddle cut from the DATA: the first verified pair's older doc
      // is delivered before the restart, its newer partner after — the
      // pair emits only if the older doc's posting survived the stop
      val pairs = batchPairs.orderBy("d1", "d2").limit(1).collect()
      assert(pairs.nonEmpty, "fixture precondition: need a 0.8-pair")
      val cut = pairs(0).getLong(1) // deliver doc_id < cut first
      assert(pairs(0).getLong(0) < cut, "pair cannot straddle the cut")

      val rows = MinhashStream.bandedDocs(spark, dir)
      DriveSupport.withWorkspace("graft-restart-mh") { ws =>
        DriveSupport.withStreamConfs(spark, provider = provider) {
          import spark.implicits._
          val inDir = ws.resolve("arrivals").toString
          rows.filter(col("doc_id") < cut).coalesce(1).write.parquet(inDir)
          val buf = new ConcurrentLinkedQueue[Row]
          val ckpt = ws.resolve("ckpt").toString
          def run(deliver: => Unit): Unit = {
            val stream = spark.readStream.schema(rows.schema)
              .parquet(inDir).as[MinhashStream.BandArrival]
            val q = MinhashStream.machine(stream, 0.8).toDF()
              .writeStream.outputMode("append")
              .option("checkpointLocation", ckpt)
              .foreachBatch {
                (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
                  DriveSupport.bufferBatch(buf, b)
              }.start()
            try { q.processAllAvailable(); deliver;
              q.processAllAvailable() } finally q.stop()
          }
          run(())
          // incarnation #2 from the same checkpoint: the rest arrives
          rows.filter(col("doc_id") >= cut).coalesce(1)
            .write.mode("append").parquet(inDir)
          run(())
          val got = spark.createDataFrame(
              new java.util.ArrayList[Row](buf),
              rows.sparkSession.emptyDataset[MinhashStream.DupHit].schema)
            .distinct()
            .collect().map(r => (r.getLong(0), r.getLong(1),
              r.getDouble(2))).toSet
          val want = batchPairs.collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
          assert(got === want,
            s"$label: post-restart pair set diverges from batch")
        }
      }
    }
}
