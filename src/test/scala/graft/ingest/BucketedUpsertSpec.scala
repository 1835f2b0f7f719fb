package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSuite

/** The join-form merge ([[Upsert.mergeFieldsJoin]]) must be (1)
  * bit-identical to the union-form [[Upsert.mergeFields]] on arbitrary
  * inputs, and (2) exchange-free on the snapshot side when the snapshot
  * comes from a bucketed [[SnapshotStore]] — the whole point of paying
  * the bucketed layout at commit time. */
class BucketedUpsertSpec extends SparkSuite {

  import spark.implicits._

  private def checkProp(p: Prop, minSuccessful: Int = 10): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful), p)
    assert(res.passed, res.status.toString)
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private val recordsGen: Gen[List[(String, String, Long)]] = for {
    n <- Gen.choose(1, 20)
    recs <- Gen.listOfN(n, for {
      key <- Gen.oneOf("k1", "k2", "k3", "k4")
      value <- Gen.option(Gen.alphaNumStr.map(_.take(5)))
    } yield (key, value.orNull))
  } yield recs.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }

  test("property: join-form merge ≡ union-form merge (incl. null fields)") {
    checkProp(Prop.forAll(recordsGen) { recs =>
      val delta = recs.toDF("code", "name", "v")
      val snap = Seq(("k1", "base", -1L), ("k9", "only", 100L))
        .toDF("code", "name", "v")
      val union = Upsert.mergeFields(snap, delta, "code",
        version = Seq(col("v")), mergeWholly = Set.empty)
      val join = Upsert.mergeFieldsJoin(snap, delta, "code",
        version = Seq(col("v")), mergeWholly = Set.empty)
      sortedRows(union) == sortedRows(join)
    })
  }

  test("property: join-form replay idempotence and batching invariance") {
    // the streaming pipeline now merges through the join form, so the
    // exactly-once argument rests on THESE invariants for it
    checkProp(Prop.forAll(recordsGen, Gen.choose(1, 4)) { (recs, nChunks) =>
      val snap = Seq(("k1", "base", -1L)).toDF("code", "name", "v")
      val delta = recs.toDF("code", "name", "v")
      val once = Upsert.mergeFieldsJoin(snap, delta, "code",
        version = Seq(col("v")), mergeWholly = Set.empty)
      val twice = Upsert.mergeFieldsJoin(once, delta, "code",
        version = Seq(col("v")), mergeWholly = Set.empty)
      val chunkSize = math.max(1, recs.size / nChunks)
      val chunked = recs.grouped(chunkSize).foldLeft(snap) { (acc, chunk) =>
        Upsert.mergeFieldsJoin(acc, chunk.toDF("code", "name", "v"),
          "code", version = Seq(col("v")), mergeWholly = Set.empty)
      }
      sortedRows(once) == sortedRows(twice) &&
        sortedRows(once) == sortedRows(chunked)
    }, minSuccessful = 8)
  }

  test("join-form: newer snapshot version beats an out-of-order redelivery") {
    // k9's snapshot carries version 100 — a replayed delta at v=5 must
    // NOT clobber it (blanket delta-wins would): the version struct
    // decides, exactly as in the union form
    val snap = Seq(("k9", "new", 100L)).toDF("code", "name", "v")
    val stale = Seq(("k9", "stale", 5L)).toDF("code", "name", "v")
    val out = Upsert.mergeFieldsJoin(snap, stale, "code",
        version = Seq(col("v")), mergeWholly = Set.empty)
      .select("name").as[String].collect().toSeq
    assert(out === Seq("new"))
  }

  test("join-form: schema drift, extras map merge and mergeWholly parity") {
    val snap = Seq(("a", "Oat Milk", Map("brands" -> "Acme", "qty" -> "1"),
        "f_old", 1L))
      .toDF("code", "name", "extras", "file_id", "v")
    val delta = Seq(("a", null.asInstanceOf[String],
        Map("qty" -> "2", "origin" -> "ES"), null.asInstanceOf[String], 2L),
        ("b", "New", Map("x" -> "y"), "f_new", 2L))
      .toDF("code", "name", "extras", "file_id", "v")
    val union = Upsert.mergeFields(snap, delta, "code",
      version = Seq(col("v")), mergeWholly = Set("file_id"))
    val join = Upsert.mergeFieldsJoin(snap, delta, "code",
      version = Seq(col("v")), mergeWholly = Set("file_id"))
    assert(sortedRows(union) === sortedRows(join))
    // the winning delta record's null file_id REPLACES (mergeWholly)
    val a = join.filter(col("code") === "a").collect().head
    assert(a.getAs[String]("file_id") === null)
    assert(a.getAs[Map[String, String]]("extras")
      === Map("brands" -> "Acme", "qty" -> "2", "origin" -> "ES"))
  }

  test("join-form merge against a bucketed snapshot shuffles only the delta") {
    withTmpDir { ws =>
      val snapData = (1 to 2000)
        .map(i => (s"c$i", s"name$i", i.toLong)).toDF("code", "name", "v")
      val delta = (1 to 50)
        .map(i => (s"c${i * 3}", s"upd$i", 10000L + i)).toDF("code", "name", "v")

      def exchanges(df: DataFrame): Int = {
        df.collect() // materialize so AQE finalizes its stages
        graft.PlanNodes.all(df)
          .collect { case e: ShuffleExchangeExec => e }.size
      }

      val old = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
      val oldShuffle = spark.conf.getOption("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // bucket-aligned merges need shuffle fan-out == bucket count: the
      // delta's collapse then lands directly on the snapshot's buckets
      // (production sizes both from the same layout constant)
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val bucketedStore = new SnapshotStore(
          ws.resolve("bkt").toString, bucket = Some(("code", 8)))
        bucketedStore.overwrite(snapData)
        val plainStore = new SnapshotStore(ws.resolve("plain").toString)
        plainStore.overwrite(snapData)

        val viaBucketed = Upsert.mergeFieldsJoin(
          bucketedStore.read(spark).get, delta, "code",
          version = Seq(col("v")), mergeWholly = Set.empty)
        val viaPlain = Upsert.mergeFieldsJoin(
          plainStore.read(spark).get, delta, "code",
          version = Seq(col("v")), mergeWholly = Set.empty)

        val (b, p) = (exchanges(viaBucketed), exchanges(viaPlain))
        info(s"shuffle exchanges: bucketed snapshot=$b plain snapshot=$p")
        assert(b < p, "bucketed snapshot must drop its join exchange")
        // and the bucket-aware scan is actually in the plan
        assert(viaBucketed.queryExecution.executedPlan.toString
          .contains("Bucketed: true"), "snapshot scan not bucket-aware")
        assert(sortedRows(viaBucketed) === sortedRows(viaPlain))
      } finally {
        old match {
          case Some(v) =>
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
          case None =>
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        }
        oldShuffle.foreach(
          spark.conf.set("spark.sql.shuffle.partitions", _))
      }
    }
  }
}
