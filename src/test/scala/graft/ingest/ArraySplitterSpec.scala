package graft.ingest

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSuite
import graft.core.Schemas.Status
import graft.streaming.IngestStream

/** Landing-side splitter for oversized JSON-array deliveries
  * ([[ArraySplitter]]): element-boundary JSONL shards, constant
  * memory, structural-malformation fallback — plus the soak drive: a
  * delivery ABOVE the threshold must parse across many tasks and
  * produce a bit-identical products + control state to the unsplit
  * path. */
class ArraySplitterSpec extends SparkSuite {

  import spark.implicits._

  private def splitTo(body: String, dir: Path,
      shardBytes: Long = 1L << 20): Option[Seq[Path]] = {
    val src = dir.resolve("delivery.json")
    Files.writeString(src, body)
    ArraySplitter.split(src, Files.createDirectories(dir.resolve("out")),
      shardBytes)
  }

  private def lines(shards: Seq[Path]): Seq[String] =
    shards.flatMap(p => Files.readAllLines(p).toArray.toSeq
      .map(_.toString)).filter(_.nonEmpty)

  test("elements with nested objects, arrays, escapes and commas split cleanly") {
    withTmpDir { dir =>
      val body =
        """[ {"code":"a","obj":{"x":[1,2,{"y":"},]"}]},"s":"q\"uote\\"},
          |  "bare string, with ] and } inside",
          |  42,
          |  {"code":"b",
          |   "multi":"line-element"} ]""".stripMargin
      val shards = splitTo(body, dir).get
      val ls = lines(shards)
      assert(ls.size === 4)
      // scalar elements land verbatim on their own lines
      assert(ls(1) === "\"bare string, with ] and } inside\"")
      assert(ls(2) === "42")
      // object elements parse to exactly the original records (modulo
      // structural-ws newlines → spaces)
      val got = spark.read.json(Seq(ls(0), ls(3)).toDS())
      val want = spark.read.json(Seq(
        """{"code":"a","obj":{"x":[1,2,{"y":"},]"}]},"s":"q\"uote\\"}""",
        """{"code":"b","multi":"line-element"}""").toDS())
      assert(got.schema === want.schema)
      assert(got.collect().map(_.toString).sorted.toSeq ===
        want.collect().map(_.toString).sorted.toSeq)
    }
  }

  test("shards roll at element boundaries only, every record intact") {
    withTmpDir { dir =>
      val recs = (0 until 500).map(i =>
        s"""{"code":"c$i","product_name":"name $i","i":$i}""")
      // tiny shard size forces many rolls
      val shards = splitTo(recs.mkString("[", ",\n", "]"), dir,
        shardBytes = 512).get
      assert(shards.size > 10, s"expected many shards, got ${shards.size}")
      val ls = lines(shards)
      assert(ls.size === 500)
      assert(ls.toSet === recs.toSet) // boundary never splits a record
    }
  }

  test("empty array yields one empty shard (delivery keeps its identity)") {
    withTmpDir { dir =>
      val shards = splitTo("  [ ]  ", dir).get
      assert(shards.size === 1)
      assert(Files.size(shards.head) === 0L)
    }
  }

  test("structural malformation aborts: shards deleted, None returned") {
    withTmpDir { dir =>
      val bads = Seq(
        """[{"a":1}""", // EOF inside array
        """[{"a":1},]""", // trailing comma
        """[,{"a":1}]""", // leading comma
        """[{"a":1},,{"b":2}]""", // double comma
        """[{"a":1}] trailing""", // bytes after close
        """{"not":"an array"}""", // no top-level array
        """[{"a":1}}]""") // unbalanced brace
      bads.foreach { b =>
        val out = dir.resolve("out")
        assert(splitTo(b, dir).isEmpty, s"accepted malformed: $b")
        import scala.jdk.CollectionConverters._
        val left = Files.list(out).iterator().asScala.toSeq
        assert(left.isEmpty, s"shards left behind for: $b — $left")
      }
    }
  }

  test("property: any record list round-trips through the splitter") {
    val fieldGen = Gen.alphaNumStr.map(_.take(8))
    val recGen = for {
      code <- Gen.alphaNumStr.map(_.take(6))
      name <- Gen.option(fieldGen)
      n <- Gen.choose(0L, 1000000L)
    } yield (code, name.orNull, n)
    val p = Prop.forAll(Gen.listOf(recGen), Gen.choose(64L, 4096L)) {
      (recs, shardBytes) =>
      val json = recs.map { case (c, n, v) =>
        val nameField = Option(n).map(x => s""","product_name":"$x"""")
          .getOrElse("")
        s"""{"code":"$c"$nameField,"v":$v}"""
      }
      val dir = Files.createTempDirectory("graft-split-prop")
      try {
        val shards = splitTo(json.mkString("[\n", " ,\n ", "\n]"), dir,
          shardBytes).get
        lines(shards) == json.map(_.replace("\n", " "))
      } finally {
        import scala.jdk.CollectionConverters._
        Files.walk(dir).iterator().asScala.toSeq.reverseIterator
          .foreach(Files.deleteIfExists(_))
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }

  test("soak: an over-threshold delivery splits, parses multi-task, and " +
      "lands the identical products + control state as the unsplit path") {
    withTmpDir { ws =>
      // ~2000 records, ~140 KB — far over the 1 KiB test threshold
      val recs = (0 until 2000).map(i =>
        s"""{"code":"c${"%04d".format(i)}","product_name":"product $i",""" +
          s""""brands":"brand${i % 7}"}""")
      val body = recs.mkString("[\n", ",\n", "\n]")

      def ingest(name: String, thresholdBytes: Long): (Seq[String], Seq[String]) = {
        val landing = Files.createDirectories(ws.resolve(s"$name/landing"))
        val cfg = IngestStream.Config(
          landingDir = landing.toString,
          warehouseDir = ws.resolve(s"$name/wh").toString,
          checkpointDir = ws.resolve(s"$name/ckpt").toString,
          arraySplitBytes = thresholdBytes)
        Files.writeString(landing.resolve("big_delivery.json"), body)
        IngestStream.runAvailable(spark, cfg)
        val prod = IngestStream.productsStore(cfg).read(spark).get
          .drop("last_modified_at_company") // wall-clock ingest stamp
          .collect().map(_.toString).sorted.toSeq
        val ctl = IngestStream.controlStore(cfg).read(spark).get
          .select("file_id", "status", "total_records",
            "records_processed", "records_failed")
          .collect().map(_.toString).sorted.toSeq
        (prod, ctl)
      }

      // the split itself is multi-shard at this threshold ⇒ the jsonl
      // parse distributes across as many input splits
      val probe = Files.createDirectories(ws.resolve("probe"))
      val src = probe.resolve("big_delivery.json")
      Files.writeString(src, body)
      val shards = ArraySplitter.split(src, probe, shardBytes = 8192).get
      assert(shards.size > 10,
        s"soak file must shard widely, got ${shards.size}")
      val parts = spark.read.json(shards.map(_.toString): _*)
        .rdd.getNumPartitions
      assert(parts > 1, s"shard parse not multi-task: $parts partition(s)")

      val (splitProd, splitCtl) = ingest("split", thresholdBytes = 1024)
      val (plainProd, plainCtl) = ingest("plain", thresholdBytes = Long.MaxValue)
      assert(splitProd === plainProd)
      assert(splitCtl === plainCtl)
      assert(splitProd.size === 2000)
      assert(splitCtl.exists(_.contains(Status.Processed)))
    }
  }

  test("soak poison: an over-threshold file with an invalid element " +
      "still fails whole-file (A17 parity)") {
    withTmpDir { ws =>
      // structurally balanced but invalid JSON element ⇒ split succeeds,
      // the shard record fails, and the delivery must land as `failed`
      val recs = (0 until 50).map(i => s"""{"code":"c$i"}""") :+
        """{"code":}"""
      val landing = Files.createDirectories(ws.resolve("landing"))
      val cfg = IngestStream.Config(
        landingDir = landing.toString,
        warehouseDir = ws.resolve("wh").toString,
        checkpointDir = ws.resolve("ckpt").toString,
        arraySplitBytes = 64)
      Files.writeString(landing.resolve("bad_delivery.json"),
        recs.mkString("[", ",", "]"))
      IngestStream.runAvailable(spark, cfg)
      val ctl = IngestStream.controlStore(cfg).read(spark).get
        .select("file_id", "status").as[(String, String)].collect().toMap
      assert(ctl("bad_delivery.json") === Status.Failed)
      val prod = IngestStream.productsStore(cfg).read(spark)
      assert(prod.forall(_.isEmpty) || prod.get.count() === 0L,
        "poisoned delivery must not land records")
    }
  }
}
