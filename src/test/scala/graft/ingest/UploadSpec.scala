package graft.ingest

import graft.SparkSuite
import graft.streaming.IngestStream

/** A1 upload sink: unique timestamp-prefixed naming, atomic landing, and
  * the end-to-end property the prefix exists for — later uploads win the
  * upsert. */
class UploadSpec extends SparkSuite {

  import spark.implicits._

  test("landed files get {ts}_{token}_{original} names; no tmp residue") {
    withTmpDir { dir =>
      val p = Upload.landString(dir.toString, "weekly.json",
        """[{"code":"1"}]""", clock = () => 1700000000000L)
      assert(p.getFileName.toString
        .matches("1700000000000_[0-9a-f]{8}_weekly\\.json"))
      val listed = dir.toFile.listFiles().map(_.getName)
      assert(listed.length === 1)
      assert(!listed.exists(_.endsWith(".tmp")))
    }
  }

  test("same original name twice → two distinct files (unique token)") {
    withTmpDir { dir =>
      val a = Upload.landString(dir.toString, "d.json", "[]",
        clock = () => 1L)
      val b = Upload.landString(dir.toString, "d.json", "[]",
        clock = () => 1L)
      assert(a.getFileName.toString !== b.getFileName.toString)
    }
  }

  test("upload order decides the upsert winner through the full pipeline") {
    withTmpDir { ws =>
      val landing = ws.resolve("landing").toString
      Upload.landString(landing, "w1.json",
        """[{"code":"X","product_name":"First"}]""",
        clock = () => 1700000000001L)
      Upload.landString(landing, "w2.json",
        """[{"code":"X","product_name":"Second"}]""",
        clock = () => 1700000000002L)
      val cfg = IngestStream.Config(
        landingDir = landing,
        warehouseDir = ws.resolve("wh").toString,
        checkpointDir = ws.resolve("ckpt").toString)
      IngestStream.runAvailable(spark, cfg)
      val products = IngestStream.productsStore(cfg).read(spark).get
      assert(products.select("product_name").as[String].collect().toSeq
        === Seq("Second"))
    }
  }
}
