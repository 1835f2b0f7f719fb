package graft

// Scratch measurement for the round-14 copy-on-write snapshot commits:
// builds a corpus-sized bucketed snapshot, applies a small delivery via
// commitDeltaCow, and reports fresh-vs-inherited write volume. Run:
//   sbt "Test/runMain graft.MeasureCow 200000 64"
// Kept (like MeasureContracts/MeasureStar) as the reproducible record
// behind the SCALE.md row.
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ingest.{SnapshotStore, Upsert}

object MeasureCow {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(200000)
    val buckets = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = Files.createTempDirectory("graft-cow-measure")
    val store = new SnapshotStore(root.resolve("prod").toString,
      bucket = Some(("code", buckets)))
    val snap = spark.range(rows.toLong)
      .select(concat(lit("code"), col("id")).as("code"),
        md5(col("id").cast("string")).as("name"), col("id").as("v"))
    store.overwrite(snap)

    def bytes(filter: Path => Boolean): Long = {
      import scala.jdk.CollectionConverters._
      Files.walk(root).iterator().asScala
        .filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet") && filter(p))
        .map(Files.size(_)).sum
    }
    val baseBytes = bytes(_ => true)

    val delta = Seq(("code17", "patched", 10_000_000L),
      ("code4242", "patched", 10_000_000L),
      ("brandnew", "added", 10_000_000L)).toDF("code", "name", "v")
    val before = System.nanoTime()
    val touched = Upsert.commitDeltaCow(store, store.read(spark).get,
      delta, key = "code", version = Seq(col("v")),
      mergeWholly = Set.empty)
    val secs = (System.nanoTime() - before) / 1e9

    // fresh files = LIVE version dir files with inode link count 1
    // (inherited files share v0 inodes; v0's own superseded files are
    // retention, not write volume)
    import scala.jdk.CollectionConverters._
    val live = Files.list(root.resolve("prod")).iterator().asScala
      .filter(_.getFileName.toString.startsWith("MANIFEST-"))
      .maxBy(_.getFileName.toString.drop("MANIFEST-".length).toLong)
    val liveDir = root.resolve("prod").resolve(
      new String(Files.readAllBytes(live), "UTF-8").trim)
    val freshBytes = bytes(p => p.getParent == liveDir &&
      Files.getAttribute(p, "unix:nlink").asInstanceOf[Number].intValue == 1)
    println(f"MEASURECOW rows=$rows buckets=$buckets " +
      f"touched=${touched.size} commit=${secs}%.2fs " +
      f"snapshotBytes=$baseBytes freshBytes=$freshBytes " +
      f"writeFrac=${freshBytes.toDouble / baseBytes}%.4f")
    spark.stop()
  }
}
