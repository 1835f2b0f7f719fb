package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the standing maintenance job of every
  * long-running ingest pipeline: streaming micro-batches and per-day
  * partitions accumulate files far below the ideal scan unit, and at
  * 100 TB the resulting open/seek overhead (plus NameNode/listing
  * pressure) dominates scan cost. Compaction rewrites a directory into
  * ~`targetFileBytes` files: round-robin `repartition(n)` (one shuffle,
  * evenly sized output — `coalesce` would skip the shuffle but inherits
  * input skew and can only merge within partitions) into a fresh
  * directory, leaving the swap to the caller (SnapshotStore-style
  * manifest flip for readers-never-blocked semantics).
  */
object Compaction {

  /** Rewrite `inPath` (parquet) into `outPath` with ~targetFileBytes
    * per file. Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val fs = new Path(inPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs.listStatus(new Path(inPath)).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = dataFiles.map(_.getLen).sum
    val n = math.max(1L,
      (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inPath)
      .repartition(n)
      .write.mode("overwrite").parquet(outPath)
    val after = fs.listStatus(new Path(outPath)).toSeq
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    (dataFiles.size, after)
  }
}
