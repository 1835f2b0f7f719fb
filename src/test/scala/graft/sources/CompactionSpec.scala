package graft.sources

import graft.{SparkSuite, TestSpark}
import graft.core.Tables

/** Compaction must shrink the file count to the size-derived target and
  * preserve every row. */
class CompactionSpec extends SparkSuite {

  test("64 small files compact to the size target, data intact") {
    withTmpDir { tmp =>
      val src = Tables.load(spark, TestSpark.sfDir, "events")
      val fragmented = tmp.resolve("frag").toString
      src.repartition(64).write.parquet(fragmented)

      // target sized so the whole table fits in a couple of files
      val (before, after) = Compaction.compact(spark, fragmented,
        tmp.resolve("compact").toString, targetFileBytes = 4L * 1024 * 1024)
      assert(before === 64)
      assert(after < 8, s"still $after files after compaction")

      val back = spark.read.parquet(tmp.resolve("compact").toString)
      assert(back.count() === src.count())
      assert(back.collect().map(_.toString).sorted.toSeq ===
        src.collect().map(_.toString).sorted.toSeq)
    }
  }
}
