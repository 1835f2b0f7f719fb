package graft.sources

import graft.{SparkSuite, TestSpark}
import graft.core.Tables

/** Every supported format must round-trip the real fixture tables
  * value-exactly — including doubles and timestamps (the usual CSV/JSON
  * casualties). */
class FormatsSpec extends SparkSuite {

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("nation and orders round-trip through every supported format") {
    val dir = TestSpark.sfDir
    for (table <- Seq("nation", "orders"); fmt <- Formats.supported) {
      withTmpDir { tmp =>
        val src = Tables.load(spark, dir, table)
        Formats.write(src, tmp.resolve(fmt).toString, fmt)
        val back = Formats.read(spark, tmp.resolve(fmt).toString, fmt,
          schema = Some(src.schema))
        assert(back.schema === src.schema, s"$table via $fmt: schema drift")
        assert(sortedRows(back) === sortedRows(src),
          s"$table via $fmt: value drift")
      }
    }
  }

  test("adversarial strings round-trip: delimiters, quotes, newlines, unicode") {
    import spark.implicits._
    val nasty = Seq(
      (1L, "plain"),
      (2L, "comma, inside"),
      (3L, "\"quoted\" and , mixed"),
      (4L, "line\nbreak and\r\nCRLF"),
      (5L, "tab\tand trailing space "),
      (6L, "ünïcødé — em-dash and 中文"),
      (7L, ""),
      (8L, null.asInstanceOf[String]))
    val src = nasty.toDF("id", "text")
    for (fmt <- Formats.supported) {
      withTmpDir { tmp =>
        Formats.write(src, tmp.resolve(fmt).toString, fmt)
        val back = Formats.read(spark, tmp.resolve(fmt).toString, fmt,
          Some(src.schema))
        assert(sortedRows(back) === sortedRows(src), s"$fmt mangled data")
      }
    }
  }

  test("csv/json without schema are refused; unknown format is refused") {
    intercept[IllegalArgumentException] {
      Formats.read(spark, "/nope", "csv")
    }
    intercept[IllegalArgumentException] {
      Formats.read(spark, "/nope", "avro", None)
    }
  }
}
