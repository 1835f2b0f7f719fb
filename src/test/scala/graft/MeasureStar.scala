package graft

// Scratch measurement for the round-14 degenerate-bucket fix: builds a
// boilerplate corpus (B byte-identical docs + organic tail) and times
// the star-bounded candidate stage against the all-pairs form. Run:
//   sbt "Test/runMain graft.MeasureStar 10000"
// Kept (like MeasureContracts) as the reproducible record behind the
// SCALE.md row.
import org.apache.spark.sql.SparkSession
import graft.query.TextSim

object MeasureStar {
  def main(args: Array[String]): Unit = {
    val b = args.headOption.map(_.toInt).getOrElse(10000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val boiler = (0 until b).map(i => (i.toLong,
      "all rights reserved this page is served from template seven " +
      "with the standard navigation header and footer blocks included"))
    val organic = (0 until 100).map(i => (100000L + i,
      s"organic document number $i about topic ${i % 7} with words " +
      s"alpha bravo charlie delta echo ${i}"))
    val corpus = (boiler ++ organic).toDF("doc_id", "text").cache()
    corpus.count()

    val sh = TextSim.shingleHashesOf(corpus).cache(); sh.count()
    val buckets = TextSim.bandBucketsOf(sh).cache(); buckets.count()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val nStar = time("star candidates") {
      TextSim.starCandidates(buckets).count()
    }
    println(s"  star candidate count   = $nStar (2B-3 = ${2 * b - 3})")
    val nAll = time("all-pairs candidates") {
      import org.apache.spark.sql.functions.col
      buckets.as("x").join(buckets.as("y"),
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .distinct().count()
    }
    println(s"  all-pairs count        = $nAll (B(B-1)/2 = ${b.toLong * (b - 1) / 2})")

    time("star verified pairs") {
      TextSim.dedupMinhashStarOf(corpus, threshold = 0.8).count()
    }
    spark.stop()
  }
}
