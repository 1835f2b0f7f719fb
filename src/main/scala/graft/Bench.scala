package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: per-query wall-clock over the SF-scaled test tables.
  *
  * Steady-state protocol: one untimed pass of every query first (JVM
  * JIT + whole-stage-codegen compilation + parquet footer caches), then
  * the timed pass. r1 measured cold and billed ~4s of session warmup to
  * whichever query ran first (join_multi); profiled warm-vs-cold deltas
  * at sf0.1 are 5-20× for the cheap queries. The ingest_e2e_* keys are
  * excluded: they run a fixed-size streaming-pipeline fixture whose
  * latency is independent of the scale factor — correctness queries,
  * not throughput ones.
  */
object Bench {
  // ingest_e2e_*: fixed-size streaming fixture, latency independent of
  // SF. dedup_lev_curated: the canonical→levenshtein composition — its
  // cost class is exactly dedup_canonical + dedup_levenshtein, both
  // already benched individually; timing the composition would double-
  // count without exposing a new regression surface.
  // stream_session_window_restart: the same session machine as the
  // benched stream_session_window plus query-restart bookkeeping — a
  // correctness gate (recovery), not a throughput surface.
  // contract keys: verification-scale ground-truth sides (all-pairs
  // sweeps, brute-force top-k) gating the approximate families —
  // correctness gates, not throughput surfaces (SparkEntry.contractKeys).
  private def excluded(k: String): Boolean =
    k.startsWith("ingest_e2e_") || k == "dedup_lev_curated" ||
      k == "stream_session_window_restart" ||
      SparkEntry.contractKeys(k)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_BENCH_ONLY=k1,k2 narrows the run to named keys — for
    // re-measuring a flagged key or iterating locally; the full set
    // (and the tracked artifact) remains the default
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // calibration_fixed_work: a CONSTANT-WORK, data-independent pure-
    // Catalyst key (range → xxhash64 → sum, fully codegen'd, no I/O)
    // recorded with the same warmup+3-pass-median protocol. It
    // measures the BOX, not the engine: its cross-run ratio IS the
    // run-level shift bench_compare.py previously had to infer from
    // the key field, so the regression gate can normalize by a
    // measured quantity as the raw margin narrows. Always included.
    val calibration: (SparkSession, String) => org.apache.spark.sql.DataFrame =
      (s, _) => s.range(0L, 3L << 30, 1L, 32)
        .selectExpr("sum(xxhash64(id)) AS h")
    // calibration_shuffle_work: the same idea for the SHUFFLE/
    // scheduler path — constant work, data-independent, but routed
    // through a real exchange (hash repartition + wide-key aggregate).
    // Added after the r17 continuation gate caught the box in a state
    // where pure-CPU throughput was FASTER (fixed_work ×0.72) while
    // every exchange-bearing key ran ×1.3–2 slower, including keys
    // whose code had not changed in weeks — a drift dimension the
    // CPU-only calibration is blind to by construction. With both
    // keys in the artifact, bench_compare can normalize each side.
    val calibrationShuffle: (SparkSession, String) => org.apache.spark.sql.DataFrame =
      (s, _) => s.range(0L, 1L << 24, 1L, 32)
        .selectExpr("pmod(xxhash64(id), 65536) AS k", "id AS v")
        .groupBy("k").agg(org.apache.spark.sql.functions.sum("v").as("sv"))
        .agg(org.apache.spark.sql.functions.sum("sv").as("t"))
    val benched = SparkEntry.queries.view
      .filterKeys(k => !excluded(k) && only.forall(_(k))).toMap +
      ("calibration_fixed_work" -> calibration) +
      ("calibration_shuffle_work" -> calibrationShuffle)
    require(benched.size > 1, "SPARK_GRAFT_BENCH_ONLY matched no keys")
    // untimed warmup pass: compiles every plan's codegen + fills caches
    benched.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // three timed passes, MEDIAN per query: single-run numbers on a
    // shared box swing up to 3× on transient load/GC (the r4→r5 "drift"
    // was exactly this noise); the median of three is robust to one
    // outlier pass in either direction, where min-of-two still tracked
    // a single lucky run. A crashing query records NO time — a sentinel
    // (-1) plus an errors list, so a regression to "query throws" can
    // never read as a speedup.
    def timedPass(): Map[String, Option[Double]] =
      benched.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        name -> (if (ok) Some((System.nanoTime() - t0) / 1e9) else None)
      }.toMap
    val passes = Seq.fill(3)(timedPass())
    // sorted key order: stable JSON across rounds for line-based diffs
    val results = passes.head.keys.toSeq.sorted.map { k =>
      val times = passes.flatMap(_(k)).sorted
      k -> (times.length match {
        case 0 => None
        case n => Some(times(n / 2)) // odd n → true median; n=2 → upper
      })
    }
    val qs = results.map { case (k, v) =>
      s"\"" + k + "\":" + v.fold("-1")(_.toString)
    }.mkString("{", ",", "}")
    // per-key spread: ALL THREE passes in chronological order, so a
    // cross-round delta is decidable against the previous round's
    // recorded band (min..max) instead of a bare median — drift inside
    // the band is box noise; outside it is a regression (PERF.md rule)
    val spread = passes.head.keys.toSeq.sorted.map { k =>
      val ts = passes.flatMap(_(k))
      s"\"" + k + "\":" + ts.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val errors = results.collect { case (k, None) => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.flatMap(_._2).sum
    // provider metadata: the streaming drive keys' timings depend on the
    // state-store provider (PERF.md r11: RocksDB ×1.13 total vs HDFS).
    // Recording it makes a provider switch VISIBLE to the bench gate
    // (bench_compare.py warns on mismatch) instead of silently moving
    // the bar. Mirrors DriveSupport's env switch; default = hdfs.
    val provider = sys.env.get("SPARK_GRAFT_STATE_PROVIDER")
      .map(_.trim).filter(_.nonEmpty).getOrElse("hdfs")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","provider":"$provider","queries":$qs,"passes":$spread,"errors":$errors,"sf":"$sfDir"}"""
    println(json)
    // ALSO write the artifact to a file: the driver captures stdout,
    // which has been observed truncated to a 2,000-char tail (BENCH_r07
    // arrived with parsed:null and ~57 keys missing) — the file is the
    // complete, machine-readable record regardless of console limits.
    // Default is the TRACKED repo-root bench.json, so any end-of-round
    // bench run refreshes the committed artifact in place.
    val out = java.nio.file.Paths.get(sys.env.getOrElse(
      "SPARK_GRAFT_BENCH_OUT", "bench.json"))
    Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(out, json + "\n")
    spark.stop()
  }
}
