package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ingest.{Tracker, Upsert}

/** Oracle-checkable forms of the reference's pipeline semantics (SURVEY.md
  * §2 A8/A9/A10 as B12/B19), driven from the deterministic test tables so
  * the DuckDB oracle can replay them in SQL.
  */
object PipelineOps {

  /** B12: two synthetic "weekly deliveries" carved out of `orders`
    * (delivery 1 = even orderkeys, delivery 2 = orderkeys % 3 == 0) merged
    * with the engine's real upsert operator — delivery 2 wins on key
    * collision, exactly the reference's last-writer-wins
    * (data_processor.py:106-110). */
  def upsertProducts(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    val d1 = orders.filter(col("o_orderkey") % 2 === 0)
      .withColumn("delivery", lit(1))
    val d2 = orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("delivery", lit(2))
    Upsert.merge(snapshot = d1, delta = d2, key = "o_orderkey")
      .orderBy("o_orderkey")
  }

  /** A8 field-level flavor: the `$set` parity merge the reference's
    * per-record `UpdateOne({code},{$set:doc})` implies
    * (data_processor.py:103-110) — a field ABSENT from the new document
    * survives from the snapshot. Carved from `orders`: snapshot = even
    * orderkeys; delta = multiples of 3 with a bumped price and
    * o_orderpriority present only on multiples of 9 — so merged rows on
    * 6k∩¬9k keys must show the NEW price with the OLD priority. */
  def upsertSetMerge(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
    val snapshot = orders.filter(col("o_orderkey") % 2 === 0)
    val delta = orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_orderpriority",
        when(col("o_orderkey") % 9 === 0, col("o_orderpriority")))
      .withColumn("o_totalprice", col("o_totalprice") + 1.0)
    Upsert.mergeFields(snapshot, delta, key = "o_orderkey",
        mergeWholly = Set.empty)
      .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** Driver key `ingest_replay_check` — the bucketed exactly-once
    * machinery under the full hash gate (r18 verdict task 4; the
    * lifecycle was previously BucketedCowSpec-only): the
    * [[upsertSetMerge]] fixture driven through the PRODUCTION path —
    * a BUCKETED [[graft.ingest.SnapshotStore]] seeded with the
    * snapshot (generation start), the delivery committed bucket-grain
    * copy-on-write via [[Upsert.commitDeltaCowOnce]], then the SAME
    * delivery REPLAYED under its tag. The replay must be a no-op: no
    * new manifest commit, no content change — the in-dir
    * `_applied_tags` sidecar is the memory — and the panel carries
    * the evidence as literal columns (`first_committed`,
    * `replay_noop`, `n_commits` = overwrite + one CoW commit, nothing
    * from the replay). Content is served from the store's bucketed
    * read, so the oracle (upsert_set_merge's exact field-level `$set`
    * SQL + the literals) gates merge semantics, CoW bucket
    * inheritance AND replay suppression in one key. The measured path
    * includes the replayed no-op commit.
    *
    * Scope bound: the panel is the full merged content, pinned to a
    * LocalRelation before the workspace is deleted — at the ×10
    * decade corpus that is exactly 1.0 M rows,
    * [[graft.streaming.DriveSupport.MaxPinRows]]'s cap. The key is a
    * gate-scale LIFECYCLE proof (the store machinery itself writes
    * O(delta-touched buckets)); a larger fixture fails the pin guard
    * loudly rather than silently collecting a corpus.
    *
    * DECADE-UP DECISION (r19 verdict task 7, recorded here so the
    * next corpus growth doesn't re-litigate it): FAIL LOUDLY is the
    * contract, permanently — no aggregate-panel twin. The key's whole
    * value is that ONE exact row-level oracle gates field-level
    * `$set` merge + CoW inheritance + replay suppression together; an
    * aggregated panel would keep the replay/commit literals but
    * surrender the field-level merge evidence, which
    * `upsert_set_merge` already covers at content grain — so the
    * aggregate twin would be redundant where it is checkable and
    * weaker where it is not. Past the pin cap the lifecycle proof
    * belongs at gate SF (where it runs today), not at bench SF. */
  def ingestReplayCheck(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.DriveSupport.withWorkspace("graft-cowreplay") { ws =>
      val orders = Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderpriority",
          "o_totalprice")
      val snapshot = orders.filter(col("o_orderkey") % 2 === 0)
      val delta = orders.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_orderpriority",
          when(col("o_orderkey") % 9 === 0, col("o_orderpriority")))
        .withColumn("o_totalprice", col("o_totalprice") + 1.0)
      val store = new graft.ingest.SnapshotStore(
        ws.resolve("products").toString,
        bucket = Some(("o_orderkey", 8)))
      store.overwrite(snapshot)
      val first = Upsert.commitDeltaCowOnce(store,
        store.read(spark).get, delta, "o_orderkey", tag = "wk2",
        mergeWholly = Set.empty)
      // the at-least-once replay: the SAME delivery, SAME tag — the
      // sidecar memory must suppress it without an error
      val replay = Upsert.commitDeltaCowOnce(store,
        store.read(spark).get, delta, "o_orderkey", tag = "wk2",
        mergeWholly = Set.empty)
      val panel = store.read(spark).get
        .withColumn("first_committed", lit(first.nonEmpty))
        .withColumn("replay_noop", lit(replay.isEmpty))
        .withColumn("n_commits",
          lit(store.versions(spark).size.toLong))
        .orderBy("o_orderkey")
      graft.streaming.DriveSupport.pin(spark, panel)
    }

  /** A14 as an oracle-checked query: point status lookup against a
    * deterministic control table derived from `events` (the same
    * derivation as [[statusRollup]]), keyed to the lexicographically
    * first file_id. */
  def statusLookup(spark: SparkSession, dir: String): DataFrame = {
    val control = statusRollup(spark, dir)
    // key chosen declaratively (no driver-side action): the lex-min id
    val key = control.agg(min(col("file_id")).as("file_id"))
    control.join(broadcast(key), Seq("file_id"))
      .select("file_id", "status", "total_records", "records_processed",
        "records_failed")
  }

  /** B19: the A9/A10 counter + status machine over `events` treated as
    * per-user ingest streams: an 'error' event is a failed record. */
  def statusRollup(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
      .withColumnRenamed("user_id", "file_id")
    val counters = events.groupBy("file_id").agg(
      count(lit(1)).as("total_records"),
      sum(when(col("event_type") =!= "error", 1L).otherwise(0L))
        .as("records_processed"),
      sum(when(col("event_type") === "error", 1L).otherwise(0L))
        .as("records_failed"))
    Tracker.withStatus(counters)
      .select("file_id", "total_records", "records_processed",
        "records_failed", "status")
      .orderBy("file_id")
  }
}
