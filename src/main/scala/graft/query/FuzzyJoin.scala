package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Fuzzy (edit-distance) JOIN — the entity-resolution operator: match
  * a dirty probe table against a clean reference by Levenshtein
  * distance ≤ k, without ever forming the probe × reference cross
  * product. The missing join class next to equi/semi/anti/asof/
  * interval/bloom: record linkage of misspelled names against a
  * master table.
  *
  * Blocking is the DELETION-NEIGHBORHOOD scheme (FastSS — Bocek,
  * Hunt, Stiller '07, "Fast Similarity Search in Large Dictionaries";
  * the same signature SymSpell made the industry standard for
  * spell-correction at scale): every string emits all variants with
  * ≤ k characters deleted, and the candidate set is the EQUALITY join
  * of the two variant tables. Completeness is the FastSS lemma: an
  * optimal alignment with e ≤ k edits turns each substitution into
  * one deletion on each side and each insert/delete into one deletion
  * on one side, so ed(s,t) ≤ k guarantees a shared variant with ≤ k
  * deletions per side; conversely a shared variant bounds ed ≤ 2k, so
  * the banded 3-arg `levenshtein(l, r, k)` verify (O(len·k) band,
  * exact by the repo's dedup_levenshtein argument) decides every
  * candidate.
  *
  * Why not Ed-Join's gram-prefix filter (the r17 implementation):
  * measured at ×10 reference size (200k names over a ~92-word
  * catalog vocabulary, ScaleTen v5) the q-gram posting lists
  * SATURATE — a q-gram carries at most q characters of entropy, so
  * on low-entropy string populations every "rare" gram still has
  * thousands of postings and the candidate join degrades toward
  * all-pairs (q=2: 120 s, q=3: 57–84 s serving at ×10, vs 3.4 s at
  * the base size). Deletion signatures carry the WHOLE string minus
  * k characters — their selectivity tracks true near-match mass, not
  * vocabulary entropy. SCALE.md round-18 records both curves.
  *
  * The probe table is derived deterministically from the reference
  * (every 50th part's name with its 3rd character deleted — edit
  * distance 1 from its source), so the DuckDB oracle can re-derive it
  * and state the UNBLOCKED truth: the full `levenshtein ≤ k`
  * predicate over probes × part, best match per probe (min distance,
  * ties to the lowest key). The hash gate therefore proves the
  * deletion blocking's completeness on the fixture corpus end-to-end.
  *
  * Scale shape: signature volume is Σ C(len, ≤k) ≈ len^k/k! variants
  * per string (~460 rows for a 30-char name at k=2) — linear in the
  * table, the documented FastSS space-for-time trade. At 100 TB the
  * reference-side variant table is built ONCE and persisted as an
  * index (the SymSpell dictionary) — [[FuzzyIndex]] IS that store: a
  * [[graft.ingest.SnapshotStore]] chain with O(delta) appendOnce
  * maintenance serving `join_fuzzy_delta`, while the probe side
  * explodes only the dirty delivery. THIS one-shot form re-derives
  * the reference signatures inline per call — the right operator for
  * a single ad-hoc linkage, not for the weekly regime.
  * Variants ride as xxhash64 keys (16 bytes/row in the exchange, not
  * 30-char strings); a hash collision can only ADD a candidate —
  * equal strings hash equal — and the exact verify kills it. The
  * |Δlen| ≤ k bound rides the join as an exact-safe prune, and the
  * best match is a map-side-combinable min(struct) rollup — no
  * Window over unbounded keys, no cross product anywhere. */
object FuzzyJoin {

  /** All variants of string column `c` with at most `k` characters
    * deleted (the string itself included), distinct, as an array.
    * Native Column DSL throughout — works for any input expression.
    * Implemented for k ∈ {1, 2}: the record-linkage regime this
    * operator serves; depth-3 neighborhoods cube the signature volume
    * and a corpus needing ed > 2 linkage wants a different operator
    * (dedup_levenshtein's shingle-candidate form). */
  private[query] def deleteVariants(c: Column, k: Int): Column = {
    require(k >= 1 && k <= 2,
      s"deletion neighborhoods implemented for k in {1, 2}, got $k")
    val n = length(c)
    val empty = array().cast("array<string>")
    val d0 = array(c)
    // delete position i (1-based); substr(pos, len) with len ≥ the
    // remaining tail is a safe over-ask
    val d1 = transform(sequence(lit(1), greatest(n, lit(1))),
      i => concat(c.substr(lit(1), i - 1), c.substr(i + 1, n)))
    // delete positions i < j
    val d2 = flatten(transform(
      sequence(lit(1), greatest(n - 1, lit(1))),
      i => transform(sequence(i + 1, greatest(n, i + 1)),
        j => concat(c.substr(lit(1), i - 1),
          c.substr(i + 1, j - i - 1), c.substr(j + 1, n)))))
    // a sequence() whose start exceeds its stop runs DESCENDING, so
    // each tier is gated to the lengths that own it
    val tiers = Seq(d0, when(n >= 1, d1).otherwise(empty)) ++
      (if (k >= 2) Seq(when(n >= 2, d2).otherwise(empty)) else Nil)
    array_distinct(concat(tiers: _*))
  }

  /** Reference-side signature table of a (p_partkey, p_name) frame:
    * (p_partkey, r_len, vh) — one row per deletion variant, hashed.
    * This is the row shape [[FuzzyIndex]] persists; the inline form
    * derives it fresh per call. */
  private[graft] def signaturesOf(parts: DataFrame, k: Int): DataFrame =
    parts
      .select(col("p_partkey"), length(col("p_name")).as("r_len"),
        explode(deleteVariants(col("p_name"), k)).as("v"))
      .select(col("p_partkey"), col("r_len"),
        xxhash64(col("v")).as("vh"))

  /** The dirty-probe derivation: every `everyN`-th part name with its
    * 3rd character deleted — edit distance 1 from its source, so the
    * DuckDB oracle re-derives the same probes and states the unblocked
    * truth. */
  private[graft] def probesOf(parts: DataFrame, everyN: Int): DataFrame =
    parts.filter(col("p_partkey") % everyN === 0)
      .select(col("p_partkey").as("probe_id"),
        concat(substring(col("p_name"), 1, 2),
          expr("substring(p_name, 4)")).as("probe_name"))

  /** The shared query tail: probe signatures (always derived inline —
    * the probe side IS the dirty delivery), hashed-equality candidate
    * join against `refSig` with the exact-safe |Δlen| ≤ k prune,
    * banded O(len·k) verify on candidates only, and the map-side-
    * combinable min(struct) best-match rollup. `refSig` is either the
    * inline [[signaturesOf]] (one-shot) or [[FuzzyIndex]]'s persisted
    * table (the weekly regime) — the two are row-identical by the
    * per-string grain of the signature derivation, which is what lets
    * `join_fuzzy_delta` run under the same unblocked exact oracle. */
  private[graft] def matchProbes(probes: DataFrame, refSig: DataFrame,
      parts: DataFrame, k: Int): DataFrame = {
    val probeSig = probes
      .select(col("probe_id"), length(col("probe_name")).as("p_len"),
        explode(deleteVariants(col("probe_name"), k)).as("v"))
      .select(col("probe_id"), col("p_len"), xxhash64(col("v")).as("vh"))
    // |Δlen| ≤ k rides the candidate join: edit distance is bounded
    // below by the length difference, so the filter is exact-safe
    val cand = probeSig.join(refSig, Seq("vh"))
      .filter(abs(col("p_len") - col("r_len")) <= k)
      .select("probe_id", "p_partkey").distinct()

    // banded verify on candidates only; -1 = beyond the band
    val verified = cand
      .join(probes, "probe_id").join(parts, "p_partkey")
      .withColumn("dist",
        levenshtein(col("probe_name"), col("p_name"), k).cast("long"))
      .filter(col("dist") >= 0)
    // best match per probe: min distance, ties to the lowest key —
    // one map-side-combinable aggregate, no per-probe window sort
    verified.groupBy("probe_id", "probe_name")
      .agg(min(struct(col("dist"), col("p_partkey"), col("p_name")))
        .as("m"))
      .select(col("probe_id"), col("probe_name"),
        col("m.p_partkey").as("match_key"),
        col("m.p_name").as("match_name"), col("m.dist").as("dist"))
      .orderBy("probe_id")
  }

  /** Driver key `join_fuzzy`: dirty probes (every 50th part name with
    * the 3rd character deleted) matched to `part` at Levenshtein ≤ `k`,
    * best match per probe. */
  def joinFuzzy(spark: SparkSession, dir: String, k: Int = 2)
      : DataFrame = {
    // fanOut: the deletion-variant explode (~len²/2 variants/row at
    // k=2) is scan-side CPU and part is one parquet split — without it
    // the whole signature build runs in ONE task (r20 profile: 1.2 s)
    val parts = Tables.fanOut(Tables.load(spark, dir, "part"))
      .select(col("p_partkey"), col("p_name"))
    matchProbes(probesOf(parts, 50), signaturesOf(parts, k), parts, k)
  }
}
