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
  * Blocking is the Ed-Join PREFIX FILTER (Xiao, Wang, Lin '08,
  * VLDB — "Ed-Join: an efficient algorithm for similarity joins with
  * edit distance constraints"): order every string's positional
  * q-grams by global rarity and keep only the first k·q + 1 — one
  * edit destroys at most q overlapping q-grams, so two strings within
  * edit distance k MUST share a gram inside both prefixes; disjoint
  * prefixes prove distance > k. Candidates are therefore the
  * equality join of two prefix-gram tables (rare grams by
  * construction — fan-out tracks rare-gram postings, not the corpus),
  * and the verify stage is the banded 3-arg `levenshtein(l, r, k)`
  * (O(len·k) band, exact by the repo's dedup_levenshtein argument).
  *
  * The probe table is derived deterministically from the reference
  * (every 50th part's name with its 3rd character deleted — edit
  * distance 1 from its source), so the DuckDB oracle can re-derive it
  * and state the UNBLOCKED truth: the full `levenshtein ≤ k`
  * predicate over probes × part, best match per probe (min distance,
  * ties to the lowest key). The hash gate therefore proves the
  * prefix filter's completeness on the fixture corpus end-to-end.
  *
  * Scale shape: one gram-df pass (vocabulary-grain, map-side
  * combinable), per-string prefix selection as a bounded sort over
  * ~|name| grams (collect_list per string key, ≤ ~30 rows — the
  * bounded-window class), one equality join on rare grams, banded
  * verify on the candidate set only, and a probe-grain min(struct)
  * rollup (the de-skew aggregate — no Window over unbounded keys). */
object FuzzyJoin {

  /** Positional q-grams (distinct) of a string column. Built with the
    * native Column DSL (not an expr-string splice, which only parses
    * for bare unqualified column names): works for any input
    * expression — aliased, qualified, derived. */
  private def grams(c: Column, q: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(c) - (q - 1), lit(1))),
      i => c.substr(i, lit(q))))

  /** Driver key `join_fuzzy`: dirty probes (every 50th part name with
    * the 3rd character deleted) matched to `part` at Levenshtein ≤ `k`,
    * best match per probe. */
  def joinFuzzy(spark: SparkSession, dir: String, k: Int = 2,
      q: Int = 2): DataFrame = {
    val parts = Tables.load(spark, dir, "part")
      .select(col("p_partkey"), col("p_name"))
    val probes = parts.filter(col("p_partkey") % 50 === 0)
      .select(col("p_partkey").as("probe_id"),
        concat(substring(col("p_name"), 1, 2),
          expr("substring(p_name, 4)")).as("probe_name"))

    val prefixLen = k * q + 1
    // one gram table over BOTH sides: the global rarity order must be
    // shared or the prefix-filter completeness lemma breaks
    val sides = parts.select(lit(false).as("is_probe"),
        col("p_partkey").as("sid"), col("p_name").as("str"))
      .unionByName(probes.select(lit(true).as("is_probe"),
        col("probe_id").as("sid"), col("probe_name").as("str")))
    val gramRows = sides
      .select(col("is_probe"), col("sid"),
        length(col("str")).as("len"),
        explode(grams(col("str"), q)).as("gram"))
    val gramDf = gramRows.groupBy("gram")
      .agg(count(lit(1)).as("df"))
    // per-string prefix: the prefixLen globally-rarest grams (ties by
    // gram text — deterministic); ≤ ~|name| rows per string key, the
    // bounded-collect class
    val prefixes = gramRows.join(gramDf, "gram")
      .groupBy("is_probe", "sid", "len")
      .agg(slice(array_sort(collect_list(struct(col("df"),
        col("gram")))), 1, prefixLen).as("pre"))
      .select(col("is_probe"), col("sid"), col("len"),
        explode(col("pre.gram")).as("gram"))
    // |Δlen| ≤ k rides the candidate join: edit distance is bounded
    // below by the length difference, so the filter is exact-safe and
    // prunes the hot-gram fan-out before the distinct
    val candLong = prefixes.filter(col("is_probe"))
      .select(col("sid").as("probe_id"), col("len").as("p_len"),
        col("gram"))
      .join(prefixes.filter(!col("is_probe"))
        .select(col("sid").as("p_partkey"), col("len").as("r_len"),
          col("gram")), Seq("gram"))
      .filter(abs(col("p_len") - col("r_len")) <= k)
      .select("probe_id", "p_partkey")
    // SHORT-STRING arm (the Ed-Join short-record case): a pair where
    // BOTH sides have ≤ k·q grams gets no guarantee from the prefix
    // lemma (the overlap lower bound |G| − k·q is vacuous — k edits
    // can destroy every gram of a short string). Those pairs are
    // length-bounded (max len ≤ k·q + q − 1), so the arm is a
    // LENGTH-BUCKET equi-join over the tiny short slices — pairs with
    // one long side stay on the prefix arm (the long side alone makes
    // the overlap bound ≥ 1 while the short side's prefix is its
    // whole gram set). q defaults to 2 because the gauge matters most
    // exactly where strings are short (names, titles, codes): the
    // q=2 bound is non-vacuous from len ≥ (k+1)·q = 6, so on a
    // name-length corpus every pair rides the prefix arm; a corpus of
    // long strings would raise q for rarer grams (the Ed-Join
    // recipe), trading prefix size against posting heat.
    val shortMax = k * q + q - 1
    val candShort = probes
      .select(col("probe_id"), length(col("probe_name")).as("p_len"))
      .filter(col("p_len") <= shortMax)
      .withColumn("r_len",
        explode(expr(s"sequence(p_len - $k, p_len + $k)")))
      .join(parts.select(col("p_partkey"),
          length(col("p_name")).as("r_len"))
        .filter(col("r_len") <= shortMax), Seq("r_len"))
      .select("probe_id", "p_partkey")
    val cand = candLong.unionByName(candShort).distinct()

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
}
