#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: for each query dumped
by graft.Verify, run its oracle SQL in DuckDB over the same parquet tables
and compare (schema + values, column-name-sorted, exact).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_type(t: pa.DataType) -> str:
    """Canonical name for an Arrow type, strict where the driver is
    strict (timestamp tz-ness, decimal precision/scale, int width) and
    loose only on representation details that differ between a parquet
    reader and DuckDB's Arrow export (string vs large_string, timestamp
    unit, dictionary encoding)."""
    if pa.types.is_dictionary(t):
        t = t.value_type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp[tz]" if t.tz else "timestamp[ntz]"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{norm_type(t.value_type)}>"
    if pa.types.is_map(t):
        return f"map<{norm_type(t.key_type)},{norm_type(t.item_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{norm_type(f.type)}" for f in t)
        return f"struct<{inner}>"
    return str(t)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    failures = 0
    import glob
    names = sorted(d.split("/")[-1] for d in glob.glob(f"{out_dir}/*")
                   if not d.endswith(".json"))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no spark output")
            failures += 1
            continue
        got = con.sql(
            f"SELECT * FROM read_parquet({files!r})").df()
        if name not in oracle:
            print(f"[skip ] {name}: no oracle ({len(got)} rows)")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            failures += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"[FAIL] {name}: columns {list(got.columns)} vs "
                  f"{list(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"[FAIL] {name}: rows {len(got)} vs {len(exp)}")
            failures += 1
            continue
        # Schema check at the Arrow/parquet logical-type level — the
        # driver compares there, so pandas-kind equality is not enough
        # (ltz and ntz timestamps are both kind 'M' but fail the driver).
        # every part file must carry the same logical types — reading
        # only files[0] would let a corrupted/divergent later part pass
        part_types = [{f.name: norm_type(f.type) for f in pq.read_schema(p)}
                      for p in files]
        got_types = part_types[0]
        divergent = [(files[i], part_types[i]) for i in range(1, len(files))
                     if part_types[i] != got_types]
        if divergent:
            print(f"[FAIL] {name}: part schema divergence: "
                  f"{divergent[0][0].split('/')[-1]} has {divergent[0][1]} "
                  f"vs {got_types}")
            failures += 1
            continue
        exp_types = {f.name: norm_type(f.type)
                     for f in con.sql(oracle[name]).arrow().schema}
        mismatch = [(c, got_types[c], exp_types[c]) for c in sorted(got_types)
                    if got_types[c] != exp_types.get(c, got_types[c])]
        if mismatch:
            print(f"[FAIL] {name}: arrow type mismatch {mismatch}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(
                got.reset_index(drop=True), exp.reset_index(drop=True),
                check_dtype=False, check_exact=True)
            print(f"[ok  ] {name}: {len(got)} rows")
        except AssertionError as e:
            print(f"[FAIL] {name}: {str(e).splitlines()[-1][:200]}")
            failures += 1
    # an oracle key with no dump dir means the Spark query THREW during
    # Verify — without this, a crashed query silently vanishes from the
    # compare (Verify narrows oracle_sql.json to the dumped subset, so
    # this is exact even under SPARK_GRAFT_VERIFY_ONLY)
    for name in sorted(set(oracle) - set(names)):
        print(f"[FAIL] {name}: oracle present but no spark dump "
              f"(query failed during Verify?)")
        failures += 1
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
