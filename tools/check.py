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

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


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
        # dtype check (loose: compare kind)
        mismatch = [c for c in got.columns
                    if got[c].dtype.kind != exp[c].dtype.kind]
        if mismatch:
            print(f"[FAIL] {name}: dtype mismatch {[(c, str(got[c].dtype), str(exp[c].dtype)) for c in mismatch]}")
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
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
