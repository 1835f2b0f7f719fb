#!/usr/bin/env python3
"""Apply the PERF.md round-9 regression rule to two bench.json artifacts.

A key is a REGRESSION CANDIDATE when its new median exceeds the old
artifact's recorded [min, max] band's max (directional — dropping below
min is an improvement, not a regression) AND the run-level shift does
not explain it: run-level box state moves every key together, so the
per-key ratio is first normalized by the ratio of the two run totals
over the common key set.

Old artifacts from before round 9 have no "passes" field; for those the
band degrades to the bare median and the rule falls back to the
documented cross-round noise threshold (1.5x normalized).

Usage: python3 tools/bench_compare.py OLD.json NEW.json
Exit 1 when any regression candidate is found (CI-friendly).
"""
import json
import sys

NOISE_FALLBACK = 1.5  # normalized ratio threshold when OLD has no band


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    common = sorted(set(old["queries"]) & set(new["queries"]))
    if not common:
        sys.exit("no common keys between the two artifacts")
    old_total = sum(old["queries"][k] for k in common)
    new_total = sum(new["queries"][k] for k in common)
    shift = new_total / old_total
    print(f"common keys: {len(common)}  "
          f"totals: {old_total:.1f}s -> {new_total:.1f}s  "
          f"run-level shift x{shift:.2f}")

    candidates = []
    for k in common:
        med = new["queries"][k]
        norm = med / shift  # what this run "would" measure at the old run's box state
        band = old.get("passes", {}).get(k)
        if band:
            lo, hi = min(band), max(band)
            if norm > hi:
                candidates.append((norm / hi, k,
                                   f"norm median {norm:.3f}s above old band "
                                   f"[{lo:.3f}, {hi:.3f}]"))
        else:
            ratio = norm / old["queries"][k]
            if ratio > NOISE_FALLBACK:
                candidates.append((ratio, k,
                                   f"norm ratio x{ratio:.2f} vs old median "
                                   f"{old['queries'][k]:.3f}s (no band in old)"))

    if not candidates:
        print("no regression candidates")
        return
    print(f"{len(candidates)} regression candidate(s):")
    for sev, k, why in sorted(candidates, reverse=True):
        print(f"  {k}: {why}")
    sys.exit(1)


if __name__ == "__main__":
    main()
