#!/usr/bin/env python3
"""Summarize target/stream_scale.json (graft.streaming.StreamScale output)
into the SCALE.md streaming table: per (machine, factor) the data-batch
per-trigger time stats, per-row cost, and the state plateau evidence
(state rows at end of each data batch + after the final watermark
commit).

Usage: python3 tools/stream_scale_report.py [path]
"""
import json
import sys
import statistics


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "target/stream_scale.json"
    rows = [json.loads(l) for l in open(path) if l.strip()]
    by_machine = {}
    for r in rows:
        # records predating the "provider" field: tws has always run on
        # RocksDB (transformWithState requires it), everything else on
        # the default HDFS-backed store
        prov = r.get("provider",
                     "rocksdb" if r["machine"] == "tws" else "hdfs")
        by_machine.setdefault((r["machine"], prov), []).append(r)

    for (machine, prov), runs in by_machine.items():
        print(f"\n== {machine} ({prov}) ==")
        print(f"{'factor':>6} {'rows':>8} {'med ms/trig':>11} "
              f"{'us/row':>7} {'state@batches':>34} {'final':>6}")
        for r in sorted(runs, key=lambda r: r["factor"]):
            trig = r["triggers"]
            data = [t for t in trig if t["in"] > 0]
            total_in = sum(t["in"] for t in data)
            # skip the first data batch (cold codegen) for the median
            warm = data[1:] if len(data) > 1 else data
            med = statistics.median(t["ms"] for t in warm)
            us_row = 1000.0 * med / (total_in / max(1, len(data)))
            srows = [t["stateRows"] for t in data]
            final = trig[-1]["stateRows"]
            print(f"{r['factor']:>6} {total_in:>8} {med:>11.0f} "
                  f"{us_row:>7.1f} {str(srows):>34} {final:>6}")


if __name__ == "__main__":
    main()
