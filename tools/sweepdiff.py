#!/usr/bin/env python3
"""Per-query scale-slope report over Bench jsonl logs.

Usage: sweepdiff.py base.jsonl x10.jsonl [x30.jsonl ...]

Each input is the incremental per-query log Bench writes
(SPARK_GRAFT_BENCH_LOG): one {"name": seconds} object per line.
Prints a table of per-query wall times and the slope (last/first),
sorted by slope descending, flagging failures (-1 sentinels) and
queries missing from either end.
"""
import json
import sys


def load(path):
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            obj = json.loads(line)
            for k, v in obj.items():
                out[k] = v
    return out


def main():
    paths = sys.argv[1:]
    runs = [load(p) for p in paths]
    names = sorted(set().union(*[set(r) for r in runs]))
    rows = []
    for n in names:
        vals = [r.get(n) for r in runs]
        ok = all(v is not None and v >= 0 for v in vals)
        slope = (vals[-1] / vals[0]) if ok and vals[0] > 0 else None
        rows.append((n, vals, slope, ok))
    rows.sort(key=lambda r: (r[2] is None, -(r[2] or 0)))
    hdr = ["query"] + [p.split("/")[-1] for p in paths] + ["slope"]
    print("\t".join(hdr))
    for n, vals, slope, ok in rows:
        cells = [n] + [("%.2f" % v) if v is not None else "MISSING" for v in vals]
        cells.append(("%.1fx" % slope) if slope is not None else "N/A")
        if not ok:
            cells.append("<-- FAILED/MISSING")
        print("\t".join(cells))
    done = [r for r in rows if r[2] is not None]
    if done:
        tot = [sum(r[1][i] for r in done) for i in range(len(paths))]
        print("\t".join(["TOTAL(common)"] + ["%.1f" % t for t in tot] +
                        ["%.1fx" % (tot[-1] / tot[0])]))


if __name__ == "__main__":
    main()
