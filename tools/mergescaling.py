#!/usr/bin/env python3
"""Assemble a BENCH_SCALING artifact from two bench trace files.

Usage: python3 tools/mergescaling.py <trace_small> <trace_large> <out.json> [label_small label_large]
Each trace is the [bench-seq] file Bench writes (SPARK_GRAFT_TRACE_OUT):
one line per pass `idx pass sec s heap=N MB name`. Per query and SF the
kept time is min over passes, matching the bench JSON. Labels default
to sf0.1/sf1 (the per-round pair); pass e.g. `sf1 sf10` for the
second-decade pair.
"""
import sys, json, re

LINE = re.compile(
    r"\[bench-seq\]\s+\d+\s+(\w+)\s+([0-9.]+) s\s+heap=\s*\d+ MB (\S+)")

def times(path):
    best = {}
    for line in open(path):
        m = LINE.search(line)
        if not m:
            continue
        _, sec, name = m.groups()
        # the trace prints %7.2f, so a sub-5ms query reads 0.00 —
        # floor at half the print precision so ratios stay defined
        sec = max(float(sec), 0.005)
        best[name] = min(best.get(name, sec), sec)
    return best

small, large, out = sys.argv[1], sys.argv[2], sys.argv[3]
ls = sys.argv[4] if len(sys.argv) > 4 else "sf0.1"
ll = sys.argv[5] if len(sys.argv) > 5 else "sf1"
ts, tl = times(small), times(large)
common = sorted(set(ts) & set(tl))
if not common:
    sys.exit(f"no common queries between {small} and {large}")
queries = {}
for name in common:
    queries[name] = {
        ls: round(ts[name], 2),
        ll: round(tl[name], 2),
        "ratio": round(tl[name] / ts[name], 2),
    }
tot_s = sum(ts[n] for n in queries)
tot_l = sum(tl[n] for n in queries)
ratios = sorted(q["ratio"] for q in queries.values())
doc = {
    "note": "min over passes per query per SF; single-run pair, "
            "multi-second dedup queries vary +-25% run-to-run",
    f"total_{ls}": round(tot_s, 2),
    f"total_{ll}": round(tot_l, 2),
    "total_ratio": round(tot_l / tot_s, 2),
    "median_ratio": ratios[len(ratios) // 2],
    "max_ratio": ratios[-1],
    "n_queries": len(queries),
    "queries": queries,
}
with open(out, "w") as f:
    json.dump(doc, f, indent=1, sort_keys=False)
print(f"{out}: total {doc[f'total_{ls}']}s -> {doc[f'total_{ll}']}s "
      f"({doc['total_ratio']}x), median {doc['median_ratio']}x, "
      f"max {doc['max_ratio']}x over {len(queries)} queries")
