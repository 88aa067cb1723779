#!/usr/bin/env python3
"""Assemble a BENCH_SCALING artifact from N bench trace files (N >= 2).

Usage:
  python3 tools/mergescaling.py out.json trace1 label1 trace2 label2 [trace3 label3 ...]

Each trace is the [bench-seq] file Bench writes (SPARK_GRAFT_TRACE_OUT):
one line per pass `idx pass sec s heap=N MB name`. Per query and SF the
kept time is min over passes, matching the bench JSON. Labels are the
SF names in ascending size order (e.g. sf0.1 sf1 sf10); per-query
ratios are emitted per adjacent pair, so a three-point artifact shows
BOTH decades.
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

argv = sys.argv[1:]
if len(argv) < 5 or len(argv) % 2 == 0:
    sys.exit(__doc__)
out = argv[0]
pairs = list(zip(argv[1::2], argv[2::2]))
labels = [l for _, l in pairs]
ts = {l: times(p) for p, l in pairs}
common = sorted(set.intersection(*(set(t) for t in ts.values())))
if not common:
    sys.exit("no common queries across traces")
queries = {}
for name in common:
    row = {l: round(ts[l][name], 2) for l in labels}
    for a, b in zip(labels, labels[1:]):
        row[f"ratio_{b}/{a}"] = round(ts[b][name] / ts[a][name], 2)
    queries[name] = row
doc = {
    "note": "min over passes per query per SF; multi-second dedup "
            "queries vary +-25% run-to-run",
    "n_queries": len(queries),
}
for l in labels:
    doc[f"total_{l}"] = round(sum(ts[l][n] for n in common), 2)
for a, b in zip(labels, labels[1:]):
    key = f"{b}/{a}"
    ratios = sorted(queries[n][f"ratio_{key}"] for n in common)
    doc[f"total_ratio_{key}"] = round(doc[f"total_{b}"] / doc[f"total_{a}"], 2)
    doc[f"median_ratio_{key}"] = ratios[len(ratios) // 2]
    doc[f"max_ratio_{key}"] = ratios[-1]
doc["queries"] = queries
with open(out, "w") as f:
    json.dump(doc, f, indent=1, sort_keys=False)
parts = [f"{l} {doc[f'total_{l}']}s" for l in labels]
rat = [f"{b}/{a} {doc[f'total_ratio_{b}/{a}']}x (median "
       f"{doc[f'median_ratio_{b}/{a}']}x, max {doc[f'max_ratio_{b}/{a}']}x)"
       for a, b in zip(labels, labels[1:])]
print(f"{out}: " + " -> ".join(parts) + " | " + "; ".join(rat) +
      f" over {len(common)} queries")
