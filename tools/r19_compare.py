#!/usr/bin/env python3
"""Cross-trace per-key comparison (min over passes per side).

Usage: r19_compare.py A.txt B.txt [threshold_sec]
Prints the box envelope (median ratio on keys > 0.5 s) and the keys
whose B/A ratio stands outside +-25% of that envelope.
"""
import re
import sys
import statistics


def load(path):
    best = {}
    for line in open(path):
        m = re.match(r"\[bench-seq\]\s+\d+\s+\S+\s+([\d.]+) s\s+heap=\s*\d+ MB (\S+)", line)
        if m:
            sec, key = float(m.group(1)), m.group(2)
            best[key] = min(best.get(key, 1e9), sec)
    return best


a, b = load(sys.argv[1]), load(sys.argv[2])
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5
common = sorted(set(a) & set(b))
ratios = {k: b[k] / a[k] for k in common if a[k] > thr}
env = statistics.median(ratios.values()) if ratios else 1.0
print(f"common={len(common)} keys>{thr}s={len(ratios)} "
      f"median_ratio(B/A)={env:.3f} "
      f"totalA={sum(a[k] for k in common):.1f} totalB={sum(b[k] for k in common):.1f}")
out = [(k, a[k], b[k], r) for k, r in ratios.items()
       if r > env * 1.25 or r < env * 0.75]
for k, av, bv, r in sorted(out, key=lambda x: -x[3]):
    print(f"  {r:5.2f}x  {av:7.2f} -> {bv:7.2f}  {k}")
