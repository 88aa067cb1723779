#!/usr/bin/env python3
"""Stage dedup_recall_eval's exact ground-truth pair relation.

The key's oracle needs the exact AllPairs jaccard pairs (j >= 0.7) on
the 25% audit slice — 390M pairwise ~70-element list-intersections at
sf10, which DuckDB's interpreted list ops could not finish in 33 min
(r15 probe). The truth is engine-independent, so this recomputes it a
third way: per source block, a binary membership matrix over the
corpus vocabulary and ONE float32 matmul gives every pairwise
intersection size (|A∩B| = row_A · row_B for set-valued rows);
|A∪B| = |A| + |B| − |A∩B|, and the basis-point rounding replicates
the oracle's round(round(j,4)*10000) with decimal HALF_UP on the same
IEEE double. Staged == inline is asserted at sf0.01/sf0.1/sf1 by
tools/check_truth_stage.py (GenScale preserves word-set SIZES across
clone copies, so the (inter, union) rationals occurring at sf10 are
the small-SF ones — the rounding convention is exercised, not
assumed).

Usage: python3 tools/gen_truth_stage.py <sfDir> <outDir>
Writes <outDir>/truth.parquet (doc_id_1, doc_id_2 BIGINT, j_bp BIGINT)
"""
import sys, os, re
from decimal import Decimal, ROUND_HALF_UP
import numpy as np
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

Q4 = Decimal("0.0001")

def j_bp(q: float) -> int:
    # the oracle's CAST(round(round(q,4)*10000) AS BIGINT) on the SAME
    # IEEE double: quantize the double's exact decimal expansion at 4
    # places HALF_UP (Spark's BigDecimal round convention), then scale
    return int((Decimal(q).quantize(Q4, ROUND_HALF_UP) * 10000)
               .to_integral_value(ROUND_HALF_UP))

def main(sf_dir: str, out_dir: str):
    os.makedirs(out_dir, exist_ok=True)
    p = f"{sf_dir}/documents.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con = duckdb.connect()
    split = re.compile(" +").split
    sources = [r[0] for r in con.execute(
        f"SELECT DISTINCT source FROM '{p}' ORDER BY source").fetchall()]
    writer = pq.ParquetWriter(
        f"{out_dir}/truth.parquet",
        pa.schema([("doc_id_1", pa.int64()), ("doc_id_2", pa.int64()),
                   ("j_bp", pa.int64())]))
    total = 0
    for src in sources:
        rows = con.execute(
            f"SELECT doc_id, text FROM '{p}' WHERE source = ? "
            f"AND doc_id % 4 = 0 ORDER BY doc_id", [src]).fetchall()
        if len(rows) < 2:
            continue
        ids = np.array([r[0] for r in rows], dtype=np.int64)
        tok_sets = [set(split(r[1].strip(" "))) for r in rows]
        vocab = {t: i for i, t in enumerate(
            sorted(set().union(*tok_sets)))}
        n, v = len(rows), len(vocab)
        B = np.zeros((n, v), dtype=np.float32)
        for i, ts in enumerate(tok_sets):
            B[i, [vocab[t] for t in ts]] = 1.0
        inter = B @ B.T                      # |A∩B| as float32 counts
        sizes = B.sum(axis=1)
        iu, ju = np.triu_indices(n, 1)
        it = inter[iu, ju].astype(np.float64)
        union = (sizes[iu] + sizes[ju]).astype(np.float64) - it
        # the oracle's WHERE is on the RAW double quotient (pre-round)
        q = it / union
        keep = q >= 0.7
        a, b, qs = ids[iu[keep]], ids[ju[keep]], q[keep]
        bps = np.fromiter((j_bp(x) for x in qs), dtype=np.int64,
                          count=len(qs))
        writer.write_table(pa.table(
            {"doc_id_1": a, "doc_id_2": b, "j_bp": bps},
            schema=pa.schema([("doc_id_1", pa.int64()),
                              ("doc_id_2", pa.int64()),
                              ("j_bp", pa.int64())])))
        total += len(qs)
        print(f"  {src}: {len(rows)} slice docs -> {len(qs)} truth pairs",
              flush=True)
    writer.close()
    print(f"staged {total} truth pairs -> {out_dir}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
