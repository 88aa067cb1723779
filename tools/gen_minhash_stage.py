#!/usr/bin/env python3
"""Stage the engine-independent MinHash/SimHash intermediates for the
sf10 oracle gate (round-15 verdict item 1).

The dedup/minhash oracle family was excluded from the sf10 gate
because DuckDB replays the 64-slot rotate-xor signature in interpreted
HUGEINT arithmetic (hours at sf10). The signature itself is
engine-independent — md5 halves + rotate-xor, already proven equal
between Spark and DuckDB at 3 SFs — so this script recomputes it a
THIRD way (python hashlib + numpy uint64, byte-for-byte the
md5_number_lower/upper convention) and writes it as parquet. The sf10
gate then swaps each excluded oracle's `d -> sig -> bands` prefix for
a scan of the staged relation and replays the full DOWNSTREAM
(banding -> components closure -> decisions -> keeper) in DuckDB,
where the sf10-magnitude bugs live. Staged == inline is asserted at
sf0.001/sf0.01/sf0.1 by tools/check_minhash_stage.py.

Usage: python3 tools/gen_minhash_stage.py <sfDir> <outDir>
Writes <outDir>/bands.parquet   (doc_id BIGINT, band_idx INT, bh UBIGINT)
and    <outDir>/simhash.parquet (doc_id BIGINT, chunk_idx INT, chunk_val BIGINT)
"""
import sys, os, re, hashlib
import numpy as np
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

MASK63 = np.uint64((1 << 63) - 1)
SHIFTS = np.arange(64, dtype=np.uint64)

def md5_halves(tok: str):
    d = hashlib.md5(tok.encode("utf-8")).digest()
    return (int.from_bytes(d[8:16], "little"),
            int.from_bytes(d[0:8], "little"))

def md5_lower64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:16],
                          "little")

def main(sf_dir: str, out_dir: str, chunk_docs: int = 10000):
    os.makedirs(out_dir, exist_ok=True)
    p = f"{sf_dir}/documents.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con = duckdb.connect()
    cur = con.execute(
        f"SELECT doc_id, text FROM '{p}' ORDER BY doc_id")
    cache = {}  # token -> (h1, h2); the clone corpus reuses tokens heavily
    split = re.compile(" +").split

    bands_w = pq.ParquetWriter(
        f"{out_dir}/bands.parquet",
        pa.schema([("doc_id", pa.int64()), ("band_idx", pa.int32()),
                   ("bh", pa.uint64())]))
    sim_w = pq.ParquetWriter(
        f"{out_dir}/simhash.parquet",
        pa.schema([("doc_id", pa.int64()), ("chunk_idx", pa.int32()),
                   ("chunk_val", pa.int64())]))
    total = 0
    while True:
        rows = cur.fetchmany(chunk_docs)
        if not rows:
            break
        doc_ids = np.array([r[0] for r in rows], dtype=np.int64)
        # DuckDB list_distinct(string_split_regex(trim(text), ' +'));
        # order is irrelevant downstream (min / bit-count reductions)
        tok_sets = [sorted(set(split(r[1].strip(" ")))) for r in rows]
        vocab = sorted(set().union(*tok_sets))
        idx = {t: i for i, t in enumerate(vocab)}
        h1 = np.empty(len(vocab), dtype=np.uint64)
        h2 = np.empty(len(vocab), dtype=np.uint64)
        for i, t in enumerate(vocab):
            hv = cache.get(t)
            if hv is None:
                hv = md5_halves(t)
                cache[t] = hv
            h1[i], h2[i] = hv
        # slot hashes: (h1 ^ rotl(h2, s)) mod 2^63, s in [0, 64)
        rot = np.empty((len(vocab), 64), dtype=np.uint64)
        rot[:, 0] = h2
        for s in range(1, 64):
            rot[:, s] = (h2 << np.uint64(s)) | (h2 >> np.uint64(64 - s))
        C = (h1[:, None] ^ rot) & MASK63  # V x 64
        # simhash bit matrix over the SAME distinct-token stream
        B = ((h1[:, None] >> SHIFTS) & np.uint64(1)).astype(np.int32)

        flat = np.fromiter(
            (idx[t] for ts in tok_sets for t in ts), dtype=np.int64)
        starts = np.zeros(len(rows), dtype=np.int64)
        lens = np.array([len(ts) for ts in tok_sets], dtype=np.int64)
        starts[1:] = np.cumsum(lens)[:-1]
        sig = np.minimum.reduceat(C[flat], starts, axis=0)   # docs x 64
        cnt = np.add.reduceat(B[flat], starts, axis=0)       # docs x 64
        bits = (2 * cnt - lens[:, None]) > 0                 # docs x 64

        # band hashes: md5-lower-64 of the comma-joined 8-slot slice
        n = len(rows)
        bh = np.empty(n * 8, dtype=np.uint64)
        b_doc = np.repeat(doc_ids, 8)
        b_idx = np.tile(np.arange(8, dtype=np.int32), n)
        sig_str = sig.astype("U20")  # decimal strings, non-negative
        k = 0
        for d in range(n):
            row = sig_str[d]
            for b in range(8):
                bh[k] = md5_lower64(",".join(row[b * 8:(b + 1) * 8]))
                k += 1
        bands_w.write_table(pa.table(
            {"doc_id": b_doc, "band_idx": b_idx, "bh": bh},
            schema=pa.schema([("doc_id", pa.int64()),
                              ("band_idx", pa.int32()),
                              ("bh", pa.uint64())])))

        # simhash 4x16-bit chunks
        weights = (np.uint64(1) << SHIFTS[:16]).astype(np.int64)
        chunks = np.stack([
            (bits[:, k16 * 16:(k16 + 1) * 16].astype(np.int64) * weights)
            .sum(axis=1) for k16 in range(4)], axis=1)       # docs x 4
        sim_w.write_table(pa.table(
            {"doc_id": np.repeat(doc_ids, 4),
             "chunk_idx": np.tile(np.arange(4, dtype=np.int32), n),
             "chunk_val": chunks.reshape(-1)},
            schema=pa.schema([("doc_id", pa.int64()),
                              ("chunk_idx", pa.int32()),
                              ("chunk_val", pa.int64())])))
        total += n
        if total % 100000 == 0:
            print(f"  {total} docs staged", flush=True)
    bands_w.close()
    sim_w.close()
    print(f"staged {total} docs -> {out_dir} "
          f"(vocab cache {len(cache)} tokens)")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
