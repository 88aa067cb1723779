#!/usr/bin/env python3
"""Swap the MinHash/SimHash oracle prefixes for staged-parquet scans.

Rewrites oracle_sql.json in place: for each key whose oracle replays
the 64-slot rotate-xor signature (the `d -> sig -> bands` CTE chain)
or the SimHash chunk derivation (`d -> hh -> s -> c`), the prefix is
replaced by a scan of the relations tools/gen_minhash_stage.py wrote.
The DOWNSTREAM SQL (banding joins, components closure, decisions,
keeper argmax) is untouched — that is where sf10-magnitude bugs live
and exactly what the staged gate replays in DuckDB.

Staged == inline equivalence: tools/check_minhash_stage.py asserts
the staged RELATIONS equal DuckDB's inline CTEs at sf0.001/sf0.01/
sf0.1/sf1, and tools/check_staged_oracles.py asserts each swapped
ORACLE's output equals its inline form at sf0.01/sf0.1.

Usage: python3 tools/stage_minhash_oracles.py <oracle_sql.json> <stageDir>
"""
import sys, os, json, re

BANDS_KEYS = ["dedup_minhash", "dedup_incremental",
              "dedup_incremental_stored", "dedup_components",
              "dedup_keep_one", "dedup_cross_source", "pipeline_decontam"]
SIMHASH_KEYS = ["dedup_simhash"]
# dedup_recall_eval: truth (gen_truth_stage.py) + slice-filtered band/
# chunk scans replace the whole sdoc->...->e prefix; the caught-joins
# and the (method, threshold) rollup replay inline
RECALL_KEYS = ["dedup_recall_eval"]

BANDS_RE = re.compile(
    r"d AS \(SELECT doc_id,.*?FROM sig CROSS JOIN range\(0, 8\) t\(b\)\)",
    re.S)
SIMHASH_RE = re.compile(
    r"d AS \(SELECT doc_id,.*?AS chunks FROM s\),", re.S)
RECALL_RE = re.compile(
    r"sdoc AS \(SELECT doc_id, source, text FROM documents"
    r".*?FROM sbits CROSS JOIN range\(0, 4\) t\(k\)\),", re.S)

def swap(oracle: dict, stage_dir: str) -> list:
    # keep a slim `d`: the components closure seeds its label relation
    # from it (l0), and only doc_id is ever referenced downstream
    bands_repl = (f"d AS (SELECT doc_id FROM documents),\n"
                  f"bands AS (SELECT doc_id, band_idx, bh FROM "
                  f"read_parquet('{stage_dir}/bands.parquet'))")
    sim_repl = (f"c AS (SELECT doc_id, list(chunk_val ORDER BY chunk_idx) "
                f"AS chunks FROM read_parquet('{stage_dir}/simhash.parquet') "
                f"GROUP BY doc_id),")
    swapped = []
    for k in BANDS_KEYS:
        if k in oracle:
            new, n = BANDS_RE.subn(bands_repl, oracle[k])
            assert n >= 1, f"{k}: bands prefix not found"
            oracle[k] = new
            swapped.append(f"{k}({n})")
    for k in SIMHASH_KEYS:
        if k in oracle:
            new, n = SIMHASH_RE.subn(sim_repl, oracle[k])
            assert n == 1, f"{k}: simhash prefix not found (n={n})"
            oracle[k] = new
            swapped.append(f"{k}({n})")
    recall_repl = (
        f"truth AS (SELECT doc_id_1, doc_id_2, j_bp FROM "
        f"read_parquet('{stage_dir}/truth.parquet')),\n"
        f"bands AS (SELECT doc_id, band_idx, bh FROM "
        f"read_parquet('{stage_dir}/bands.parquet') "
        f"WHERE doc_id % 4 = 0),\n"
        f"e AS (SELECT doc_id, chunk_idx, "
        f"CAST(chunk_val AS BIGINT) AS chunk_val FROM "
        f"read_parquet('{stage_dir}/simhash.parquet') "
        f"WHERE doc_id % 4 = 0),")
    for k in RECALL_KEYS:
        if k in oracle and os.path.isfile(f"{stage_dir}/truth.parquet"):
            new, n = RECALL_RE.subn(recall_repl, oracle[k])
            assert n == 1, f"{k}: recall prefix not found (n={n})"
            oracle[k] = new
            swapped.append(f"{k}({n})")
    return swapped

if __name__ == "__main__":
    path, stage_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(path))
    swapped = swap(oracle, stage_dir)
    json.dump(oracle, open(path, "w"), indent=1)
    print(f"staged {len(swapped)} oracles: {', '.join(swapped)}")
