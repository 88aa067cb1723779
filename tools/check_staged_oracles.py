#!/usr/bin/env python3
"""Assert each staged minhash-family ORACLE produces exactly the same
result as its inline form (the full-query equivalence leg, on top of
check_minhash_stage.py's relation-level leg).

Usage: python3 tools/check_staged_oracles.py <sfDir> <stageDir> <oracle_sql.json>
Runs both forms of every swappable key in DuckDB over the sfDir tables
and diffs. Exit 0 iff all match.
"""
import sys, os, json, copy
import duckdb
from stage_minhash_oracles import swap, BANDS_KEYS, SIMHASH_KEYS, RECALL_KEYS

def main(sf_dir, stage_dir, oracle_path):
    inline = json.load(open(oracle_path))
    staged = copy.deepcopy(inline)
    swap(staged, stage_dir)
    con = duckdb.connect()
    p = f"{sf_dir}/documents.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{p}'")
    ok = True
    for k in BANDS_KEYS + SIMHASH_KEYS + RECALL_KEYS:
        if k not in inline or staged[k] == inline[k]:
            print(f"SKIP {k}: not present / not swapped")
            continue
        n_i, n_s, n_diff = con.execute(f"""
            WITH inl AS ({inline[k]}), stg AS ({staged[k]}),
            d1 AS (SELECT * FROM inl EXCEPT ALL SELECT * FROM stg),
            d2 AS (SELECT * FROM stg EXCEPT ALL SELECT * FROM inl)
            SELECT (SELECT count(*) FROM inl),
                   (SELECT count(*) FROM stg),
                   (SELECT count(*) FROM d1) + (SELECT count(*) FROM d2)
        """).fetchone()
        status = "OK  " if (n_diff == 0 and n_i == n_s) else "FAIL"
        if status == "FAIL":
            ok = False
        print(f"{status} {k}: inline={n_i} staged={n_s} sym-diff={n_diff}",
              flush=True)
    sys.exit(0 if ok else 1)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
