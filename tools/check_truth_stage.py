#!/usr/bin/env python3
"""Assert the python-staged dedup_recall_eval TRUTH relation is
exactly DuckDB's inline replay (the staged-truth equivalence leg).

Usage: python3 tools/check_truth_stage.py <sfDir> <stageDir>
"""
import sys, os
import duckdb

TRUTH_SQL = """
WITH sdoc AS (SELECT doc_id, source, text FROM documents
  WHERE doc_id % 4 = 0),
d AS (SELECT doc_id, source,
   list_distinct(string_split_regex(trim(text), ' +')) AS w
  FROM sdoc)
SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
   CAST(round(round(len(list_intersect(a.w, b.w))::DOUBLE
       / len(list_distinct(list_concat(a.w, b.w))), 4) * 10000)
     AS BIGINT) AS j_bp
  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
  WHERE len(list_intersect(a.w, b.w))::DOUBLE
     / len(list_distinct(list_concat(a.w, b.w))) >= 0.7
"""

def main(sf_dir: str, stage_dir: str):
    con = duckdb.connect()
    p = f"{sf_dir}/documents.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{p}'")
    n_i, n_s, n_diff = con.execute(f"""
        WITH inl AS ({TRUTH_SQL}),
        stg AS (SELECT doc_id_1, doc_id_2, j_bp FROM
          read_parquet('{stage_dir}/truth.parquet')),
        d1 AS (SELECT * FROM inl EXCEPT ALL SELECT * FROM stg),
        d2 AS (SELECT * FROM stg EXCEPT ALL SELECT * FROM inl)
        SELECT (SELECT count(*) FROM inl), (SELECT count(*) FROM stg),
               (SELECT count(*) FROM d1) + (SELECT count(*) FROM d2)
    """).fetchone()
    ok = n_diff == 0 and n_i == n_s
    print(f"{'OK  ' if ok else 'FAIL'} truth: inline={n_i} "
          f"staged={n_s} sym-diff={n_diff}")
    sys.exit(0 if ok else 1)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
