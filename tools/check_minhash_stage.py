#!/usr/bin/env python3
"""Assert the python-staged MinHash band / SimHash chunk relations are
byte-identical to DuckDB's inline CTE replay (the staged-oracle
equivalence leg: staged == inline at the SFs where inline is
tractable; tools/gen_minhash_stage.py builds the staged side).

Usage: python3 tools/check_minhash_stage.py <sfDir> <stageDir>
Exit 0 iff both relations match exactly.
"""
import sys, os
import duckdb

BANDS_CTE = """
d AS (SELECT doc_id,
   list_distinct(string_split_regex(trim(text), ' +')) AS w
  FROM documents),
sig AS (SELECT doc_id, list_transform(range(0, 64), i ->
   list_min(list_transform(w, t ->
     CAST(xor(md5_number_lower(t),
       CASE WHEN i = 0 THEN md5_number_upper(t)
       ELSE CAST(((CAST(md5_number_upper(t) AS HUGEINT)
              * CAST(power(2, i) AS HUGEINT))
             % 18446744073709551616)
           + CAST(md5_number_upper(t) >> CAST(64 - i AS INT)
               AS HUGEINT) AS UBIGINT)
       END) % 9223372036854775808 AS BIGINT))))
   AS s
  FROM d),
bands AS (SELECT doc_id, CAST(b AS INT) AS band_idx,
   md5_number_lower(array_to_string(
     list_slice(s, CAST(b*8+1 AS INT), CAST(b*8+8 AS INT)), ','))
   AS bh
  FROM sig CROSS JOIN range(0, 8) t(b))
"""

SIMHASH_CTE = """
d AS (SELECT doc_id,
   list_distinct(string_split_regex(trim(text), ' +')) AS w
  FROM documents),
hh AS (SELECT doc_id, list_transform(w, t -> md5_number_lower(t)) AS wh
  FROM d),
s AS (SELECT doc_id, list_transform(range(0, 64), i ->
   CASE WHEN list_sum(list_transform(wh,
     h -> CAST((h >> i) & 1 AS INT) * 2 - 1)) > 0
   THEN 1 ELSE 0 END) AS bits FROM hh),
c AS (SELECT doc_id, list_transform(range(0, 4), k ->
   CAST(list_sum(list_transform(range(0, 16), b ->
     CAST(bits[CAST(k*16 + b + 1 AS INT)] AS BIGINT) << b)) AS BIGINT))
   AS chunks FROM s),
e AS (SELECT doc_id, CAST(i AS INT) AS chunk_idx,
   chunks[CAST(i + 1 AS INT)] AS chunk_val
  FROM c CROSS JOIN range(0, 4) t(i))
"""

def main(sf_dir: str, stage_dir: str):
    con = duckdb.connect()
    p = f"{sf_dir}/documents.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{p}'")
    ok = True
    for name, cte, select, staged in [
        ("bands", BANDS_CTE,
         "SELECT doc_id, band_idx, bh FROM bands",
         f"SELECT doc_id, band_idx, bh FROM "
         f"read_parquet('{stage_dir}/bands.parquet')"),
        ("simhash", SIMHASH_CTE,
         "SELECT doc_id, chunk_idx, chunk_val FROM e",
         f"SELECT doc_id, chunk_idx, CAST(chunk_val AS BIGINT) AS chunk_val "
         f"FROM read_parquet('{stage_dir}/simhash.parquet')"),
    ]:
        n_inline, n_staged, n_diff = con.execute(f"""
            WITH {cte},
            inl AS ({select}), stg AS ({staged}),
            d1 AS (SELECT * FROM inl EXCEPT SELECT * FROM stg),
            d2 AS (SELECT * FROM stg EXCEPT SELECT * FROM inl)
            SELECT (SELECT count(*) FROM inl),
                   (SELECT count(*) FROM stg),
                   (SELECT count(*) FROM d1) + (SELECT count(*) FROM d2)
        """).fetchone()
        status = "OK  " if (n_diff == 0 and n_inline == n_staged) else "FAIL"
        if status == "FAIL":
            ok = False
        print(f"{status} {name}: inline={n_inline} staged={n_staged} "
              f"sym-diff={n_diff}")
    sys.exit(0 if ok else 1)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
