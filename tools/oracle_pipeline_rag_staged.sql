-- Staged DuckDB oracle for pipeline_rag at sf10 (round-14). The
-- inline oracle embeds the sim_ivfsq_ann chain as a subquery, whose
-- single-query replay spills >78 GB at sf10 (the round-10 finding) —
-- so the vector arm reuses the oracle_sim_ivfsq_staged.sql temp-table
-- prelude verbatim, lands the top-5 stored-index ranks in t_vecr, and
-- the rest of the replay (chunk dedup, lexical arm, RRF fusion, MMR
-- stages, context join) runs as the same inline text as
-- SparkEntry.ragOracleSql. Semantically identical to the inline
-- oracle; equivalence is checked at sf0.01/sf0.1 before use (the
-- ivfsq precedent).
CREATE OR REPLACE TEMP TABLE t_e AS
SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings;

CREATE OR REPLACE TEMP TABLE t_dv AS
SELECT vec_id, label, CAST(i AS INT) AS i, v[CAST(i AS INT)] AS x
FROM t_e CROSS JOIN range(1, 65) t(i);

CREATE OR REPLACE TEMP TABLE t_cent AS
SELECT label AS cell, list(m ORDER BY i) AS cv
FROM (SELECT label, i, avg(x) AS m FROM t_dv GROUP BY 1, 2)
GROUP BY label;

CREATE OR REPLACE TEMP TABLE t_r AS
SELECT list(lo ORDER BY i) AS lo, list(hi ORDER BY i) AS hi
FROM (SELECT i, min(x) AS lo, max(x) AS hi FROM t_dv GROUP BY 1);

DROP TABLE t_dv;

CREATE OR REPLACE TEMP TABLE t_q0 AS
SELECT vec_id AS query_id, v AS qv FROM t_e WHERE vec_id < 10;

CREATE OR REPLACE TEMP TABLE t_probes AS
SELECT query_id, cell FROM (
  SELECT query_id, cell,
    row_number() OVER (PARTITION BY query_id
      ORDER BY list_cosine_similarity(qv, cv) DESC, cell) AS crank
  FROM t_q0 CROSS JOIN t_cent)
WHERE crank <= 5;

CREATE OR REPLACE TEMP TABLE t_cc AS
SELECT vec_id, label, list_transform(range(0, 64), i ->
  CASE WHEN r.hi[CAST(i+1 AS INT)] = r.lo[CAST(i+1 AS INT)] THEN 0
  ELSE CAST(least(greatest(floor(
      (v[CAST(i+1 AS INT)] - r.lo[CAST(i+1 AS INT)])
      / (r.hi[CAST(i+1 AS INT)] - r.lo[CAST(i+1 AS INT)]) * 255.0),
    0), 255) AS INT) END) AS c
FROM t_e, t_r r;

CREATE OR REPLACE TEMP TABLE t_sl AS
SELECT query_id, vec_id FROM (
  SELECT query_id, vec_id,
    row_number() OVER (PARTITION BY query_id
      ORDER BY score DESC, vec_id) AS rn
  FROM (SELECT q.vec_id AS query_id, c.vec_id,
      CAST(list_sum(list_transform(range(0, 64), i ->
        (q.c[CAST(i+1 AS INT)] - 128) * (c.c[CAST(i+1 AS INT)] - 128)))
        AS BIGINT) AS score
    FROM t_cc q
    JOIN t_probes p ON p.query_id = q.vec_id
    JOIN t_cc c ON c.label = p.cell AND c.vec_id != q.vec_id))
WHERE rn <= 20;

CREATE OR REPLACE TEMP TABLE t_vecr AS
SELECT query_id, neighbor_id AS doc_id, rank AS vec_rank FROM (
  SELECT sl.query_id, sl.vec_id AS neighbor_id,
    CAST(row_number() OVER (PARTITION BY sl.query_id
      ORDER BY list_cosine_similarity(q.v, n.v) DESC, sl.vec_id)
      AS INT) AS rank
  FROM t_sl sl JOIN t_e q ON q.vec_id = sl.query_id
  JOIN t_e n ON n.vec_id = sl.vec_id)
WHERE rank <= 5;

WITH ch AS (SELECT doc_id, chunk_idx, n_toks, chunk_hash FROM (
   SELECT *, row_number() OVER (PARTITION BY chunk_hash
     ORDER BY doc_id, chunk_idx) AS rn
   FROM (WITH d AS (SELECT doc_id,
      string_split_regex(trim(text), ' +') AS w,
      CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n
     FROM documents),
   c AS (SELECT doc_id, w, n,
      unnest(range(0, CASE WHEN n <= 64 THEN 1
                     ELSE (n - 64 + 47) // 48 + 1 END)) AS i
     FROM d)
   SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
    CAST(i * 48 + 1 AS BIGINT) AS start_tok,
    CAST(least(64, n - i * 48) AS BIGINT) AS n_toks,
    CAST(md5_number_lower(array_to_string(
        list_slice(w, CAST(i * 48 + 1 AS INT), CAST(i * 48 + 64 AS INT)),
        ' ')) % 9223372036854775808 AS BIGINT) AS chunk_hash
   FROM c)) WHERE rn = 1),
tok AS (SELECT doc_id,
   unnest(string_split_regex(trim(text), ' +')) AS w
  FROM documents),
tf AS (SELECT doc_id,
   CAST(md5_number_lower(w) % 9223372036854775808 AS BIGINT) AS h,
   count(*) AS tf FROM tok GROUP BY 1, 2),
nn AS (SELECT count(*) AS n FROM documents),
idf AS (SELECT h,
   CAST(((n - df + 1) * 10000) // (df + 1) AS BIGINT) AS idf_bp
  FROM (SELECT h, count(*) AS df FROM tf GROUP BY 1) CROSS JOIN nn
  WHERE df <= 65536),
qs AS (SELECT query_id, h, tfq, idf_bp FROM (
   SELECT t.doc_id AS query_id, t.h, t.tf AS tfq, i.idf_bp,
     row_number() OVER (PARTITION BY t.doc_id
       ORDER BY i.idf_bp DESC, t.h) AS r
   FROM tf t JOIN idf i USING (h) WHERE t.doc_id < 10)
  WHERE r <= 20),
lex AS (SELECT q.query_id, t.doc_id,
   CAST(sum(least(q.tfq, t.tf) * q.idf_bp) AS BIGINT) AS score
  FROM qs q JOIN tf t USING (h) WHERE t.doc_id != q.query_id
  GROUP BY 1, 2),
lexr AS (SELECT query_id, doc_id, lex_rank FROM (
   SELECT query_id, doc_id,
     CAST(row_number() OVER (PARTITION BY query_id
       ORDER BY score DESC, doc_id) AS INT) AS lex_rank FROM lex)
  WHERE lex_rank <= 20),
fu AS (SELECT query_id, doc_id FROM (
   SELECT *, row_number() OVER (PARTITION BY query_id
     ORDER BY rrf_e6 DESC, doc_id) AS rank
   FROM (SELECT coalesce(l.query_id, v.query_id) AS query_id,
      coalesce(l.doc_id, v.doc_id) AS doc_id,
      CAST(coalesce(1000000 // (60 + l.lex_rank), 0)
         + coalesce(1000000 // (60 + v.vec_rank), 0) AS BIGINT)
        AS rrf_e6
     FROM lexr l FULL JOIN t_vecr v
       ON l.query_id = v.query_id AND l.doc_id = v.doc_id))
  WHERE rank <= 8),
cvr AS MATERIALIZED (SELECT f.query_id, f.doc_id,
   list_cosine_similarity(qe.v, de.v) AS rel, de.v
  FROM fu f JOIN t_e qe ON qe.vec_id = f.query_id
  JOIN t_e de ON de.vec_id = f.doc_id),
prr AS MATERIALIZED (SELECT x.query_id, x.doc_id AS a,
    y.doc_id AS b, list_cosine_similarity(x.v, y.v) AS sim
  FROM cvr x JOIN cvr y ON x.query_id = y.query_id
    AND x.doc_id != y.doc_id),
racc1 AS MATERIALIZED (SELECT query_id, doc_id, 1 AS mmr_rank
  FROM (SELECT query_id, doc_id, row_number() OVER (
    PARTITION BY query_id ORDER BY rel DESC, doc_id) AS rn
   FROM cvr)
  WHERE rn = 1),
rsel2 AS MATERIALIZED (SELECT query_id, doc_id, 2 AS mmr_rank
  FROM (
   SELECT query_id, doc_id, row_number() OVER (
     PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn
   FROM (SELECT c.query_id, c.doc_id,
      0.7 * c.rel - 0.3 * max(p.sim) AS score
     FROM cvr c
     JOIN prr p ON p.query_id = c.query_id AND p.a = c.doc_id
     JOIN racc1 s ON s.query_id = p.query_id
       AND s.doc_id = p.b
     WHERE NOT EXISTS (SELECT 1 FROM racc1 x
       WHERE x.query_id = c.query_id AND x.doc_id = c.doc_id)
     GROUP BY c.query_id, c.doc_id, c.rel))
  WHERE rn = 1),
racc2 AS MATERIALIZED (SELECT * FROM racc1
  UNION ALL SELECT * FROM rsel2),
rsel3 AS MATERIALIZED (SELECT query_id, doc_id, 3 AS mmr_rank
  FROM (
   SELECT query_id, doc_id, row_number() OVER (
     PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn
   FROM (SELECT c.query_id, c.doc_id,
      0.7 * c.rel - 0.3 * max(p.sim) AS score
     FROM cvr c
     JOIN prr p ON p.query_id = c.query_id AND p.a = c.doc_id
     JOIN racc2 s ON s.query_id = p.query_id
       AND s.doc_id = p.b
     WHERE NOT EXISTS (SELECT 1 FROM racc2 x
       WHERE x.query_id = c.query_id AND x.doc_id = c.doc_id)
     GROUP BY c.query_id, c.doc_id, c.rel))
  WHERE rn = 1),
racc3 AS MATERIALIZED (SELECT * FROM racc2
  UNION ALL SELECT * FROM rsel3),
rsel4 AS MATERIALIZED (SELECT query_id, doc_id, 4 AS mmr_rank
  FROM (
   SELECT query_id, doc_id, row_number() OVER (
     PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn
   FROM (SELECT c.query_id, c.doc_id,
      0.7 * c.rel - 0.3 * max(p.sim) AS score
     FROM cvr c
     JOIN prr p ON p.query_id = c.query_id AND p.a = c.doc_id
     JOIN racc3 s ON s.query_id = p.query_id
       AND s.doc_id = p.b
     WHERE NOT EXISTS (SELECT 1 FROM racc3 x
       WHERE x.query_id = c.query_id AND x.doc_id = c.doc_id)
     GROUP BY c.query_id, c.doc_id, c.rel))
  WHERE rn = 1),
racc4 AS MATERIALIZED (SELECT * FROM racc3
  UNION ALL SELECT * FROM rsel4),
rsel5 AS MATERIALIZED (SELECT query_id, doc_id, 5 AS mmr_rank
  FROM (
   SELECT query_id, doc_id, row_number() OVER (
     PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn
   FROM (SELECT c.query_id, c.doc_id,
      0.7 * c.rel - 0.3 * max(p.sim) AS score
     FROM cvr c
     JOIN prr p ON p.query_id = c.query_id AND p.a = c.doc_id
     JOIN racc4 s ON s.query_id = p.query_id
       AND s.doc_id = p.b
     WHERE NOT EXISTS (SELECT 1 FROM racc4 x
       WHERE x.query_id = c.query_id AND x.doc_id = c.doc_id)
     GROUP BY c.query_id, c.doc_id, c.rel))
  WHERE rn = 1),
racc5 AS MATERIALIZED (SELECT * FROM racc4
  UNION ALL SELECT * FROM rsel5)
SELECT a.query_id, CAST(a.mmr_rank AS INT) AS mmr_rank, a.doc_id,
 ch.chunk_idx, ch.n_toks, ch.chunk_hash
FROM racc5 a JOIN ch USING (doc_id)
