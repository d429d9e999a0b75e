#!/usr/bin/env python3
"""Prototype of the q54 IVF oracle SQL (unrolled deterministic Lloyd).

Mirrors graft.operators.Similarity.trainCentroids (k=8, iters=3,
roundTo=9) + ivfTopK (nprobe=2, k=5) over embeddings. Dev tool only —
the final SQL is embedded in SimilarityQueries.scala.
"""
import sys
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

COS = lambda a, b: (
    f"ROUND(list_dot_product({a}, {b}) / "
    f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 9)"
)


def assign(src, cent, out):
    """Nearest-centroid assignment: rounded cosine argmax, ties by centroid_id."""
    return f"""{out} AS (
  SELECT cid, v, centroid_id FROM (
    SELECT e.vec_id AS cid, e.v AS v, c.centroid_id,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY {COS('e.v', 'c.centroid')} DESC, c.centroid_id) AS rn
    FROM {src} e CROSS JOIN {cent} c) t
  WHERE rn = 1)"""


def means(src, out):
    """Per-(centroid,dim) decimal-exact mean rounded to 9 decimals."""
    return f"""{out} AS (
  SELECT centroid_id, list(m ORDER BY dim) AS centroid FROM (
    SELECT centroid_id, dim,
      ROUND(CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / COUNT(x), 9) AS m
    FROM (SELECT centroid_id, unnest(v) AS x,
                 unnest(range(1, len(v)+1)) AS dim FROM {src}) u
    GROUP BY centroid_id, dim) g
  GROUP BY centroid_id)"""


SQL = f"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c0 AS (SELECT vec_id AS centroid_id, v AS centroid FROM e ORDER BY vec_id LIMIT 8),
{assign('e', 'c0', 'a1')},
{means('a1', 'c1')},
{assign('e', 'c1', 'a2')},
{means('a2', 'c2')},
{assign('e', 'c2', 'a3')},
{means('a3', 'c3')},
af AS (
  SELECT cid AS neighbor_id, v AS cv, centroid_id FROM (
    SELECT e.vec_id AS cid, e.v AS v, c.centroid_id,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY {COS('e.v', 'c.centroid')} DESC, c.centroid_id) AS rn
    FROM e CROSS JOIN c3 c) t
  WHERE rn = 1),
qp AS (
  SELECT qid AS query_id, qv, centroid_id FROM (
    SELECT q.vec_id AS qid, q.v AS qv, c.centroid_id,
      row_number() OVER (PARTITION BY q.vec_id
        ORDER BY {COS('q.v', 'c.centroid')} DESC, c.centroid_id) AS rn
    FROM (SELECT * FROM e WHERE vec_id < 10) q CROSS JOIN c3 c) t
  WHERE rn <= 2),
scored AS (
  SELECT qp.query_id, af.neighbor_id, af.centroid_id,
    {COS('qp.qv', 'af.cv')} AS cos
  FROM qp JOIN af USING (centroid_id)
  WHERE qp.query_id <> af.neighbor_id),
ranked AS (
  SELECT query_id, neighbor_id, centroid_id, cos,
    CAST(row_number() OVER (PARTITION BY query_id
      ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored)
SELECT query_id, neighbor_id, centroid_id, cos, rank FROM ranked
WHERE rank <= 5 ORDER BY query_id, rank"""

if __name__ == "__main__":
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')")
    df = con.execute(SQL).df()
    print(df.to_string())
    print(f"rows={len(df)}")
