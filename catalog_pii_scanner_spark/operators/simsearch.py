"""Similarity search over the embedding column (training-data pipeline).

Two variants over ``embeddings(vec_id BIGINT, embedding ARRAY<FLOAT>,
label INT)``:

- ``cosine_topk``: brute-force top-k cosine neighbors for a query subset
  (vec_id % query_mod == 0). Correctness baseline.
- ``ann_lsh_topk``: random-hyperplane LSH — 8 deterministic md5-derived
  +/-1 hyperplanes bucket vectors by sign signature; top-k is computed
  within buckets only. The scale path: at 1000 executors the bucket join
  shuffles only signature-mates instead of all pairs.

Both are rendered from one SQL template per dialect (explode to
(vec_id, pos, val), join on pos, one groupBy per pair for the dot
product). Scale notes: for a production 100 TB corpus the inner product
moves to an Arrow-batched pandas UDF doing numpy matmul per partition
against a broadcast query matrix with per-partition top-k + global top-k
merge — same semantics, BLAS throughput; the declarative form here is the
oracle-parity implementation and is already shuffle-minimal (positions
join is a projection-local explode; the only shuffle is the (query,
candidate) aggregation).

Floating point: cosines are rounded to 1e-6 before ranking (ties then
break by neighbor id) so engine summation order cannot flip ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_HEX = "0123456789abcdef"

DIMS = 64
NUM_PLANES = 8


def _exploded_cte(dialect: str, rel: str) -> str:
    """vecs(vec_id, pos 1-based, val DOUBLE) + norms(vec_id, norm)."""
    if dialect == "duckdb":
        explode = (f"SELECT vec_id, pos, CAST(list_extract(embedding, pos) "
                   f"AS DOUBLE) AS val "
                   f"FROM {rel}, (SELECT unnest(range(1, {DIMS + 1})) AS pos) _p")
    else:
        explode = (f"SELECT vec_id, pos + 1 AS pos, CAST(val AS DOUBLE) AS val "
                   f"FROM (SELECT vec_id, posexplode(embedding) AS (pos, val) "
                   f"FROM {rel}) _e")
    return f"""
vecs AS ({explode}),
norms AS (
  SELECT vec_id, sqrt(SUM(val * val)) AS norm FROM vecs GROUP BY vec_id
)"""


def cosine_topk_sql(dialect: str, rel: str = "embeddings", k: int = 5,
                    query_mod: int = 50) -> str:
    """Output: query_id, neighbor_id, rank, cosine (rounded 1e-6)."""
    return f"""
WITH {_exploded_cte(dialect, rel)},
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         SUM(q.val * c.val) AS dot
  FROM vecs q JOIN vecs c ON q.pos = c.pos AND q.vec_id <> c.vec_id
  WHERE q.vec_id % {query_mod} = 0
  GROUP BY q.vec_id, c.vec_id
),
cos AS (
  SELECT d.query_id, d.neighbor_id,
         round(d.dot / (nq.norm * nc.norm), 6) AS cosine
  FROM dots d
  JOIN norms nq ON nq.vec_id = d.query_id
  JOIN norms nc ON nc.vec_id = d.neighbor_id
)
SELECT query_id, neighbor_id, rank, cosine FROM (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM cos
) WHERE rank <= {k}
"""


def cosine_topk(spark, sf_dir: str, k: int = 5,
                query_mod: int = 50) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .createOrReplaceTempView("cpss_embeddings")
    return spark.sql(cosine_topk_sql("spark", "cpss_embeddings", k,
                                     query_mod))


def _planes_cte() -> str:
    """NUM_PLANES x DIMS deterministic +/-1 hyperplanes: sign from the
    parity of a md5 hex digit of 'plane:pos' — identical in both engines."""
    return f"""
planes AS (
  SELECT p.plane, d.pos,
         CASE WHEN (instr('{_HEX}', substr(md5(CAST(p.plane AS VARCHAR)
              || ':' || CAST(d.pos AS VARCHAR)), 1, 1)) - 1) % 2 = 1
              THEN 1.0 ELSE -1.0 END AS sign
  FROM (SELECT unnest(range(0, {NUM_PLANES})) AS plane) p,
       (SELECT unnest(range(1, {DIMS + 1})) AS pos) d
)"""


def _planes_cte_spark() -> str:
    return f"""
planes AS (
  SELECT p.plane, d.pos,
         CASE WHEN (instr('{_HEX}', substr(md5(CAST(p.plane AS STRING)
              || ':' || CAST(d.pos AS STRING)), 1, 1)) - 1) % 2 = 1
              THEN 1.0 ELSE -1.0 END AS sign
  FROM (SELECT explode(sequence(0, {NUM_PLANES - 1})) AS plane) p,
       (SELECT explode(sequence(1, {DIMS})) AS pos) d
)"""


def ann_lsh_topk_sql(dialect: str, rel: str = "embeddings", k: int = 5,
                     query_mod: int = 50) -> str:
    """LSH-bucketed ANN. Signature = 8 sign bits of hyperplane projections;
    neighbors searched within the exact-signature bucket only.

    Output: query_id, neighbor_id, rank, cosine (bucket-local top-k).
    """
    planes = (_planes_cte() if dialect == "duckdb"
              else _planes_cte_spark()).strip()
    return f"""
WITH {_exploded_cte(dialect, rel)},
{planes},
proj AS (
  SELECT v.vec_id, p.plane, SUM(v.val * p.sign) AS proj
  FROM vecs v JOIN planes p ON v.pos = p.pos
  GROUP BY v.vec_id, p.plane
),
sigs AS (
  SELECT vec_id,
         SUM(CASE WHEN proj > 0 THEN CAST(1 AS BIGINT) ELSE 0 END
             * CAST(power(2, plane) AS BIGINT)) AS sig
  FROM proj GROUP BY vec_id
),
pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id
  FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.vec_id <> b.vec_id
  WHERE a.vec_id % {query_mod} = 0
),
dots AS (
  SELECT p.query_id, p.neighbor_id, SUM(q.val * c.val) AS dot
  FROM pairs p
  JOIN vecs q ON q.vec_id = p.query_id
  JOIN vecs c ON c.vec_id = p.neighbor_id AND c.pos = q.pos
  GROUP BY p.query_id, p.neighbor_id
),
cos AS (
  SELECT d.query_id, d.neighbor_id,
         round(d.dot / (nq.norm * nc.norm), 6) AS cosine
  FROM dots d
  JOIN norms nq ON nq.vec_id = d.query_id
  JOIN norms nc ON nc.vec_id = d.neighbor_id
)
SELECT query_id, neighbor_id, rank, cosine FROM (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM cos
) WHERE rank <= {k}
"""


def ann_lsh_topk(spark, sf_dir: str, k: int = 5,
                 query_mod: int = 50) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .createOrReplaceTempView("cpss_embeddings")
    return spark.sql(ann_lsh_topk_sql("spark", "cpss_embeddings", k,
                                      query_mod))
