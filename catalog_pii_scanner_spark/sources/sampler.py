"""Value samplers (reference S5/S6 + P2/P3 + A7).

The reference ladders TABLESAMPLE percent -> ORDER BY rand() -> LIMIT per
column, one JDBC query each (reference: sampler.py:85-220, athena.py:97-135).
Spark replaces the whole ladder:

- ``sample_columns``: ONE job over the melted relation samples *every*
  column — distinct non-null values, capped at n per column. No per-column
  query fan-out; the dedup+cap is one shuffle on (column_ref, value) and a
  per-column window. Deterministic (ORDER BY value) so it is
  oracle-checkable; pass ``deterministic=False`` for the reference's random
  flavor (rand(seed) ordering — still reproducible under a fixed seed and
  partitioning, but not engine-portable).
- ``tablesample_values``: the built-in TABLESAMPLE path for when a fraction
  of the *rows* (not distinct values) is wanted — maps to a parquet scan
  that never reads the unsampled row groups.

At 100 TB: the melt is a projection (column-pruned parquet scan); the
distinct shuffle is the dominating cost and is exactly the work requested.
Skewed columns (few distinct values, e.g. flags) collapse to almost nothing
in the map-side partial aggregate before shuffling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SAMPLE_N = 20


SALT_BUCKETS = 64


def sample_columns(values_df: DataFrame, n: int = DEFAULT_SAMPLE_N,
                   deterministic: bool = True, seed: int = 42) -> DataFrame:
    """(column_ref, value) -> at most n distinct non-null values per column.

    Two-phase top-k: a single window per column_ref puts EVERY distinct
    value of a high-cardinality column into one task (measured 105 s at
    sf0.1 — lineitem price columns are ~600 k distinct each). Phase 1
    prunes within (column_ref, hash-salt) buckets — 64-way parallel per
    column, and the global top-n is provably contained in the union of
    per-bucket top-n — so the final per-column window sees <= 64*n rows.
    """
    vals = values_df.where(F.col("value").isNotNull()).distinct()
    order = F.col("value") if deterministic else F.rand(seed)
    salt = F.pmod(F.xxhash64("value"), F.lit(SALT_BUCKETS))
    w1 = Window.partitionBy("column_ref", "_salt").orderBy(order)
    pre = (
        vals.withColumn("_salt", salt)
        .withColumn("_rn1", F.row_number().over(w1))
        .where(F.col("_rn1") <= n)
    )
    w = Window.partitionBy("column_ref").orderBy(order)
    return (
        pre.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n)
        .select("column_ref", "value")
    )


def sample_columns_oracle_sql(melted_sql: str,
                              n: int = DEFAULT_SAMPLE_N) -> str:
    return f"""
SELECT column_ref, value FROM (
  SELECT DISTINCT column_ref, value FROM {melted_sql} m
  WHERE value IS NOT NULL
) QUALIFY row_number() OVER (PARTITION BY column_ref ORDER BY value) <= {n}
"""


def tablesample_values(spark, sf_dir: str, table: str, column: str,
                       fraction: float = 0.1, seed: int = 42) -> DataFrame:
    """Row-level sampling via the native sampler (pushed to the scan)."""
    return (
        spark.read.parquet(f"{sf_dir}/{table}.parquet")
        .sample(fraction=fraction, seed=seed)
        .select(F.col(column).cast("string").alias("value"))
        .where(F.col("value").isNotNull())
    )
