"""Column profiling over the melt boundary — the survey pass a catalog
scanner runs before (or alongside) detection: per-column row/null/distinct
counts, lexicographic min/max, and mean value length. The reference has
no profiling surface; a complete catalog engine needs one (profiles
decide which columns are worth sampling and how hard).

Scale shape: one aggregation keyed on column_ref. COUNT(DISTINCT value)
plans as Spark's two-phase distinct aggregate (partial on
(column_ref, value), final on column_ref) — the exact, oracle-checkable
path. At 100 TB swap ``exact=False`` to approx_count_distinct (HLL
sketch, single pass, bounded state); the plan shape is otherwise
identical, which is why both live in one function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns", "profile_columns_oracle_sql"]


def profile_columns(values_df: DataFrame, exact: bool = True,
                    distinct_basis: DataFrame | None = None) -> DataFrame:
    """(column_ref, value) -> one profile row per column.

    Output: column_ref, n_rows, n_nulls, n_distinct, min_value,
    max_value, avg_len (mean length of non-null values, 1e-6).

    ``distinct_basis`` lets a caller hand over an already-materialized
    DISTINCT non-null (column_ref, value, ...) relation (the entry-level
    shared catalog basis). COUNT(DISTINCT value) alongside plain
    aggregates plans as an Expand that doubles the melt before the
    exchange — the whole melt shuffles twice over. With the basis, the
    row stats become a purely partial-aggregatable pass (the exchange
    carries per-partition partials, not rows) and n_distinct is a
    per-column COUNT over the basis — identical by definition:
    countDistinct ignores NULLs and the basis is the distinct non-null
    value set (its extra class column is functionally dependent on
    column_ref, so it never splits a value group)."""
    v = F.col("value")
    if distinct_basis is None:
        n_distinct = (F.countDistinct(v) if exact
                      else F.approx_count_distinct(v))
        return values_df.groupBy("column_ref").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(v.isNull().cast("bigint")).alias("n_nulls"),
            n_distinct.alias("n_distinct"),
            F.min(v).alias("min_value"),
            F.max(v).alias("max_value"),
            F.round(F.avg(F.length(v)), 6).alias("avg_len"),
        )
    stats = values_df.groupBy("column_ref").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(v.isNull().cast("bigint")).alias("n_nulls"),
        F.min(v).alias("min_value"),
        F.max(v).alias("max_value"),
        F.round(F.avg(F.length(v)), 6).alias("avg_len"),
    )
    nd = (distinct_basis.groupBy("column_ref")
          .agg(F.count(F.lit(1)).alias("_nd")))
    return (stats.join(nd, "column_ref", "left")
            .select("column_ref", "n_rows", "n_nulls",
                    F.coalesce("_nd", F.lit(0)).alias("n_distinct"),
                    "min_value", "max_value", "avg_len"))


def profile_columns_oracle_sql(melted_rel: str) -> str:
    return f"""
SELECT column_ref, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nulls,
       COUNT(DISTINCT value) AS n_distinct,
       MIN(value) AS min_value, MAX(value) AS max_value,
       round(AVG(length(value)), 6) AS avg_len
FROM {melted_rel} m
GROUP BY column_ref
"""
