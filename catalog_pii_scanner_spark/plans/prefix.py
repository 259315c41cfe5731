"""Distributed exclusive prefix sum in a deterministic pseudo-random order.

A running total over one global ordering is the classic scale-killer: a
single-partition window. This helper computes the identical result as a
TWO-LEVEL sum: rows hash into md5-prefix buckets, each bucket cumsums
independently (per-bucket window, ~N/256 rows), the 256 bucket totals
cumsum on one tiny partition, and the bucket offsets broadcast back.
Because the bucket is a PREFIX of the global sort key (md5(id), id),
bucket-local order + bucket offsets reproduce the global order exactly.

Consumers: sequence packing (operators/corpus.py) and the LLM cost-cap
gate (operators/llm.py). The oracle rendering of both is the plain
single-window cumsum — this helper is its distributed evaluation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["running_total"]

#: 2 hex chars = 256 buckets.
BUCKET_CHARS = 2


def running_total(df: DataFrame, id_col: str, weight_col: str,
                  out_col: str = "run_total") -> DataFrame:
    """Add ``out_col`` = sum of ``weight_col`` over all rows strictly
    before this one in (md5(id), id) order (exclusive prefix sum)."""
    base = (
        df.withColumn("_h", F.md5(F.col(id_col).cast("string")))
        .withColumn("_bucket", F.substring("_h", 1, BUCKET_CHARS))
    )
    w_in = (Window.partitionBy("_bucket").orderBy("_h", id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    base = base.withColumn("_run", F.sum(weight_col).over(w_in))
    w_off = (Window.orderBy("_bucket")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (
        base.groupBy("_bucket").agg(F.sum(weight_col).alias("_btot"))
        .withColumn("_boff", F.coalesce(F.sum("_btot").over(w_off),
                                        F.lit(0).cast("bigint")))
        .select("_bucket", "_boff")
    )
    return (
        base.join(F.broadcast(offsets), "_bucket")
        .withColumn(out_col,
                    F.col("_boff") + F.col("_run") - F.col(weight_col))
        .drop("_h", "_bucket", "_run", "_boff")
    )
