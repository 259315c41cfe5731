"""Column-level findings rollup (reference operator A6) and scan pipeline.

The reference stores one Finding per column: ``types[], confidence,
hit_rate`` (reference: src/catalog_pii_scanner/db.py:110-125; hit_rate is
declared but never derived in v0 — we define it as
``distinct values with >=1 candidate / distinct values scanned``).

Output here is denormalized to one row per (column_ref, pii_type) so the
result is flat-hashable; ``sinks/findings_store.py`` re-nests to the
reference's array shape for export.

Scale shape: melt (projection, no shuffle) -> distinct (1 shuffle on
(column_ref, value)) -> extract+score (projection) -> two aggregations that
reuse the same (column_ref[, value]) clustering. AQE coalesces the small
post-aggregation partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.cache import checkpoint_release

from .rules import RULES, Rule, candidate_score, extract_candidates


def scan_values(values_df: DataFrame,
                rules: tuple[Rule, ...] = RULES) -> DataFrame:
    """(column_ref, value) -> scored candidate rows.

    Applies distinct-value dedup (reference P3: samplers dedup values,
    sampler.py:104-117), candidate extraction, and rules-only ensemble
    scoring.
    """
    vals = values_df.where(F.col("value").isNotNull()).distinct()
    class_col = "vclass" if "vclass" in values_df.columns else None
    cands = extract_candidates(vals, rules=rules, class_col=class_col)
    return cands.withColumn("prob", candidate_score())


def findings_rollup(values_df: DataFrame,
                    rules: tuple[Rule, ...] = RULES) -> DataFrame:
    """Full scan: values -> per-(column, type) findings.

    Columns: ``column_ref, pii_type, n_candidates, n_values_hit,
    confidence, hit_rate``.
    """
    # vals feeds two consumers (totals + extraction); persist so the
    # melt + 6.6M-row distinct shuffle materializes once, not per branch
    # (Spark re-plans lineage per consumer otherwise). Released before
    # returning: the (tiny, per-column x type) result is materialized via
    # eager localCheckpoint, so a long-lived session never accumulates the
    # big cached vals relations across queries.
    vals = values_df.where(F.col("value").isNotNull()).distinct().persist()
    class_col = "vclass" if "vclass" in values_df.columns else None
    totals = vals.groupBy("column_ref").agg(
        F.count("*").alias("n_values"))
    cands = extract_candidates(vals, rules=rules, class_col=class_col) \
        .withColumn("prob", candidate_score())
    per_type = cands.groupBy("column_ref", "pii_type").agg(
        F.count("*").alias("n_candidates"),
        F.countDistinct("value").alias("n_values_hit"),
        F.round(F.max("prob"), 6).alias("confidence"),
    )
    out = (
        per_type.join(F.broadcast(totals), "column_ref")
        .select(
            "column_ref", "pii_type", "n_candidates", "n_values_hit",
            "confidence",
            F.round(F.col("n_values_hit") / F.col("n_values"), 6)
            .alias("hit_rate"),
        )
    )
    return checkpoint_release(out, vals)
