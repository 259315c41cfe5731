"""Predicate-pushdown barrier for expensive-to-recompute filter inputs.

Catalyst's ``PushDownPredicate`` splits a filter into conjuncts and pushes
every *deterministic* conjunct through projections and aggregates,
substituting projected aliases with their defining expression trees. For a
filter over a column whose defining expression is expensive (a Python-UDF
output, an 11-type fusion tree with md5 signals), that substitution
evaluates the tree a second time below the projection — and when the
expression contains a Python UDF, physical planning materializes a second
``ArrowEvalPython`` stage for the filter alone (measured: the ensemble
gate pushed below the candidate ``distinct`` tripled the query, and the
checksum gate duplicated the Luhn/Verhoeff Arrow stage on every scan).

Three non-solutions, observed failing on Spark 4.1:

- an *unused* nondeterministic projected column — column pruning deletes
  it, then the (all-deterministic) projection is transparent again;
- ``OR rand() < -1`` in the condition — the optimizer knows rand's [0,1)
  bounds and folds the comparison away;
- a nondeterministic *condition* alone — ``PushDownPredicate``'s Project
  case checks the determinism of the projection's fields, not of the
  condition (reordering a filter with a deterministic projection is
  semantics-preserving), so the condition is still substituted through
  every Project, duplicating the expensive tree into the Filter.

The working barrier does both halves: project an always-false
``spark_partition_id() < 0`` column (nondeterministic, so the Project
stops filter pushdown; opaque to constant folding) and OR that *column*
into the condition (so pruning must keep it and the conjunct is never
split). The filter then evaluates exactly where declared, reading the
guarded columns as plain attributes; the extra term costs one int
comparison per filtered row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["barrier_filter"]

_BARRIER_COL = "_pushdown_barrier"


def barrier_filter(df: DataFrame, cond: Column) -> DataFrame:
    """``df.where(cond)`` that Catalyst cannot push below ``df``'s plan."""
    marked = df.withColumn(_BARRIER_COL, F.spark_partition_id() < F.lit(0))
    return marked.where(cond | F.col(_BARRIER_COL)).drop(_BARRIER_COL)
