"""Cache/lineage discipline helpers.

Operators that persist a big intermediate (melted values, shingle sets,
exploded vectors) must not leak it into a long-lived session: Spark's
CacheManager never releases cached plans on its own, so a multi-query
session accumulates them until GC pressure (the failure mode a bigger
heap only postpones). The pattern here: materialize the (small) result
with an eager ``localCheckpoint`` — truncating lineage so downstream
jobs replan against the materialized relation instead of re-deriving the
persisted input — then ``unpersist`` every intermediate before
returning. Checkpoint blocks themselves are ContextCleaner-managed: they
free on driver GC once the caller drops the DataFrame reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def checkpoint_release(result: DataFrame, *intermediates: DataFrame
                       ) -> DataFrame:
    """Eagerly materialize ``result``, then unpersist ``intermediates``."""
    out = result.localCheckpoint(eager=True)
    for df in intermediates:
        df.unpersist()
    return out
