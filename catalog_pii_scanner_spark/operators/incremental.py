"""Cross-run incremental scan — the reference's promised ``--since``
rescan (reference README.md:200 "scan only what changed since the last
run"; the reference CLI declares the flag but v0 never wires it, so the
semantics here are the ones its findings store implies: a per-column
content fingerprint decides whether the stored finding is still valid).

Semantics (dual-dialect, deterministic):

- the PRIOR run's snapshot is the melted catalog minus the "arrived
  since" rows — a deterministic md5 gate marks ~1/8 of the values of
  ~1/4 of the columns as new (``NEW_ROW_GATE``), standing in for the
  data that landed between runs; in production the prior side is the
  findings store (sinks/findings_store.py MERGE keyed on column_ref)
  plus the stored per-column fingerprints, not a re-derivation;
- fingerprints are computed over the DISTINCT NON-NULL VALUE SET of
  each column — deliberately, not over raw rows: the scanner dedups
  values before extraction (reference P3, sampler.py:104-117), so a
  new row whose value the column already contained CANNOT change any
  finding and must not trigger a rescan. Each side collapses to
  ``(n, h)``: distinct-value count + ``bit_xor`` of a 48-bit
  md5-derived value hash (the KMV hash domain, sketches.py:527) —
  order-free, overflow-free, mergeable, one metadata-scale row per
  column;
- the fingerprint diff classifies every column: ``new`` (no prior
  value), ``rescanned`` (count or xor moved), ``carried`` (identical)
  — and ONLY the non-carried columns' values flow into the regex
  scan; carried columns forward the prior run's findings untouched;
- output = findings_rollup columns + ``scan_action``.

Scale shape (the 100 TB story): ONE distinct shuffle (the same one
the plain scan pays), a metadata-scale conditional-aggregate
fingerprint pass over it, the action relation broadcast, and the
expensive stage — regex extraction + checksum validation — runs only
over the changed columns' values: a 24h delta on a 100 TB catalog
typically touches a few percent of columns, so the rescan cost tracks
the delta, not the catalog. Per-column totals for hit_rate fall out
of the fingerprints (no second counting pass). The carried branch is
a findings-store read in production; it is derived from the prior
snapshot here so the DuckDB oracle can replay the whole contract from
the same parquet inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import oracles
from ..oracles import ratio_round_halfup_guarded
from ..plans.cache import checkpoint_release
from .rules import candidate_score, extract_candidates
from .sketches import _kmv_h_expr

#: Deterministic "arrived since the last run" value gate, one SQL text
#: for both engines (md5/substr/||/COALESCE are dialect-shared): ~1/4
#: of columns receive new values, and inside them ~1/8 of the distinct
#: values are new. The QUERY never relies on this shape — change
#: detection is the fingerprint diff — the gate only synthesizes the
#: two snapshots from one parquet input. The gate is a pure function
#: of (column_ref, value), so "prior snapshot" is well-defined on the
#: distinct-value basis the fingerprints use.
NEW_ROW_GATE = ("(substr(md5(column_ref), 1, 1) IN ('0', '1', '2', '3') "
                "AND substr(md5(column_ref || ':' || COALESCE(value, '')), "
                "1, 1) IN ('0', '1'))")


def _fp_rows_exprs() -> tuple[str, str]:
    """(h16 SQL, h48-over-h16 SQL) for the DUCKDB side: the md5 digest
    is named once in a CTE and the 48-bit integer is digit arithmetic
    over it — the KMV discipline."""
    return "md5(COALESCE(value, ''))", _kmv_h_expr("h16")


#: The SAME 48-bit value (first 12 md5 hex digits) as ONE Spark
#: expression. The digit-arithmetic form is correct on Spark too but
#: catastrophically slow on an unmaterialized input: Catalyst's
#: projection collapse re-inlines the named h16 into each of the 12
#: digit terms, re-evaluating md5 — and the whole melt expression
#: chain under it — 12x per row (measured 20.7 s -> 5.0 s for the
#: sf0.1 fingerprint job). ``conv`` has no DuckDB equivalent, so this
#: is a genuine dialect split; value equality with the digit form is
#: pinned in tests/test_r11_ops.py.
_SPARK_H48 = ("cast(conv(substr(md5(coalesce(value, '')), 1, 12), "
              "16, 10) as bigint)")


def incremental_findings(values_df: DataFrame) -> DataFrame:
    """Spark path over a melted (column_ref, value[, vclass]) relation.

    Plan: ONE distinct shuffle (persisted — it feeds the fingerprint
    pass and the pruned scan, the findings_rollup discipline), one
    conditional-aggregate fingerprint pass producing the checkpointed
    metadata-scale action relation WITH the per-column totals, then
    extraction over the broadcast-pruned value set only.
    """
    vcols = ["column_ref", "value"] + (
        ["vclass"] if "vclass" in values_df.columns else [])
    class_col = "vclass" if "vclass" in values_df.columns else None
    # Eager localCheckpoint, NOT persist (round-11 verdict item: cold
    # 46 s vs 10 s warm on the driver map, the suite-worst spread):
    # with persist, every downstream consumer (fingerprints, the
    # pruned-scan join, the final rollup join) re-ANALYZES the full
    # 9-table melt+distinct expression tree — the giant-tree
    # analysis/codegen cost this module's conv() note already measures
    # — because InMemoryTableScan keeps the whole lineage in the plan.
    # The checkpoint truncates lineage so each consumer plans against
    # the materialized relation (the _ner_merge discipline,
    # __spark_entry__._ner_merge). Blocks free on driver GC when the
    # caller drops the result (plans/cache.py).
    vals = (values_df.select(*vcols)
            .where(F.col("value").isNotNull()).distinct()
            .withColumn("is_new", F.expr(NEW_ROW_GATE))
            .localCheckpoint(eager=True))
    # both snapshots' fingerprints in ONE conditional aggregation pass
    # (the oracle states them as two CTEs over the same rows — same
    # values); the prior side is the NOT-is_new filter folded into the
    # aggregates. A column with zero prior values has o_n = 0 <=> the
    # oracle's "no old_fp row" case. n / o_n double as the hit_rate
    # denominators (n_values per column per snapshot) — no second
    # counting pass.
    fps = (vals.select("column_ref", "is_new",
                       F.expr(_SPARK_H48).alias("h"))
           .groupBy("column_ref")
           .agg(F.count("*").alias("n"),
                F.expr("bit_xor(h)").alias("h"),
                F.count(F.when(~F.col("is_new"), 1)).alias("o_n"),
                F.expr("bit_xor(CASE WHEN NOT is_new THEN h END)")
                .alias("o_h")))
    # ONE ROW PER COLUMN — checkpoint eagerly so the filter and the
    # two broadcast joins below do not each replay the fingerprint
    # pass.
    acts = (fps.select(
        "column_ref",
        F.when(F.col("o_n") == 0, F.lit("new"))
        .when((F.col("n") != F.col("o_n"))
              | (F.col("h") != F.col("o_h")), F.lit("rescanned"))
        .otherwise(F.lit("carried")).alias("scan_action"),
        F.when(F.col("o_n") == 0, F.col("n"))
        .when((F.col("n") != F.col("o_n"))
              | (F.col("h") != F.col("o_h")), F.col("n"))
        .otherwise(F.col("o_n")).alias("n_values"))
        .localCheckpoint(eager=True))
    # rescan/new columns scan ALL current values, carried columns keep
    # only the prior-snapshot values (identical by fingerprint, and a
    # findings-store read in production — derived here for the oracle)
    keep = (vals.join(F.broadcast(acts), "column_ref")
            .where((F.col("scan_action") != "carried")
                   | (~F.col("is_new"))))
    cands = extract_candidates(
        keep.select(*vcols), class_col=class_col) \
        .withColumn("prob", candidate_score())
    per_type = cands.groupBy("column_ref", "pii_type").agg(
        F.count("*").alias("n_candidates"),
        F.countDistinct("value").alias("n_values_hit"),
        F.round(F.max("prob"), 6).alias("confidence"))
    out = (per_type.join(F.broadcast(acts), "column_ref")
           .select("column_ref", "pii_type", "n_candidates",
                   "n_values_hit", "confidence",
                   F.expr(ratio_round_halfup_guarded(
                       "spark", "n_values_hit", "n_values"))
                   .alias("hit_rate"),
                   "scan_action"))
    # nothing persisted to release — vals is checkpointed (GC-freed);
    # the eager materialization keeps the contract: callers get a
    # small, lineage-free result
    return checkpoint_release(out)


def incremental_findings_oracle_sql(tables: tuple[str, ...]) -> str:
    """DuckDB oracle: same distinct basis, same gate, same
    fingerprints, same prune; extraction via the shared
    scored-candidates chain over the pruned value set."""
    melted = oracles.tables_melted_sql(tables)
    h16_sql, h48_sql = _fp_rows_exprs()
    keep_src = ("(SELECT column_ref, value, vclass FROM fv JOIN acts "
                "USING (column_ref) WHERE scan_action <> 'carried' "
                "OR NOT is_new)")
    scan_cte = oracles.scored_candidates_cte(keep_src,
                                             class_col="vclass")
    return f"""
WITH dvals AS (
  SELECT DISTINCT column_ref, value, vclass FROM {melted} m
  WHERE value IS NOT NULL
),
fv AS (
  SELECT column_ref, value, vclass, {NEW_ROW_GATE} AS is_new FROM dvals
),
fph AS (
  SELECT column_ref, is_new, {h16_sql} AS h16 FROM fv
),
fp_rows AS (
  SELECT column_ref, is_new, {h48_sql} AS h FROM fph
),
cur_fp AS (
  SELECT column_ref, COUNT(*) AS n, bit_xor(h) AS h
  FROM fp_rows GROUP BY column_ref
),
old_fp AS (
  SELECT column_ref, COUNT(*) AS n, bit_xor(h) AS h
  FROM fp_rows WHERE NOT is_new GROUP BY column_ref
),
acts AS (
  SELECT c.column_ref,
         CASE WHEN o.column_ref IS NULL THEN 'new'
              WHEN c.n <> o.n OR c.h <> o.h THEN 'rescanned'
              ELSE 'carried' END AS scan_action,
         CASE WHEN o.column_ref IS NULL THEN c.n
              WHEN c.n <> o.n OR c.h <> o.h THEN c.n
              ELSE o.n END AS n_values
  FROM cur_fp c LEFT JOIN old_fp o ON o.column_ref = c.column_ref
),
{scan_cte.lstrip()}
SELECT s.column_ref AS column_ref, s.pii_type AS pii_type,
       COUNT(*) AS n_candidates,
       COUNT(DISTINCT s.value) AS n_values_hit,
       round(MAX(s.prob), 6) AS confidence,
       {ratio_round_halfup_guarded("duckdb", "COUNT(DISTINCT s.value)",
                                   "a.n_values")} AS hit_rate,
       a.scan_action
FROM scored s JOIN acts a ON a.column_ref = s.column_ref
GROUP BY s.column_ref, s.pii_type, a.n_values, a.scan_action
"""


def column_fingerprints(values_df: DataFrame) -> DataFrame:
    """Per-column content fingerprint of a melted relation on the
    distinct non-null value basis: (column_ref, n_values, fp_hash).
    The store-facing half of the incremental contract — the CLI's
    ``--incremental`` mode persists these in the findings store
    sidecar (sinks/findings_store.py) and diffs them on the next run
    to decide which columns rescan."""
    return (values_df.select("column_ref", "value")
            .where(F.col("value").isNotNull()).distinct()
            .select("column_ref", F.expr(_SPARK_H48).alias("h"))
            .groupBy("column_ref")
            .agg(F.count("*").alias("n_values"),
                 F.expr("bit_xor(h)").alias("fp_hash")))
