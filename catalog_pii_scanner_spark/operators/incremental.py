"""Cross-run incremental scan — the reference's promised ``--since``
rescan (reference README.md:200 "scan only what changed since the last
run"; the reference CLI declares the flag but v0 never wires it, so the
semantics here are the ones its findings store implies: a per-column
content fingerprint decides whether the stored finding is still valid).

Semantics (dual-dialect, deterministic):

- the PRIOR run's snapshot is the melted catalog minus the "arrived
  since" rows — a deterministic md5 gate marks ~1/8 of the rows of
  ~1/4 of the columns as new (``NEW_ROW_GATE``), standing in for the
  data that landed between runs; in production the prior side is the
  findings store (sinks/findings_store.py MERGE keyed on column_ref)
  plus the stored per-column fingerprints, not a re-derivation;
- each side collapses to a per-column FINGERPRINT ``(n, h)``:
  row count + ``bit_xor`` of a 48-bit md5-derived row hash (the KMV
  hash domain, sketches.py:527) — order-free, overflow-free,
  mergeable, one metadata-scale row per column;
- the fingerprint diff classifies every column:
  ``new`` (no prior row), ``rescanned`` (count or xor moved),
  ``carried`` (identical) — and ONLY the non-carried columns flow
  into the regex scan; carried columns forward the prior run's
  findings untouched;
- output = findings_rollup columns + ``scan_action``.

Scale shape (the 100 TB story): the fingerprint pass is one
map-side-combinable aggregation per snapshot (the same (column_ref)
clustering the scan itself needs), the action relation is one row per
COLUMN (metadata-scale, broadcast), and the expensive stage — distinct
+ regex extraction + checksum validation — runs only over the changed
columns' values: a 24h delta on a 100 TB catalog typically touches a
few percent of columns, so the rescan cost tracks the delta, not the
catalog. The carried branch is a findings-store read in production;
it is derived from the prior snapshot here so the DuckDB oracle can
replay the whole contract from the same parquet inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import oracles
from ..oracles import ratio_round_halfup_guarded
from .findings import findings_rollup
from .sketches import _kmv_h_expr

#: Deterministic "arrived since the last run" row gate, one SQL text
#: for both engines (md5/substr/||/COALESCE are dialect-shared): ~1/4
#: of columns receive new data, and inside them ~1/8 of the rows are
#: new. The QUERY never relies on this shape — change detection is the
#: fingerprint diff — the gate only synthesizes the two snapshots from
#: one parquet input.
NEW_ROW_GATE = ("(substr(md5(column_ref), 1, 1) IN ('0', '1', '2', '3') "
                "AND substr(md5(column_ref || ':' || COALESCE(value, '')), "
                "1, 1) IN ('0', '1'))")


def _fp_rows_exprs() -> tuple[str, str]:
    """(h16 SQL, h48-over-h16 SQL): the md5 digest is materialized once
    per row and the 48-bit integer is digit arithmetic over it — the
    KMV discipline, shared text in both dialects."""
    return "md5(COALESCE(value, ''))", _kmv_h_expr("h16")


def incremental_findings(values_df: DataFrame) -> DataFrame:
    """Spark path over a melted (column_ref, value[, vclass]) relation.

    Plan: one projection flags rows, ONE conditional-aggregate
    fingerprint pass (both snapshots), the metadata-scale action
    relation checkpointed and broadcast, then ONE findings_rollup over
    the per-column row selection (see the branch-fusion note below).
    """
    h16_sql, h48_sql = _fp_rows_exprs()
    flagged = values_df.withColumn("is_new", F.expr(NEW_ROW_GATE))
    fp_rows = (flagged
               .select("column_ref", "is_new",
                       F.expr(h16_sql).alias("h16"))
               .select("column_ref", "is_new",
                       F.expr(h48_sql).alias("h")))
    # BOTH snapshots' fingerprints in ONE conditional aggregation pass
    # (the oracle states them as two CTEs over the same rows — same
    # values, but Spark would execute two full melt+md5 scans); the
    # prior side is the NOT-is_new filter folded into the aggregates.
    # A column with zero prior rows has o_n = 0 <=> the oracle's
    # "no old_fp row" case.
    fps = fp_rows.groupBy("column_ref").agg(
        F.count("*").alias("n"),
        F.expr("bit_xor(h)").alias("h"),
        F.count(F.when(~F.col("is_new"), 1)).alias("o_n"),
        F.expr("bit_xor(CASE WHEN NOT is_new THEN h END)").alias("o_h"))
    # the action relation is ONE ROW PER COLUMN — materialize it
    # eagerly so its four consumers (two prunes, two broadcasts) do
    # not each replay the fingerprint scan.
    acts = (fps.select("column_ref",
                       F.when(F.col("o_n") == 0, F.lit("new"))
                       .when((F.col("n") != F.col("o_n"))
                             | (F.col("h") != F.col("o_h")),
                             F.lit("rescanned"))
                       .otherwise(F.lit("carried")).alias("scan_action"))
            .localCheckpoint(eager=True))
    # The fresh and carried branches are DISJOINT in column_ref, so
    # one findings_rollup over the per-column row selection is
    # row-identical to running the two branches separately (the oracle
    # keeps the two prefixed branches because its CTE form states the
    # contract more plainly; equality is what the driver gate checks):
    # rescan/new columns keep ALL current rows, carried columns keep
    # only the prior-snapshot rows. ONE broadcast filter join, ONE
    # distinct shuffle, ONE regex extraction pipeline — the double
    # plan/codegen cost of two scan branches measured 2x on the
    # micro sweep.
    keep = (flagged.join(F.broadcast(acts), "column_ref")
            .where((F.col("scan_action") != "carried")
                   | (~F.col("is_new"))))
    found = findings_rollup(keep.drop("is_new", "scan_action"))
    cols = ("column_ref", "pii_type", "n_candidates", "n_values_hit",
            "confidence", "hit_rate", "scan_action")
    return found.join(F.broadcast(acts), "column_ref").select(*cols)


def _findings_select(prefix: str) -> str:
    """The findings aggregation over a prefixed scored/totals pair —
    textually the scan_findings_oracle tail (oracles.py:140-147) with
    namespaced relations."""
    p = prefix
    return f"""SELECT s.column_ref AS column_ref, s.pii_type AS pii_type,
       COUNT(*) AS n_candidates,
       COUNT(DISTINCT s.value) AS n_values_hit,
       round(MAX(s.prob), 6) AS confidence,
       {ratio_round_halfup_guarded("duckdb", "COUNT(DISTINCT s.value)",
                                   "t.n_values")} AS hit_rate
FROM {p}scored s JOIN {p}totals t ON s.column_ref = t.column_ref
GROUP BY s.column_ref, s.pii_type, t.n_values"""


def incremental_findings_oracle_sql(tables: tuple[str, ...]) -> str:
    """DuckDB oracle: same gate, same fingerprints, same branch prune,
    findings branches via the prefixed scored-candidates chain."""
    melted = oracles.tables_melted_sql(tables)
    h16_sql, h48_sql = _fp_rows_exprs()
    fresh_src = ("(SELECT column_ref, value, vclass FROM flagged WHERE "
                 "column_ref IN (SELECT column_ref FROM acts "
                 "WHERE scan_action <> 'carried'))")
    carry_src = ("(SELECT column_ref, value, vclass FROM flagged WHERE "
                 "NOT is_new AND column_ref IN (SELECT column_ref "
                 "FROM acts WHERE scan_action = 'carried'))")
    f_cte = oracles.scored_candidates_cte(fresh_src, class_col="vclass",
                                          prefix="f_")
    c_cte = oracles.scored_candidates_cte(carry_src, class_col="vclass",
                                          prefix="c_")
    return f"""
WITH flagged AS (
  SELECT m.column_ref, m.value, m.vclass, {NEW_ROW_GATE} AS is_new
  FROM {melted} m
),
fph AS (
  SELECT column_ref, is_new, {h16_sql} AS h16 FROM flagged
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
              ELSE 'carried' END AS scan_action
  FROM cur_fp c LEFT JOIN old_fp o ON o.column_ref = c.column_ref
),
{f_cte.lstrip()},
f_totals AS (
  SELECT column_ref, COUNT(*) AS n_values FROM f_vals GROUP BY column_ref
),
{c_cte.lstrip()},
c_totals AS (
  SELECT column_ref, COUNT(*) AS n_values FROM c_vals GROUP BY column_ref
),
found AS (
  {_findings_select('f_')}
  UNION ALL
  {_findings_select('c_')}
)
SELECT f.column_ref, f.pii_type, f.n_candidates, f.n_values_hit,
       f.confidence, f.hit_rate, a.scan_action
FROM found f JOIN acts a ON a.column_ref = f.column_ref
"""
