"""Idempotent tag write-back to catalogs (reference K2/K3/K4,
src/catalog_pii_scanner/glue.py:184-353, unity.py:246-345, hms.py:110-162).

Write-back mutates external catalog APIs, so it stays DRIVER-SIDE and
idempotent (reference invariant: a second apply run changes nothing and
never duplicates comments — tests/test_hms_fake.py:120-140). The Spark
part is the diff: desired state (findings) anti-joined against current
state (catalog properties) so only real changes issue API calls.

``FakeCatalogClient`` is the in-memory protocol double (the reference
tests' approach) used by our tests; a real Glue/Unity/HMS client plugs in
behind the same 3-method surface. For very large catalogs the per-table
call loop batches via ``toLocalIterator`` to avoid collecting everything.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PII_FLAG_KEY = "cps.pii"
PII_TYPES_KEY = "cps.pii.types"
COMMENT_PREFIX = "PII:"
MAX_COMMENT = 255


@dataclass
class FakeCatalogClient:
    """In-memory catalog: {(schema, table, column): {props}, comment}."""
    properties: dict[tuple[str, str, str], dict[str, str]] = \
        field(default_factory=dict)
    comments: dict[tuple[str, str, str], str] = field(default_factory=dict)
    api_calls: int = 0

    def get_column(self, schema: str, table: str, column: str):
        return (dict(self.properties.get((schema, table, column), {})),
                self.comments.get((schema, table, column)))

    def update_column(self, schema: str, table: str, column: str,
                      props: dict[str, str], comment: str | None) -> None:
        self.api_calls += 1
        key = (schema, table, column)
        self.properties.setdefault(key, {}).update(props)
        if comment is not None:
            self.comments[key] = comment


def ref_parts(ref_col: str = "column_ref") -> tuple[F.Column, F.Column,
                                                    F.Column]:
    """(schema, table, column) Columns from a ``column_ref`` URI — THE
    shared decomposition for every write-back consumer (this sink's
    apply loops AND operators/incremental.writeback_diff_plan).

    Refs carry either 3 path segments (catalog enumerations:
    ``cat://schema/table/column``) or 2 (the engine's melt boundary:
    ``spark://table/column`` — sources/catalog.column_ref with the
    default schema elided). Pre-r13 this sink assumed 3 segments, so a
    2-segment ref parsed as schema=<table>, table=<column>,
    column=NULL — the apply loop would tag the wrong object (r12
    ADVICE, the latent-bug half). 2-segment refs now parse with a NULL
    schema and the segments land in table/column where they belong."""
    parts = F.split(F.regexp_replace(ref_col, "^[a-z]+://", ""), "/")
    three = F.size(parts) >= 3
    return (
        F.when(three, parts.getItem(0)).alias("schema"),
        F.when(three, parts.getItem(1)).otherwise(parts.getItem(0))
        .alias("table"),
        F.when(three, parts.getItem(2)).otherwise(parts.getItem(1))
        .alias("column"),
    )


def desired_tags(findings: DataFrame) -> DataFrame:
    """findings (column_ref='cat://schema/table/column' or the melt's
    2-segment 'spark://table/column', types[]) -> per-column desired
    properties/comment."""
    schema, table, column = ref_parts()
    return findings.select(
        schema, table, column,
        F.concat_ws(",", F.col("types")).alias("pii_types"),
    ).withColumn(
        "comment",
        F.substring(F.concat(F.lit(COMMENT_PREFIX), F.col("pii_types")),
                    1, MAX_COMMENT),
    )


def update_column_tags_sql(spark: SparkSession, table: str, column: str,
                           pii: bool, pii_types: list[str] | None = None,
                           append_comment: str | None = None) -> bool:
    """K3/K4 REAL path: idempotent tag write-back via actual
    ``ALTER TABLE … SET TBLPROPERTIES`` / ``ALTER COLUMN … COMMENT``
    statements against the Spark session catalog (reference
    unity.py:263-311 SQL tag-back, hms.py:110-162 alter_table). The
    reference's per-column table-property vocabulary is kept:
    ``cps.pii.col.<column>`` and ``cps.pii_types.col.<column>``.
    Diff-before-write: re-running with unchanged desired state issues NO
    ALTER statements. Returns whether any statement was issued."""
    props = {r.key: r.value
             for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()}
    want = {f"cps.pii.col.{column}": str(bool(pii)).lower()}
    if pii_types is not None:
        want[f"cps.pii_types.col.{column}"] = ",".join(
            sorted(t.strip() for t in pii_types if t.strip()))
    delta = {k: v for k, v in want.items() if props.get(k) != v}
    changed = False
    if delta:
        kv = ", ".join(f"'{k}'='{v}'" for k, v in sorted(delta.items()))
        spark.sql(f"ALTER TABLE {table} SET TBLPROPERTIES ({kv})")
        changed = True
    if append_comment:
        current = next(
            (c.description for c in spark.catalog.listColumns(table)
             if c.name == column), None) or ""
        if append_comment not in current:
            new = (current + (" " if current else "")
                   + append_comment)[:MAX_COMMENT]
            escaped = new.replace("'", "''")
            spark.sql(f"ALTER TABLE {table} ALTER COLUMN {column} "
                      f"COMMENT '{escaped}'")
            changed = True
    return changed


def apply_writeback_sql(spark: SparkSession,
                        findings: DataFrame) -> dict[str, int]:
    """Diff-before-write apply loop over the session catalog: findings
    refs ``cat://schema/table/column`` land as ALTER statements on
    ``schema.table``. Idempotent like :func:`apply_writeback`."""
    applied = skipped = 0
    for row in desired_tags(findings).toLocalIterator():
        # 2-segment melt refs parse with a NULL schema: the table is
        # addressed bare (session current database), never "None.<t>"
        table_ident = (f"{row['schema']}.{row['table']}"
                       if row["schema"] is not None else row["table"])
        changed = update_column_tags_sql(
            spark, table_ident, row["column"],
            pii=True, pii_types=row["pii_types"].split(","),
            append_comment=row["comment"])
        applied += int(changed)
        skipped += int(not changed)
    return {"applied": applied, "skipped": skipped}


def apply_writeback(findings: DataFrame,
                    client: FakeCatalogClient) -> dict[str, int]:
    """Diff-before-write apply loop. Returns counters; re-running with an
    unchanged store is a no-op (0 API calls)."""
    applied = skipped = 0
    for row in desired_tags(findings).toLocalIterator():
        props_now, comment_now = client.get_column(
            row["schema"], row["table"], row["column"])
        want_props = {PII_FLAG_KEY: "true", PII_TYPES_KEY: row["pii_types"]}
        unchanged = (
            all(props_now.get(k) == v for k, v in want_props.items())
            and comment_now == row["comment"])
        if unchanged:
            skipped += 1
            continue
        client.update_column(row["schema"], row["table"], row["column"],
                             want_props, row["comment"])
        applied += 1
    return {"applied": applied, "skipped": skipped}
