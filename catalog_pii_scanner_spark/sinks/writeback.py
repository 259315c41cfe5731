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


def desired_tags(findings: DataFrame) -> DataFrame:
    """findings (column_ref='cat://schema/table/column', types[]) ->
    per-column desired properties/comment."""
    parts = F.split(F.regexp_replace("column_ref", "^[a-z]+://", ""), "/")
    return findings.select(
        parts.getItem(0).alias("schema"),
        parts.getItem(1).alias("table"),
        parts.getItem(2).alias("column"),
        F.concat_ws(",", F.col("types")).alias("pii_types"),
    ).withColumn(
        "comment",
        F.substring(F.concat(F.lit(COMMENT_PREFIX), F.col("pii_types")),
                    1, MAX_COMMENT),
    )


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
