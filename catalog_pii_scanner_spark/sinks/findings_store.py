"""Findings store + export sinks (reference K1/K5,
src/catalog_pii_scanner/db.py:110-241, cli.py:403-482).

The reference persists a normalized Catalog->Schema->Table->Column
hierarchy in SQLAlchemy with Findings as a child table, denormalizing
``column_ref`` onto Finding for export. Spark-first: the store IS the
denormalized DataFrame, persisted as parquet partitioned by scan date —
append-only with upsert semantics by (column_ref, model_version) natural
key (K1's get-or-create collapses to a window dedup on read, or a Delta
MERGE where Delta is available).

Export (K5): JSON lines and CSV with the reference's export shape —
``types`` list flattened to a comma-joined string for CSV
(cli.py:458-467).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

MODEL_VERSION = "cpss-spark-0.1"

FINDINGS_STORE_SCHEMA = (
    "column_ref string, types array<string>, confidence double, "
    "hit_rate double, model_version string, scanned_at timestamp, "
    "source string")


def to_findings_records(per_type: DataFrame,
                        source: str = "scan",
                        model_version: str = MODEL_VERSION) -> DataFrame:
    """Re-nest the per-(column, type) rollup into the reference's Finding
    shape: one row per column with ``types ARRAY<STRING>`` (sorted),
    column-level confidence = max over types."""
    return (
        per_type.groupBy("column_ref")
        .agg(
            F.array_sort(F.collect_set("pii_type")).alias("types"),
            F.max("confidence").alias("confidence"),
            F.max("hit_rate").alias("hit_rate"),
        )
        .withColumn("model_version", F.lit(model_version))
        .withColumn("scanned_at", F.current_timestamp())
        .withColumn("source", F.lit(source))
    )


def write_findings(findings: DataFrame, store_path: str) -> None:
    """Append to the parquet store, partitioned by scan date (prunable)."""
    (findings
     .withColumn("scan_date", F.to_date("scanned_at"))
     .write.mode("append").partitionBy("scan_date").parquet(store_path))


def read_latest_findings(spark: SparkSession, store_path: str) -> DataFrame:
    """Upsert-on-read: latest record per (column_ref, model_version)."""
    w = Window.partitionBy("column_ref", "model_version") \
        .orderBy(F.col("scanned_at").desc())
    return (
        spark.read.parquet(store_path)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1).drop("rn", "scan_date")
    )


def export_json(findings: DataFrame, path: str) -> None:
    findings.write.mode("overwrite").json(path)


def export_csv(findings: DataFrame, path: str) -> None:
    (findings
     .withColumn("types", F.concat_ws(",", "types"))
     .withColumn("scanned_at", F.date_format(
         "scanned_at", "yyyy-MM-dd'T'HH:mm:ssXXX"))
     .write.mode("overwrite").option("header", True).csv(path))
