"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship scan on sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2 ids in
the key names); each takes (spark, sf_dir) and returns a DataFrame.
``oracle_sql()`` — DuckDB-equivalent SQL per query key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from catalog_pii_scanner_spark import oracles
from catalog_pii_scanner_spark.operators.findings import findings_rollup
from catalog_pii_scanner_spark.sources.demo_catalog import (
    DEMO_TEXT_COLUMNS, demo_pii_df)
from catalog_pii_scanner_spark.sources.melt import melt_df, melt_table

SF0001 = "/root/testdata/sf0.001"

#: Real testdata tables included in the whole-catalog scan query.
SCAN_TABLES = ("region", "nation", "customer", "supplier", "part", "orders")


def _demo_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    return melt_df(demo_pii_df(spark, sf_dir), "demo_crm", DEMO_TEXT_COLUMNS)


def _tables_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce
    dfs = [melt_table(spark, sf_dir, t) for t in SCAN_TABLES]
    return reduce(DataFrame.unionByName, dfs)


# --- driver contract ---------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full PII scan of the demo CRM relation at sf0.001."""
    return findings_rollup(_demo_values(spark, SF0001))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # X1-X10 + F1-F4 + A6: full scan of the synthesized CRM relation
        "pii_scan_demo_crm": lambda spark, sf:
            findings_rollup(_demo_values(spark, sf)),
        # S5 melt boundary + scan over the real catalog tables
        "pii_scan_catalog_tables": lambda spark, sf:
            findings_rollup(_tables_values(spark, sf)),
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pii_scan_demo_crm":
            oracles.scan_findings_oracle(oracles.demo_melted_sql()),
        "pii_scan_catalog_tables":
            oracles.scan_findings_oracle(
                oracles.tables_melted_sql(SCAN_TABLES)),
    }
