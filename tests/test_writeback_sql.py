"""Real ALTER TABLE write-back against the Spark session catalog
(reference unity.py:263-311 / hms.py:110-162 semantics): properties and
column comments land via actual SQL statements, idempotently — the
reference's re-run-no-duplicate invariant (tests/test_hms_fake.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from catalog_pii_scanner_spark.sinks.findings_store import \
    to_findings_records
from catalog_pii_scanner_spark.sinks.writeback import (
    apply_writeback_sql, update_column_tags_sql)


@pytest.fixture(scope="module")
def catalog_table(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("warehouse")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS cpss_wb LOCATION '{loc}'")
    spark.sql("CREATE TABLE cpss_wb.users (email_addr STRING, age INT) "
              "USING parquet")
    yield "cpss_wb.users"
    spark.sql("DROP DATABASE cpss_wb CASCADE")


def _props(spark, table):
    return {r.key: r.value
            for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()}


def _comment(spark, table, column):
    return next(c.description for c in spark.catalog.listColumns(table)
                if c.name == column)


def test_alter_table_tags_and_comment(spark, catalog_table):
    changed = update_column_tags_sql(
        spark, catalog_table, "email_addr", pii=True,
        pii_types=["EMAIL", "PHONE_NUMBER"], append_comment="PII:EMAIL")
    assert changed is True
    props = _props(spark, catalog_table)
    assert props["cps.pii.col.email_addr"] == "true"
    assert props["cps.pii_types.col.email_addr"] == "EMAIL,PHONE_NUMBER"
    assert _comment(spark, catalog_table, "email_addr") == "PII:EMAIL"

    # idempotency: identical desired state issues no statements
    assert update_column_tags_sql(
        spark, catalog_table, "email_addr", pii=True,
        pii_types=["EMAIL", "PHONE_NUMBER"],
        append_comment="PII:EMAIL") is False
    # comment not duplicated
    assert _comment(spark, catalog_table, "email_addr") == "PII:EMAIL"


def test_apply_writeback_sql_loop(spark, catalog_table):
    per_type = spark.createDataFrame(
        [("spark://cpss_wb/users/age", "SSN", 3, 3, 0.8, 0.4)],
        "column_ref string, pii_type string, n_candidates bigint, "
        "n_values_hit bigint, confidence double, hit_rate double")
    findings = to_findings_records(per_type)
    stats = apply_writeback_sql(spark, findings)
    assert stats == {"applied": 1, "skipped": 0}
    props = _props(spark, catalog_table)
    assert props["cps.pii.col.age"] == "true"
    assert props["cps.pii_types.col.age"] == "SSN"
    assert _comment(spark, catalog_table, "age") == "PII:SSN"
    # second run: all skipped
    assert apply_writeback_sql(spark, findings) == \
        {"applied": 0, "skipped": 1}
