"""Checksum validators: python truth + both SQL dialect renderings agree.

Mirrors the reference's validator tests (reference:
tests/test_rules.py Luhn, tests/test_rules_advanced.py Aadhaar/Verhoeff).
"""

import duckdb
import pytest

from catalog_pii_scanner_spark.functions.checksums import (
    luhn_ok, luhn_sql, verhoeff_ok, verhoeff12_sql)

LUHN_CASES = [
    ("4111 1111 1111 1111", True),
    ("4111 1111 1111 1112", False),
    ("5500 0000 0000 0004", True),
    ("4012 8888 8888 1881", True),
    ("1234 5678 9012 3456", False),
    ("0000 0000 0000 0000", True),
]

VERHOEFF_CASES = [
    ("2345 6789 0124", True),
    ("3456 7890 1238", True),
    ("9876 5432 1096", True),
    ("1234 5678 9012", False),
    ("2345 6789 0125", False),
]


@pytest.mark.parametrize("value,expected", LUHN_CASES)
def test_luhn_python(value, expected):
    assert luhn_ok(value) is expected


@pytest.mark.parametrize("value,expected", VERHOEFF_CASES)
def test_verhoeff_python(value, expected):
    assert verhoeff_ok(value) is expected


def test_luhn_sql_duckdb_matches_python():
    con = duckdb.connect()
    for v, exp in LUHN_CASES:
        got = con.execute("SELECT " + luhn_sql(f"'{v}'", "duckdb")).fetchone()[0]
        assert got == exp, v


def test_verhoeff_sql_duckdb_matches_python():
    con = duckdb.connect()
    for v, exp in VERHOEFF_CASES:
        got = con.execute(
            "SELECT " + verhoeff12_sql(f"'{v}'", "duckdb")).fetchone()[0]
        assert got == exp, v


def test_checksum_sql_spark_matches_python(spark):
    for v, exp in LUHN_CASES:
        got = spark.sql("SELECT " + luhn_sql(f"'{v}'", "spark")).collect()[0][0]
        assert got == exp, v
    for v, exp in VERHOEFF_CASES:
        got = spark.sql(
            "SELECT " + verhoeff12_sql(f"'{v}'", "spark")).collect()[0][0]
        assert got == exp, v
