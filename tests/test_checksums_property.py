"""Property-based cross-dialect equivalence: on arbitrary digit strings,
the DuckDB SQL renderings of Luhn/Verhoeff agree exactly with the Python
implementations (the Spark renderings share the generator, and the
operator path uses the Python ones via pandas UDF)."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from catalog_pii_scanner_spark.functions.checksums import (
    luhn_ok, luhn_sql, verhoeff_ok, verhoeff12_sql)

_con = duckdb.connect()


def _duck(expr: str) -> bool:
    return bool(_con.execute("SELECT " + expr).fetchone()[0])


# 12-18 digits so the appended check digit lands in the validator's
# 13-19 card-length gate.
digits = st.text(alphabet="0123456789", min_size=12, max_size=18)
sep_digits = st.text(alphabet="0123456789 -", min_size=2, max_size=24)


@settings(max_examples=150, deadline=None)
@given(sep_digits)
def test_luhn_sql_matches_python(value):
    assert _duck(luhn_sql(f"'{value}'", "duckdb")) == luhn_ok(value)


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet="0123456789", min_size=12, max_size=12))
def test_verhoeff12_sql_matches_python(value):
    # the SQL form is specified for exactly-12-digit inputs (Aadhaar)
    assert _duck(verhoeff12_sql(f"'{value}'", "duckdb")) == \
        verhoeff_ok(value)


@settings(max_examples=100, deadline=None)
@given(digits)
def test_luhn_check_digit_construction(value):
    """Appending the correct Luhn check digit always validates."""
    total = 0
    for i, ch in enumerate(reversed(value)):
        d = int(ch)
        if i % 2 == 0:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    check = (10 - total % 10) % 10
    assert luhn_ok(value + str(check))
