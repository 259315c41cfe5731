"""Luhn and Verhoeff checksum validators, in three forms:

1. plain Python (used inside pandas UDFs and tests),
2. Spark SQL expression strings (JVM-side, whole-stage-codegen friendly —
   the hot path: no Python worker round-trip just to validate a candidate),
3. DuckDB SQL expression strings (the correctness oracle).

Semantics follow the reference validators (reference:
src/catalog_pii_scanner/rules.py:35-47 Luhn, rules.py:51-86 Verhoeff); the
implementations here are written from the public algorithm definitions.

The Spark and DuckDB renderings are generated from the same tables/constants
so the engine and its oracle cannot drift.
"""

from __future__ import annotations

# --- Verhoeff tables (public-domain algorithm constants) --------------------
# d: dihedral group D5 multiplication table, p: permutation table.
VERHOEFF_D = [
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9],
    [1, 2, 3, 4, 0, 6, 7, 8, 9, 5],
    [2, 3, 4, 0, 1, 7, 8, 9, 5, 6],
    [3, 4, 0, 1, 2, 8, 9, 5, 6, 7],
    [4, 0, 1, 2, 3, 9, 5, 6, 7, 8],
    [5, 9, 8, 7, 6, 0, 4, 3, 2, 1],
    [6, 5, 9, 8, 7, 1, 0, 4, 3, 2],
    [7, 6, 5, 9, 8, 2, 1, 0, 4, 3],
    [8, 7, 6, 5, 9, 3, 2, 1, 0, 4],
    [9, 8, 7, 6, 5, 4, 3, 2, 1, 0],
]
VERHOEFF_P = [
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9],
    [1, 5, 7, 6, 2, 8, 3, 0, 9, 4],
    [5, 8, 0, 3, 7, 9, 6, 1, 4, 2],
    [8, 9, 1, 6, 0, 4, 3, 5, 2, 7],
    [9, 4, 5, 3, 1, 2, 6, 8, 7, 0],
    [4, 2, 8, 6, 5, 7, 3, 9, 0, 1],
    [2, 7, 9, 3, 8, 0, 6, 4, 1, 5],
    [7, 0, 4, 6, 9, 1, 3, 2, 5, 8],
]

# Flattened lookup strings: d[r][c] == D_STR[r*10+c], p[i][c] == P_STR[i*10+c]
D_STR = "".join(str(x) for row in VERHOEFF_D for x in row)
P_STR = "".join(str(x) for row in VERHOEFF_P for x in row)


# --- Python ------------------------------------------------------------------

def luhn_ok(value: str) -> bool:
    """True iff ``value`` holds 13-19 digits passing the Luhn mod-10 check.

    The length gate mirrors the reference's card-length bound (reference
    rules.py:35-47) so the validator is safe standalone, independent of the
    calling pattern's constraints."""
    digits = [int(ch) for ch in value if ch.isdigit()]
    if not 13 <= len(digits) <= 19:
        return False
    total = 0
    for i, d in enumerate(reversed(digits)):
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def verhoeff_ok(value: str) -> bool:
    """True iff ``value`` is a well-formed Aadhaar: exactly 12 digits,
    leading digit 2-9, passing the Verhoeff check (reference
    rules.py:51-86's gates, kept inside the validator so standalone reuse
    cannot validate arbitrary digit strings)."""
    digits = [int(ch) for ch in value if ch.isdigit()]
    if len(digits) != 12 or digits[0] < 2:
        return False
    c = 0
    for i, d in enumerate(reversed(digits)):
        c = VERHOEFF_D[c][VERHOEFF_P[i % 8][d]]
    return c == 0


# --- SQL renderings ----------------------------------------------------------

def digits_only_sql(col: str, dialect: str) -> str:
    """Strip non-digits. DuckDB's regexp_replace replaces only the first
    match unless the 'g' flag is passed; Spark's is global by default."""
    if dialect == "duckdb":
        return f"regexp_replace({col}, '[^0-9]', '', 'g')"
    return f"regexp_replace({col}, '[^0-9]', '')"


def luhn_sql(col: str, dialect: str) -> str:
    """Boolean Luhn-check expression over a string column.

    ``dialect`` is 'spark' (aggregate/sequence) or 'duckdb'
    (list_sum/list_transform). Shared math: iterate the reversed digit
    string; double every second digit; subtract 9 when > 9; total % 10 == 0.
    """
    d = digits_only_sql(col, dialect)
    rev = f"reverse({d})"
    # per-index contribution, i is 0-based; substr is 1-based in both dialects
    def contrib(i: str) -> str:
        dig = f"CAST(substr({rev}, {i} + 1, 1) AS INT)"
        return (
            f"(CASE WHEN ({i}) % 2 = 1 THEN "
            f"(CASE WHEN {dig} * 2 > 9 THEN {dig} * 2 - 9 ELSE {dig} * 2 END) "
            f"ELSE {dig} END)"
        )

    if dialect == "spark":
        body = (
            f"aggregate(sequence(0, length({d}) - 1), 0, "
            f"(acc, i) -> acc + {contrib('i')})"
        )
    elif dialect == "duckdb":
        body = (
            f"list_sum(list_transform(range(0, length({d})), "
            f"i -> {contrib('i')}))"
        )
    else:  # pragma: no cover
        raise ValueError(dialect)
    return f"(length({d}) BETWEEN 13 AND 19 AND {body} % 10 = 0)"


def verhoeff12_sql(col: str, dialect: str = "spark") -> str:
    """Boolean Verhoeff-check expression for an exactly-12-digit value
    (Aadhaar is always 12 digits), fully unrolled — apart from the
    regexp_replace 'g' flag the rendering is identical Spark SQL and
    DuckDB SQL.

    State fold: c_{k+1} = d[c_k][p[k % 8][digit_k]] over reversed digits,
    valid iff final c == 0. The d/p tables are inlined as flat strings and
    indexed with substr.
    """
    d = digits_only_sql(col, dialect)

    def digit(i: int) -> str:  # i-th digit of the reversed 12-digit string
        return f"CAST(substr({d}, {12 - i}, 1) AS INT)"

    c = "0"
    for i in range(12):
        p_lookup = (
            f"CAST(substr('{P_STR}', {(i % 8) * 10} + {digit(i)} + 1, 1) AS INT)"
        )
        c = f"CAST(substr('{D_STR}', ({c}) * 10 + {p_lookup} + 1, 1) AS INT)"
    return (f"(length({d}) = 12 AND "
            f"CAST(substr({d}, 1, 1) AS INT) >= 2 AND ({c}) = 0)")
