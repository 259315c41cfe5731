"""Cross-engine property tests for oracles.ratio_round_halfup — the
tie-exact ratio fragment the round-10 fuzz sweep motivated (seed
777001: round() of a double quotient diverged between engines at an
exact half-micro tie; the fragment's docstring has the mechanism)."""

from __future__ import annotations

from decimal import Decimal
from fractions import Fraction

import duckdb
import pytest

from catalog_pii_scanner_spark.oracles import ratio_round_halfup

#: (num, den, num_scale) triples: exact 1e-6 half-ties (reduced
#: denominator 2^7 * 5^b — the provable tie class for integer ratios),
#: the fuzz-found decimal-sum tie, a cluster-scale numerator (the
#: overflow cliff the two-step long division removes), non-tie
#: controls, and zero.
CASES = [
    ("1", 640, 0), ("3", 640, 0), ("7", 640, 0),    # 2^7*5 ties
    ("1", 128, 0), ("5", 128, 0),                   # dyadic (exact dbl)
    ("1", 3200, 0), ("1", 16000, 0),                # deeper 2^7*5^b
    ("129.231685", 22, 6),                          # the seed-777001 tie
    ("123.45", 7, 2),                               # cent-scale sum
    ("3800000000000000.25", 100000000000, 2),       # ~100TB Q1 numerator
    ("7", 3, 0), ("22", 7, 0), ("0", 5, 0), ("41", 41, 0),  # controls
]


def _py_halfup(num: str, den: int) -> float:
    micro = Fraction(Decimal(num)) * 10**6
    q = (2 * micro + den) // (2 * den)  # half-up for non-negative
    assert q == int(q)
    return int(q) / 1e6


def test_ratio_round_halfup_cross_engine(spark):
    duck = duckdb.connect()
    for num, den, ns in CASES:
        want = _py_halfup(num, den)
        lit = f"CAST({num} AS DECIMAL(38,{ns}))"
        d = duck.sql(
            "SELECT " + ratio_round_halfup(
                "duckdb", lit, str(den), num_scale=ns)
        ).fetchall()[0][0]
        s = spark.sql(
            "SELECT " + ratio_round_halfup(
                "spark", lit, str(den), num_scale=ns)
        ).collect()[0][0]
        assert s == d == pytest.approx(want, abs=0), (num, den, s, d, want)


def test_ratio_round_halfup_rounds_half_up():
    """At the exact tie the fragment must round AWAY from zero (up for
    the non-negative domain), the documented half-up contract."""
    duck = duckdb.connect()
    # 1/640 = 0.0015625 -> 0.001563 (up), never 0.001562
    v = duck.sql("SELECT " + ratio_round_halfup(
        "duckdb", "CAST(1 AS DECIMAL(38,6))", "640")).fetchall()[0][0]
    assert v == 0.001563


def test_guarded_fragment_branches(spark):
    """ratio_round_halfup_guarded: equal to the exact fragment under
    the bound, plain double round beyond it, and the SAME branch on
    both engines (round-11: the runtime guard replacing the documented
    overflow cliff at unbounded-denominator call sites)."""
    from catalog_pii_scanner_spark.oracles import (
        halfup_den_bound, ratio_round_halfup_guarded)
    duck = duckdb.connect()
    bound = halfup_den_bound()
    # under the bound: identical to the exact fragment (tie case)
    for eng, run in (("duckdb", lambda q: duck.sql(q).fetchall()[0][0]),
                     ("spark",
                      lambda q: spark.sql(q).collect()[0][0])):
        v = run("SELECT " + ratio_round_halfup_guarded(
            eng, "CAST(1 AS BIGINT)", "640"))
        assert v == 0.001563, (eng, v)
        # beyond the bound: evaluates WITHOUT overflow on both engines
        # (DuckDB would raise, Spark would silently wrap, if the exact
        # branch were taken) and returns the plain double round
        big = bound * 10 + 7
        v = run("SELECT " + ratio_round_halfup_guarded(
            eng, f"CAST({big // 2} AS BIGINT)", f"CAST({big} AS BIGINT)"))
        assert v == 0.5, (eng, v)


def test_basket_lift_guard_is_factor_safe(spark):
    """The lift guard bound: n <= _LIFT_GUARD_N implies every fragment
    intermediate fits BIGINT even at the worst corner (pair = a = b =
    n), and the worst corner VALUE is correct on both engines."""
    from catalog_pii_scanner_spark.oracles import halfup_den_bound
    from catalog_pii_scanner_spark.operators.analytics import (
        _LIFT_GUARD_N)
    n = _LIFT_GUARD_N
    assert n * n <= halfup_den_bound()
    assert (n + 1) * (n + 1) > halfup_den_bound()
    duck = duckdb.connect()
    from catalog_pii_scanner_spark.oracles import (
        ratio_round_halfup_guarded)
    for eng, run in (("duckdb", lambda q: duck.sql(q).fetchall()[0][0]),
                     ("spark",
                      lambda q: spark.sql(q).collect()[0][0])):
        q = ("SELECT " + ratio_round_halfup_guarded(
            eng, f"CAST({n} AS BIGINT) * {n}",
            f"CAST({n} AS BIGINT) * {n}", guard=f"{n} <= {n}"))
        assert run(q) == 1.0, eng


def test_product_fallback_branch_is_overflow_safe_and_identical(spark):
    """Round-12 (verdict item 6 + round-11 ADVICE medium): FORCE the
    guarded fragment's FALLBACK branch at product call sites with
    factor magnitudes where the products exceed BIGINT — the exact
    regime the fallback exists for. Without fallback_num/fallback_den
    the plain branch computes the BIGINT product BEFORE the DOUBLE
    cast: DuckDB raises (out-of-range), Spark silently wraps — the
    cliff the guard claims to remove. With them, both engines evaluate
    the identical factor-cast-to-DOUBLE arithmetic; values must match
    EXACTLY (same IEEE ops in the same order).

    The counts mirror the basket-lift worst shape at a ~5e9-order
    universe: pair * n and a * b are ~1.5e19 > 2^63 - 1."""
    from catalog_pii_scanner_spark.oracles import (
        ratio_round_halfup_guarded)
    duck = duckdb.connect()
    pair, n, a, b = 2_999_999_999, 5_000_000_001, 3_000_000_007, \
        4_999_999_999
    assert pair * n > 2 ** 63 - 1 and a * b > 2 ** 63 - 1
    cte = (f"WITH rel AS (SELECT CAST({pair} AS BIGINT) AS pair_n, "
           f"CAST({n} AS BIGINT) AS n_tot, CAST({a} AS BIGINT) AS a_n, "
           f"CAST({b} AS BIGINT) AS b_n) ")
    vals = {}
    for eng, run in (("duckdb", lambda q: duck.sql(q).fetchall()[0][0]),
                     ("spark",
                      lambda q: spark.sql(q).collect()[0][0])):
        frag = ratio_round_halfup_guarded(
            eng, "pair_n * n_tot", "a_n * b_n",
            guard=f"n_tot <= 2147483",  # fails -> fallback branch
            fallback_num="(CAST(pair_n AS DOUBLE) * n_tot)",
            fallback_den="(CAST(a_n AS DOUBLE) * b_n)")
        vals[eng] = run(cte + "SELECT " + frag + " FROM rel")
    assert vals["spark"] == vals["duckdb"], vals
    # the expected value, computed independently
    import math
    want = round((float(pair) * n) / (float(a) * b), 6)
    assert math.isclose(vals["spark"], want, rel_tol=0, abs_tol=0), vals


def test_call_site_fallbacks_are_registered():
    """The two product call sites (basket lift, collocations) must pass
    overflow-safe fallback expressions — pin the generated SQL so a
    refactor cannot silently drop them back to the raw-product
    fallback."""
    from catalog_pii_scanner_spark.operators.analytics import (
        basket_pairs_segments)
    from catalog_pii_scanner_spark.operators.corpus import (
        collocations_oracle_sql)
    for dialect in ("spark", "duckdb"):
        _, metric = basket_pairs_segments(dialect)
        assert "CAST(pr.pair_orders AS DOUBLE) * n.n" in metric, dialect
        assert "CAST(pa.cnt AS DOUBLE) * pb.cnt" in metric, dialect
    sql = collocations_oracle_sql()
    assert "CAST(p.n_ab AS DOUBLE) * n.n_bigrams" in sql
    assert "CAST(a.n_a1 AS DOUBLE) * b.n_b2" in sql


def test_guarded_ratio_random_sweep_cross_engine(spark):
    """Seeded random sweep over (num, den) magnitude regimes for
    ratio_round_halfup_guarded under its DEFAULT guard: small counts,
    cluster-scale exact-branch rows just under halfup_den_bound, and
    fallback-branch rows beyond it. Asserts (a) both engines return
    bit-identical doubles row-for-row — if the guard misrouted a
    beyond-bound row onto the exact branch, DuckDB would raise on the
    overflowing intermediate, failing loudly — and (b) on the exact
    branch the value equals an INDEPENDENT Python integer half-up
    rendering of the same ratio."""
    import random

    from catalog_pii_scanner_spark.oracles import (halfup_den_bound,
                                                   ratio_round_halfup_guarded)
    rng = random.Random(20260817)
    bound = halfup_den_bound()          # ~4.6e12 at scale 6
    rows = []
    for _ in range(60):                 # small counts, exact branch
        d = rng.randint(1, 10 ** 6)
        rows.append((rng.randint(0, d), d))
    for _ in range(40):                 # near the bound, exact branch
        d = rng.randint(10 ** 10, bound)
        rows.append((rng.randint(0, d), d))
    for _ in range(40):                 # beyond the bound, fallback
        d = rng.randint(bound + 1, 10 ** 13)
        rows.append((rng.randint(0, d), d))
    frag = {e: ratio_round_halfup_guarded(e, "num", "den")
            for e in ("spark", "duckdb")}
    vals = ", ".join(f"({i}, CAST({n} AS BIGINT), CAST({d} AS BIGINT))"
                     for i, (n, d) in enumerate(rows))
    got = {}
    got["spark"] = [r[0] for r in spark.sql(
        f"SELECT {frag['spark']} FROM VALUES {vals} AS t(i, num, den) "
        "ORDER BY i").collect()]
    got["duckdb"] = [r[0] for r in duckdb.sql(
        f"SELECT {frag['duckdb']} FROM (VALUES {vals}) t(i, num, den) "
        "ORDER BY i").fetchall()]
    assert got["spark"] == got["duckdb"]        # bit-exact, all 140 rows
    for (n, d), v in zip(rows, got["spark"]):
        if d <= bound:                          # independent half-up
            assert v == ((2 * n * 10 ** 6 + d) // (2 * d)) / 10 ** 6, \
                (n, d, v)
