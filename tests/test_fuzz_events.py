"""Seeded random-events differential: the whole events analytics family
(sessions, as-of, retention, funnel, gap-fill, hourly) compared against
DuckDB on a corpus with deliberate nasties — duplicate timestamps for
one user, single-event users, bursts straddling session boundaries."""

from __future__ import annotations

import datetime as dt
import random

import duckdb
import pytest


def _events(seed: int = 20260814, n: int = 2500):
    rng = random.Random(seed)
    t0 = dt.datetime(2024, 3, 1)
    types = ["view", "click", "purchase", "error", "signup"]
    rows = []
    for i in range(n):
        user = rng.randrange(40)
        ts = t0 + dt.timedelta(seconds=rng.randrange(21 * 24 * 3600),
                               microseconds=rng.randrange(1_000_000))
        rows.append((i, ts, user, rng.choice(types),
                     round(rng.uniform(0, 500), 2), "{}"))
    # nasties: duplicate timestamp for one user; a lone user; an exact
    # 30-minute gap pair (the session boundary)
    base = dt.datetime(2024, 3, 25, 12, 0, 0)
    rows += [
        (n + 1, base, 900, "view", 1.0, "{}"),
        (n + 2, base, 900, "click", 2.0, "{}"),        # same ts, same user
        (n + 3, base + dt.timedelta(minutes=30), 900, "view", 3.0, "{}"),
        (n + 4, base, 901, "purchase", 4.0, "{}"),     # lone single event
    ]
    return rows


QUERIES = ["events_sessions", "events_asof_join", "events_retention",
           "events_funnel", "events_hourly_gapfill", "events_hourly",
           # true Structured Streaming drains: session/window state must
           # merge across microbatches to the SAME rows on this corpus
           "stream_events_sessions", "stream_events_hourly"]


@pytest.fixture(scope="session")
def fuzz_dir(spark, tmp_path_factory):
    """Session-scoped nasty-corpus builder: both the per-query oracle
    differential AND the salted-twin equality test consume this, so the
    corpus is always built regardless of test ordering (ADVICE r5: the
    old getattr-on-the-test-function plumbing silently skipped the
    second corpus when tests ran in isolation)."""
    d = str(tmp_path_factory.mktemp("fuzzev"))
    spark.createDataFrame(
        _events(), "event_id bigint, ts timestamp, user_id bigint, "
                   "event_type string, value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


@pytest.mark.parametrize("qname", QUERIES)
def test_fuzz_events_family_matches_oracle(spark, fuzz_dir, qname):
    import sys
    sys.path.insert(0, ".")
    import __spark_entry__ as E
    from tools.selfcheck import frame_fingerprint

    d = fuzz_dir
    sdf = E.queries()[qname](spark, d)
    s_fp = frame_fingerprint(list(sdf.columns),
                             [tuple(r) for r in sdf.collect()])
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{d}/events.parquet/*.parquet'")
    cur = con.execute(E.oracle_sql()[qname])
    o_fp = frame_fingerprint([c[0] for c in cur.description],
                             cur.fetchall())
    assert s_fp == o_fp, (qname, s_fp, o_fp)


# --- power-law hot key (skew hardening) --------------------------------------
# A bot-shaped corpus: one user owns ~60% of all events in dense bursts
# (plus sparse stragglers that span session boundaries). Verifies (a) the
# whole family stays oracle-correct under skew and (b) the salted
# sessionization twin is row-identical to the global operator, so the
# skew mitigation is pure execution strategy, never semantics.

def _powerlaw_events(seed: int = 99, n: int = 4000):
    rng = random.Random(seed)
    t0 = dt.datetime(2024, 3, 1)
    types = ["view", "click", "purchase", "error", "signup"]
    rows = []
    for i in range(n):
        if rng.random() < 0.6:
            user = 0  # the hot key
            # dense bursts: many events seconds apart, occasionally
            # jumping > the 30-min session gap and across midnight
            ts = t0 + dt.timedelta(
                hours=rng.randrange(24 * 21),
                seconds=rng.randrange(120) if rng.random() < 0.9
                else rng.randrange(3600 * 3))
        else:
            user = 1 + rng.randrange(25)
            ts = t0 + dt.timedelta(seconds=rng.randrange(21 * 24 * 3600))
        rows.append((i, ts, user, rng.choice(types),
                     round(rng.uniform(0, 500), 2), "{}"))
    # a hot-user session that straddles a day boundary exactly (the
    # salted operator's merge path) and an exactly-30-min gap
    base = dt.datetime(2024, 3, 10, 23, 50, 0)
    rows += [(n + j, base + dt.timedelta(minutes=5 * j), 0, "view",
              1.0, "{}") for j in range(6)]          # 23:50 .. 00:15
    rows += [(n + 10, dt.datetime(2024, 3, 12, 1, 0, 0), 0, "view",
              2.0, "{}"),
             (n + 11, dt.datetime(2024, 3, 12, 1, 30, 0), 0, "view",
              3.0, "{}")]                            # gap == 30 min: merges
    return rows


@pytest.fixture(scope="session")
def powerlaw_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fuzzpl"))
    spark.createDataFrame(
        _powerlaw_events(),
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


PL_QUERIES = ["events_sessions", "events_sessions_salted",
              "events_asof_join", "events_funnel", "events_retention",
              "events_hourly_gapfill"]


@pytest.mark.parametrize("qname", PL_QUERIES)
def test_powerlaw_hot_key_matches_oracle(spark, powerlaw_dir, qname):
    import sys
    sys.path.insert(0, ".")
    import __spark_entry__ as E
    from tools.selfcheck import frame_fingerprint

    d = powerlaw_dir
    sdf = E.queries()[qname](spark, d)
    s_fp = frame_fingerprint(list(sdf.columns),
                             [tuple(r) for r in sdf.collect()])
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{d}/events.parquet/*.parquet'")
    cur = con.execute(E.oracle_sql()[qname])
    o_fp = frame_fingerprint([c[0] for c in cur.description],
                             cur.fetchall())
    assert s_fp == o_fp, (qname, s_fp, o_fp)


def test_salted_sessions_equal_global_rowwise(spark, powerlaw_dir,
                                              fuzz_dir):
    """Strategy-equality twin discipline (same as the ANN matmul twins):
    salted == global on BOTH fuzz corpora, row for row. Both corpora are
    session fixtures, so both are ALWAYS exercised regardless of test
    ordering (ADVICE r5)."""
    from catalog_pii_scanner_spark.streaming.watcher import (
        events_sessions, events_sessions_salted)
    for d in (powerlaw_dir, fuzz_dir):
        a = sorted(map(tuple, events_sessions(spark, d).collect()))
        b = sorted(map(tuple, events_sessions_salted(spark, d).collect()))
        assert a and a == b


def test_neighbor_window_blocking_complete_at_boundaries(spark):
    """The 3-bin blocking must be COMPLETE at exact window boundaries:
    events exactly W apart (inclusive) and events straddling a bin edge
    by 1 microsecond must count each other; events W+1us apart must
    not. Compared against the naive inequality join in DuckDB."""
    import duckdb

    from catalog_pii_scanner_spark.streaming.watcher import (
        NEIGHBOR_WINDOW_US, events_neighbor_window,
        events_neighbor_window_oracle_sql)

    w = NEIGHBOR_WINDOW_US
    base = 1_700_000_000_000_000  # us epoch
    rows = []
    eid = 0
    # exact-boundary pair, off-by-one pair, bin-edge straddlers, a
    # NULL-user row, and a lone event
    for us_a, us_b in ((base, base + w), (base + 10 * w,
                                          base + 11 * w + 1),
                       (base + 20 * w - 1, base + 20 * w),
                       (base + 30 * w, base + 31 * w - 1)):
        rows += [(eid, us_a, 1), (eid + 1, us_b, 1)]
        eid += 2
    rows += [(eid, base, None), (eid + 1, base + 50 * w, 7)]
    import datetime
    to_ts = lambda us: datetime.datetime.utcfromtimestamp(us / 1e6)  # noqa: E731
    data = [(i, to_ts(us), u, "t", 1.0, "{}") for i, us, u in rows]
    sdf = spark.createDataFrame(
        data, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    import tempfile
    d = tempfile.mkdtemp(prefix="cpss_nbr_")
    sdf.write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = sorted(map(tuple,
                     events_neighbor_window(spark, d).collect()))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{d}/events.parquet/*.parquet'")
    want = sorted(map(tuple, con.execute(
        events_neighbor_window_oracle_sql()).fetchall()))
    assert got == want
    by_id = dict((r[0], r[2]) for r in got)
    assert by_id[0] == 1 and by_id[1] == 1     # exactly W apart: in
    assert by_id[2] == 0 and by_id[3] == 0     # W + 1us apart: out
    assert by_id[4] == 1 and by_id[5] == 1     # straddle a bin edge
