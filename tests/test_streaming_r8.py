"""Split-invariance of the r8 arbitrary-stateful streaming operator:
the per-user top-K state must evolve to the same final value no matter
how files split into microbatches (top-K under a total order is
merge-correct), and the emitted score must equal the batch oracle's
exact integer arithmetic."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from catalog_pii_scanner_spark.streaming.watcher import (
    events_recent_score_oracle_sql, stream_events_recent_score)

from conftest import SF_DIR


def _oracle_rows(parquet_dir):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{parquet_dir}/events.parquet/*.parquet')")
    return sorted(map(tuple,
                      con.sql(events_recent_score_oracle_sql())
                      .fetchall()))


def test_recent_score_split_invariant_and_matches_oracle(
        spark, tmp_path, sf_dir):
    """Stripe events into 12 files by event_id parity classes —
    microbatches then interleave event TIMES arbitrarily, the case
    where a naive keep-last-K accumulator diverges — and require the
    drain to equal the batch oracle exactly."""
    import glob

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    d = str(tmp_path)
    (events.repartition(12, F.pmod(F.col("event_id"), F.lit(12)))
     .write.mode("overwrite").parquet(f"{d}/events.parquet"))
    assert len(glob.glob(f"{d}/events.parquet/part-*")) >= 5

    got = sorted(map(tuple,
                     stream_events_recent_score(spark, d).collect()))
    want = _oracle_rows(d)
    assert got and got == want


def test_recent_score_clamp_and_ties(spark, tmp_path):
    """Clamped extremes and exact-duplicate timestamps (event_id
    tiebreak) through the stateful path vs the oracle."""
    base = 1_700_000_000
    rows = [
        # same-ts pair: event_id breaks the tie
        (1, base, 1, "a", 10.0, ""),
        (2, base, 1, "a", 20.0, ""),
        # a clamped monster value and a NULL (skipped)
        (3, base + 1, 1, "a", 1.0e12, ""),
        (4, base + 2, 1, "a", None, ""),
        (5, base + 3, 2, "a", -1.0e12, ""),
    ]
    cols = ("event_id bigint, tsl bigint, user_id bigint, "
            "event_type string, value double, props string")
    d = str(tmp_path)
    (spark.createDataFrame(rows, cols)
     .selectExpr("event_id", "timestamp_seconds(tsl) AS ts", "user_id",
                 "event_type", "value", "props")
     .repartition(3).write.mode("overwrite")
     .parquet(f"{d}/events.parquet"))
    got = sorted(map(tuple,
                     stream_events_recent_score(spark, d).collect()))
    want = _oracle_rows(d)
    assert got == want
    by_user = {r[0]: r for r in got}
    assert by_user[1][1] == 3          # NULL value row not counted
    from catalog_pii_scanner_spark.streaming.watcher import (
        RECENT_CLAMP, RECENT_K)
    # user 2: one clamped negative event at the newest slot
    assert by_user[2] == (2, 1, -RECENT_CLAMP * (1 << (RECENT_K - 1)))


def test_recent_score_null_ts_and_nan_value_rows(spark, tmp_path):
    """NULL-ts rows (no recency rank) and NaN values (pass isNotNull,
    break floor()) are excluded by the SHARED filter in both the
    stateful stream and the oracle — the r8 review regressions."""
    base = 1_700_000_000
    rows = [
        (1, base, 1, "a", 10.0, ""),
        (2, None, 1, "a", 99.0, ""),           # NULL ts: excluded
        (3, base + 1, 1, "a", float("nan"), ""),  # NaN value: excluded
        (4, base + 2, 2, "a", 7.0, ""),
    ]
    cols = ("event_id bigint, tsl bigint, user_id bigint, "
            "event_type string, value double, props string")
    d = str(tmp_path)
    (spark.createDataFrame(rows, cols)
     .selectExpr("event_id", "timestamp_seconds(tsl) AS ts", "user_id",
                 "event_type", "value", "props")
     .repartition(2).write.mode("overwrite")
     .parquet(f"{d}/events.parquet"))
    got = sorted(map(tuple,
                     stream_events_recent_score(spark, d).collect()))
    want = _oracle_rows(d)
    assert got == want
    assert {r[0]: r[1] for r in got} == {1: 1, 2: 1}


# --- streaming DSIR (r9) --------------------------------------------------------

def test_stream_dsir_matches_batch_across_microbatches(spark, tmp_path):
    """The spool drain must equal the batch selection on a multi-file
    corpus (several microbatches), including the target/raw split."""
    from catalog_pii_scanner_spark.operators.dsir import (
        dsir_select_docs)
    from catalog_pii_scanner_spark.streaming.watcher import (
        stream_dsir_select)
    tgt = "vector stream window agg column vector stream window agg"
    raw = "customer order part table row customer order part table"
    rows = ([(i, tgt, "src0", len(tgt)) for i in range(8)]
            + [(100 + i, tgt + " table row", "srcA",
                len(tgt) + 10) for i in range(6)]
            + [(200 + i, raw, "srcB", len(raw)) for i in range(12)])
    d = str(tmp_path)
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long")
    docs.repartition(5).write.mode("overwrite") \
        .parquet(f"{d}/documents.parquet")
    got = sorted(map(tuple, stream_dsir_select(spark, d).collect()))
    want = sorted(map(tuple, dsir_select_docs(
        spark.read.parquet(f"{d}/documents.parquet")).collect()))
    assert got and got == want
    # the target-like plants win
    assert {r[1] for r in got[:6]} == {100 + i for i in range(6)}


def test_stream_dsir_empty_corpus_returns_empty(spark, tmp_path):
    """r7 ADVICE regression: a corpus whose drain spools no rows must
    return an empty selection like the batch path, not raise on a
    file-less spool directory."""
    from catalog_pii_scanner_spark.streaming.watcher import (
        stream_dsir_select)
    d = str(tmp_path)
    docs = spark.createDataFrame(
        [], "doc_id long, text string, source string, n_chars long")
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = stream_dsir_select(spark, d)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == [
        "drank", "doc_id", "n_feats", "weight"]


# --- streaming KMV (round 9; registration deferred to round 10) ---------------

def test_stream_kmv_matches_batch_across_microbatches(spark, tmp_path):
    """min-k over set union is associative/commutative/idempotent, so
    the spool drain must be BIT-identical to the batch sketch-only
    template no matter how files split into microbatches."""
    import duckdb

    from catalog_pii_scanner_spark.operators.sketches import (
        kmv_sketch_only_sql)
    from catalog_pii_scanner_spark.streaming.watcher import (
        stream_kmv_distinct)
    d = str(tmp_path)
    src = spark.read.parquet(f"{SF_DIR}/events.parquet")
    src.repartition(7).write.mode("overwrite") \
        .parquet(f"{d}/events.parquet")
    got = sorted(map(tuple, stream_kmv_distinct(spark, d).collect()))
    spark.read.parquet(f"{d}/events.parquet") \
        .createOrReplaceTempView("cpss_kmv_batch_oracle")
    want = sorted(map(tuple, spark.sql(
        kmv_sketch_only_sql("spark", "cpss_kmv_batch_oracle"))
        .collect()))
    assert got and got == want
    # dual-dialect: the batch oracle agrees with DuckDB on the parquet
    con = duckdb.connect()
    con.execute(f"CREATE VIEW ev AS SELECT * FROM "
                f"read_parquet('{d}/events.parquet/*.parquet')")
    duck = sorted(tuple(r) for r in con.execute(
        kmv_sketch_only_sql("duckdb", "ev")).fetchall())
    assert duck == got


def test_stream_kmv_empty_corpus(spark, tmp_path):
    """Zero-row stream: the drain must return ZERO rows (the finalize
    groups by col_ref, so an empty spool yields no groups — exactly
    what the batch sketch-only template returns on an empty table,
    asserted here so batch/stream identity holds at the degenerate
    point too) and must not raise on a file-less spool (the
    stream_dsir_select lesson)."""
    from catalog_pii_scanner_spark.operators.sketches import (
        kmv_sketch_only_sql)
    from catalog_pii_scanner_spark.streaming.watcher import (
        stream_kmv_distinct)
    d = str(tmp_path)
    spark.read.parquet(f"{SF_DIR}/events.parquet").limit(0) \
        .write.mode("overwrite").parquet(f"{d}/events.parquet")
    rows = stream_kmv_distinct(spark, d).collect()
    assert rows == []
    spark.read.parquet(f"{d}/events.parquet") \
        .createOrReplaceTempView("cpss_kmv_empty_oracle")
    assert spark.sql(kmv_sketch_only_sql(
        "spark", "cpss_kmv_empty_oracle")).collect() == []


def test_read_spool_or_guard_unit(spark, tmp_path):
    """The shared zero-microbatch guard: a file-less spool directory
    yields the schema-correct empty relation from make_empty(); a
    spool with parquet is read normally and make_empty never runs
    (round-10 review: the guard must protect EVERY spool-draining
    stream, not just the HLL/KMV pair)."""
    from catalog_pii_scanner_spark.streaming.watcher import (
        _read_spool_or)
    d = str(tmp_path / "spool_empty")
    import os
    os.makedirs(d)
    out = _read_spool_or(
        spark, d, lambda: spark.createDataFrame([], "a bigint, b string"))
    assert out.collect() == [] and out.columns == ["a", "b"]
    full = str(tmp_path / "spool_full")
    spark.createDataFrame([(1, "x")], "a bigint, b string") \
        .write.parquet(full)
    sentinel = []

    def boom():
        sentinel.append(True)
        raise AssertionError("make_empty ran on a non-empty spool")

    got = _read_spool_or(spark, full, boom)
    assert [tuple(r) for r in got.collect()] == [(1, "x")]
    assert not sentinel


def test_stream_cms_empty_corpus(spark, tmp_path):
    """Zero-row documents stream: the CMS drain returns zero nonzero
    counters with the finalize schema, and must not raise on a
    file-less spool (same guard as the HLL/KMV drains)."""
    from catalog_pii_scanner_spark.streaming.watcher import (
        stream_cms_counters)
    d = str(tmp_path)
    spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(0) \
        .write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = stream_cms_counters(spark, d)
    assert out.collect() == []
    assert out.columns == ["rj", "bucket", "total"]


def test_stream_recent_score_empty_events(spark, tmp_path):
    """Zero-row events stream: the stateful drain emits no state rows,
    so the resolve must return an empty (user_id, n_events,
    recent_score) relation, not raise on a file-less spool."""
    from catalog_pii_scanner_spark.streaming.watcher import (
        stream_events_recent_score)
    d = str(tmp_path)
    spark.read.parquet(f"{SF_DIR}/events.parquet").limit(0) \
        .write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = stream_events_recent_score(spark, d)
    assert out.collect() == []
    assert out.columns == ["user_id", "n_events", "recent_score"]
