"""DSIR importance-resampling selection (operators/dsir.py): the
selection must prefer raw docs that look like the target domain, the
weights must be integer-exact ranks, and the degenerate edges must be
deterministic."""

from __future__ import annotations

import duckdb
import pytest

from catalog_pii_scanner_spark.operators.dsir import (
    DSIR_K, dsir_select_docs, dsir_select_sql)

TARGET_TXT = "vector stream window agg column vector stream window agg"
OTHER_TXT = "customer order part table row customer order part table"


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string")


def test_selects_target_like_docs_first(spark):
    rows = (
        # target domain: vector/stream vocabulary
        [(i, TARGET_TXT, "src0") for i in range(10)]
        # raw pool: 5 target-like plants + 20 off-domain docs
        + [(100 + i, TARGET_TXT, "srcX") for i in range(5)]
        + [(200 + i, OTHER_TXT, "srcX") for i in range(20)]
    )
    out = dsir_select_docs(_docs(spark, rows), k=10).collect()
    assert [r.drank for r in out] == list(range(1, 11))
    # the 5 plants outrank every off-domain doc
    assert {r.doc_id for r in out[:5]} == {100, 101, 102, 103, 104}
    # weights are non-increasing in rank and the plants' are positive
    ws = [r.weight for r in out]
    assert ws == sorted(ws, reverse=True)
    assert all(w > 0 for w in ws[:5])
    # n_feats = bigram count = tokens - 1
    assert out[0].n_feats == len(TARGET_TXT.split()) - 1


def test_target_docs_never_selected(spark):
    rows = [(i, TARGET_TXT, "src0") for i in range(10)] \
        + [(100, OTHER_TXT, "srcX")]
    out = dsir_select_docs(_docs(spark, rows), k=50).collect()
    assert {r.doc_id for r in out} == {100}


def test_no_target_domain_is_deterministic(spark):
    """Empty target -> add-one smoothing makes every bucket ratio the
    same constant, so weights reduce to n_feats * c and ranking is by
    that, tie by doc_id — still a total order, no crash."""
    rows = [(i, OTHER_TXT, "srcX") for i in range(8)]
    out = dsir_select_docs(_docs(spark, rows), k=8).collect()
    assert [r.doc_id for r in out] == list(range(8))


def test_oracle_parity_inline(spark):
    """Cross-engine parity on an inline corpus (the driver gate pins
    the real table; this pins the template pair on a corpus with
    planted structure)."""
    rows = (
        [(i, TARGET_TXT, "src0") for i in range(6)]
        + [(50 + i, f"{TARGET_TXT} customer order", "srcY")
           for i in range(4)]
        + [(80 + i, OTHER_TXT, "srcZ") for i in range(12)]
    )
    sdf = _docs(spark, rows)
    got = {tuple(r) for r in dsir_select_docs(sdf, k=9).collect()}
    con = duckdb.connect()
    con.register("documents", sdf.toPandas())
    want = {tuple(r) for r in
            con.execute(dsir_select_sql("duckdb", k=9)).fetchall()}
    assert got == want


def test_default_k_is_bounded():
    assert DSIR_K == 200
