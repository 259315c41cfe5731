"""greedy_match must reproduce the reference's SEQUENTIAL greedy 1:1
match (reference eval.py:20-50): preds in order each claim the first
still-unused overlapping gold of equal type. The r1/r2 one-pass
formulation dropped a pred whose first-choice gold was already claimed;
these cases pin the exact semantics."""

from __future__ import annotations

from catalog_pii_scanner_spark.operators.evaluate import greedy_match


def _preds(spark, rows):
    return spark.createDataFrame(
        [("t1", "PERSON", s, e) for s, e in rows],
        "text_id string, pii_type string, pstart int, pend int")


def _gold(spark, rows):
    return spark.createDataFrame(
        [("t1", "PERSON", s, e) for s, e in rows],
        "text_id string, pii_type string, gstart int, gend int")


def _pairs(df):
    return {(r.pstart, r.gstart) for r in df.collect()}


def reference_greedy(preds, golds):
    """Row-at-a-time transcription of the reference semantics
    (eval.py:20-50): for each pred in order, the first unused overlapping
    gold is a TP."""
    used, out = set(), set()
    for ps, pe in sorted(preds):
        for gs, ge in sorted(golds):
            if gs in used:
                continue
            if ps < ge and gs < pe:
                used.add(gs)
                out.add((ps, gs))
                break
    return out


def test_two_preds_one_gold_takes_next_free(spark):
    """p1 claims g1; p2 (whose first choice is also g1) must fall through
    to g2 — the exact case the one-pass version dropped."""
    preds = [(0, 10), (5, 25)]
    golds = [(0, 12), (20, 30)]
    got = _pairs(greedy_match(_preds(spark, preds), _gold(spark, golds)))
    assert got == reference_greedy(preds, golds) == {(0, 0), (5, 20)}


def test_contention_chain(spark):
    """p3 must NOT steal g2 while p2 is still contending for g1: the
    sequential result is p1->g1, p2->g2, p3->g3."""
    preds = [(0, 10), (5, 25), (22, 40)]
    golds = [(0, 12), (20, 27), (35, 45)]
    got = _pairs(greedy_match(_preds(spark, preds), _gold(spark, golds)))
    assert got == reference_greedy(preds, golds) == \
        {(0, 0), (5, 20), (22, 35)}


def test_unmatchable_pred_is_dropped(spark):
    """Two preds whose only gold is shared: the earlier wins, the later
    is an FP (no pair emitted)."""
    preds = [(0, 10), (2, 8)]
    golds = [(0, 12)]
    got = _pairs(greedy_match(_preds(spark, preds), _gold(spark, golds)))
    assert got == reference_greedy(preds, golds) == {(0, 0)}


def test_type_mismatch_never_matches(spark):
    preds = _preds(spark, [(0, 10)])
    golds = spark.createDataFrame(
        [("t1", "EMAIL", 0, 12)],
        "text_id string, pii_type string, gstart int, gend int")
    assert greedy_match(preds, golds).isEmpty()


def test_randomized_against_reference(spark):
    """Property-style sweep: random overlap graphs must agree with the
    row-at-a-time reference transcription — on BOTH the r13 bounded
    driver fast path and the distributed commit rounds (forced via the
    GREEDY_DRIVER_MAX_OVERLAPS gate)."""
    import random

    from catalog_pii_scanner_spark.operators import evaluate

    rng = random.Random(7)
    for limit in (10 ** 9, -1):   # driver path, then distributed path
        evaluate.GREEDY_DRIVER_MAX_OVERLAPS = limit
        try:
            for _ in range(6):
                preds = sorted({
                    (s, s + rng.randint(2, 15))
                    for s in rng.sample(range(0, 60), rng.randint(1, 6))})
                golds = sorted({
                    (s, s + rng.randint(2, 15))
                    for s in rng.sample(range(0, 60), rng.randint(1, 6))})
                got = _pairs(greedy_match(_preds(spark, preds),
                                          _gold(spark, golds)))
                assert got == reference_greedy(preds, golds), \
                    (limit, preds, golds)
        finally:
            evaluate.GREEDY_DRIVER_MAX_OVERLAPS = 1_000_000
