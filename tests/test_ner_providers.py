"""NER provider contract (reference tests/test_ner.py's FakeProvider
approach): the heavy mapInPandas path is pluggable, loads once per
worker, gates on confidence, and agrees with the JVM regex provider."""

from __future__ import annotations

import pytest

from catalog_pii_scanner_spark.operators import ner

TEXTS = [
    ("a", "Contact John Smith at john@x.io or (555) 123-4567"),
    ("b", "no pii here at all"),
    ("c", "mail sue@example.org and call 5551234567 today"),
    ("d", None),
]


@pytest.fixture(scope="module")
def vals(spark):
    return spark.createDataFrame(TEXTS, "column_ref string, value string")


def _key(rows):
    return {(r.column_ref, r.pii_type, r.match_text, r.ner_score)
            for r in rows}


def test_fake_heavy_matches_regex_provider(spark, vals):
    """Provider pluggability: identical spans from the JVM regex path and
    the mapInPandas heavy path."""
    jvm = _key(ner.detect_ner_spans(vals, provider="regex").collect())
    heavy = _key(ner.detect_ner_spans(vals, provider="fake_heavy").collect())
    assert heavy == jvm
    assert any(t == "PERSON" for _, t, _, _ in jvm)
    assert any(t == "EMAIL" for _, t, _, _ in jvm)


def test_confidence_gate_applies_in_heavy_path(spark, vals):
    got = ner.detect_ner_spans(vals, provider="fake_heavy",
                               confidence_min=0.9)
    types = {r.pii_type for r in got.collect()}
    # PERSON (0.85) gated out; EMAIL (0.99) and PHONE (0.90) survive
    assert types == {"EMAIL", "PHONE_NUMBER"}


def test_provider_singleton_loads_once():
    ner._PROVIDER_SINGLETONS.clear()
    before = ner.FakeHeavyProvider.load_count
    p1 = ner._get_provider("fake_heavy")
    p2 = ner._get_provider("fake_heavy")
    assert p1 is p2
    assert ner.FakeHeavyProvider.load_count == before + 1


def test_model_providers_raise_without_packages():
    ner._PROVIDER_SINGLETONS.clear()
    with pytest.raises(ImportError, match="spacy"):
        ner._get_provider("spacy")
    with pytest.raises(ValueError):
        ner._get_provider("nonsense")


def test_context_signals_normalize(spark):
    ctx = spark.createDataFrame(
        [("col", "m1", "mail a@b.co or b@c.io, call (555) 123-4567")],
        "column_ref string, match_text string, context string")
    got = {r.pii_type: r.signal
           for r in ner.ner_context_signals(ctx).collect()}
    assert got == {"EMAIL": pytest.approx(2 / 3, abs=1e-6),
                   "PHONE_NUMBER": pytest.approx(1 / 3, abs=1e-6)}
