"""Embedding classifier (E1-E4): deterministic offline encoder, OvR
training separates synthetic classes, trivial-estimator fallback,
persistence round-trip, distributed inference equals local."""

from __future__ import annotations

import numpy as np
import pytest

from catalog_pii_scanner_spark.operators.embeddings import (EmbedModel,
                                                            embed_probs,
                                                            embed_text)


def test_encoder_deterministic_and_normalized():
    a, b = embed_text("hello world"), embed_text("hello world")
    assert np.allclose(a, b)
    assert np.linalg.norm(a) == pytest.approx(1.0)
    assert not np.allclose(a, embed_text("other text"))


@pytest.fixture(scope="module")
def trained():
    # two separable "context" populations + their labels
    emails = [f"context email token{i}" for i in range(40)]
    phones = [f"phone context number{i}" for i in range(40)]
    texts = emails + phones
    labels = ["EMAIL"] * 40 + ["PHONE_NUMBER"] * 40
    return EmbedModel().fit(texts, labels), texts, labels


def test_heads_learn_better_than_chance(trained):
    model, texts, labels = trained
    probs = model.predict_proba(texts)
    correct = sum(
        1 for p, l in zip(probs, labels)
        if max(p, key=p.get) == l)
    assert correct / len(texts) > 0.6  # offline embeddings are random-ish
    for p in probs:
        assert set(p) == {"EMAIL", "PHONE_NUMBER"}
        assert all(0.0 <= v <= 1.0 for v in p.values())


def test_trivial_fallback_single_class():
    model = EmbedModel().fit(["a", "b", "c"], ["SSN", "SSN", "SSN"])
    assert model.heads["SSN"] == ("trivial", 1.0)
    assert model.predict_proba(["x"])[0]["SSN"] == 1.0


def test_no_classifier_returns_empty():
    assert EmbedModel().predict_proba(["x"]) == [{}]


def test_persistence_roundtrip(trained, tmp_path_factory):
    model, texts, _ = trained
    path = str(tmp_path_factory.mktemp("model") / "embed.npz")
    model.save(path)
    back = EmbedModel.load(path)
    assert [sorted(d.items()) for d in back.predict_proba(texts[:5])] == \
        [sorted(d.items()) for d in model.predict_proba(texts[:5])]


def test_distributed_inference_matches_local(spark, trained):
    model, texts, _ = trained
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts[:20])], "id long, context string")
    dist = {r.id: dict(r.embed_probs)
            for r in embed_probs(df, model).collect()}
    local = model.predict_proba(texts[:20])
    for i in range(20):
        for t, v in local[i].items():
            assert dist[i][t] == pytest.approx(v, abs=1e-12)


def test_md5hex_embedding_is_exact_hex_digits():
    import hashlib

    from catalog_pii_scanner_spark.operators.embeddings import md5hex_embed
    v = md5hex_embed("hello world")
    h = hashlib.md5(b"hello world").hexdigest()
    assert list(v) == [float("0123456789abcdef".index(c)) for c in h]


def test_deterministic_model_matches_manual_sigmoid():
    """The md5hex model's predict_proba must equal sigmoid(w . digits + b)
    computed by hand — the arithmetic the full-pipeline DuckDB oracle
    renders (exact: integer features x binary-fraction weights)."""
    import math

    from catalog_pii_scanner_spark.operators.embeddings import (
        deterministic_head_weights, deterministic_model, md5hex_embed)
    model = deterministic_model()
    text = "Contact XXXX Xxxxx via xxxx@x.io"
    probs = model.predict_proba([text])[0]
    x = md5hex_embed(text)
    for t, p in probs.items():
        w = deterministic_head_weights(t)
        z = sum(float(x[j]) * float(w[j]) for j in range(32)) + float(w[32])
        assert p == pytest.approx(1.0 / (1.0 + math.exp(-z)), abs=1e-15)


def test_deterministic_model_persistence_keeps_embedder(tmp_path_factory):
    from catalog_pii_scanner_spark.operators.embeddings import (
        EmbedModel, deterministic_model)
    model = deterministic_model()
    path = str(tmp_path_factory.mktemp("model") / "det.npz")
    model.save(path)
    back = EmbedModel.load(path)
    assert back.embedder == "md5hex"
    texts = ["a b c", "x y z"]
    assert back.predict_proba(texts) == model.predict_proba(texts)
