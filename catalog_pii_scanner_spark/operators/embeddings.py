"""Embedding classifier operators (reference E1-E4,
src/catalog_pii_scanner/embeddings.py).

Reference shape: SBERT all-MiniLM-L6-v2 normalized embeddings with an
offline deterministic fallback (seeded normal vectors, embeddings.py:63-70),
a per-class one-vs-rest logistic head (sklearn Pipeline, embeddings.py:
72-138), joblib persistence. Trained on redacted +/-48-char contexts of
gold spans with the span masked.

This environment ships numpy but not sklearn/SBERT, so:
- E1 encode: deterministic offline embedder — per-text seeded
  ``RandomState(md5(text))`` normal vector, L2-normalized (dimension 32,
  matching the reference's fallback). Per-text seeding (vs the reference's
  per-batch seed 42) makes the embedding a pure function of the text, so
  results are independent of batching/partitioning — required for a
  distributed engine.
- E2/E3 heads: one-vs-rest logistic regression implemented directly in
  numpy (full-batch gradient descent, fixed iterations/step => exactly
  reproducible), with the reference's trivial-estimator fallback for
  all-0/all-1 classes.
- E4 persistence: plain .npz (no joblib dependency).

Spark shape: encode+predict run in ONE mapInPandas stage (Arrow batches,
numpy matmul per batch); training collects the (small) labeled contexts
to the driver exactly like the reference does.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pii_types import ALL_PII_TYPES

EMBED_DIM = 32


def embed_text(text: str) -> np.ndarray:
    """E1 offline embedder: deterministic per-text normal vector."""
    seed = int.from_bytes(
        hashlib.md5(text.encode("utf-8")).digest()[:4], "big")
    v = np.random.RandomState(seed).normal(size=EMBED_DIM)
    n = np.linalg.norm(v)
    return (v / n if n else v).astype(np.float64)


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


@dataclass
class EmbedModel:
    """OvR logistic heads over the offline embedding space (E2/E3)."""
    #: type -> ("logistic", w[dim+1]) | ("trivial", constant_p)
    heads: dict[str, tuple] = field(default_factory=dict)

    def fit(self, texts: list[str], labels: list[str],
            lr: float = 0.5, iters: int = 300) -> "EmbedModel":
        X = np.stack([embed_text(t) for t in texts])
        Xb = np.hstack([X, np.ones((len(X), 1))])
        for t in sorted(set(labels) & set(ALL_PII_TYPES)):
            y = np.array([1.0 if l == t else 0.0 for l in labels])
            if y.min() == y.max():  # reference's trivial-estimator fallback
                self.heads[t] = ("trivial", float(y[0]))
                continue
            # balanced class weights, like the reference's sklearn config
            w_pos = len(y) / (2.0 * y.sum())
            w_neg = len(y) / (2.0 * (len(y) - y.sum()))
            sw = np.where(y == 1.0, w_pos, w_neg)
            w = np.zeros(Xb.shape[1])
            for _ in range(iters):
                p = _sigmoid(Xb @ w)
                w -= lr * (Xb.T @ ((p - y) * sw)) / len(y)
            self.heads[t] = ("logistic", w)
        return self

    def predict_proba(self, texts: list[str]) -> list[dict[str, float]]:
        if not self.heads:  # no classifier -> all-zeros (reference)
            return [{} for _ in texts]
        X = np.stack([embed_text(t) for t in texts])
        Xb = np.hstack([X, np.ones((len(X), 1))])
        out: list[dict[str, float]] = [{} for _ in texts]
        for t, (kind, param) in sorted(self.heads.items()):
            probs = (np.full(len(texts), param) if kind == "trivial"
                     else _sigmoid(Xb @ param))
            for i, p in enumerate(probs):
                out[i][t] = float(p)
        return out

    # E4 persistence ---------------------------------------------------------
    def save(self, path: str) -> None:
        arrays = {}
        meta = []
        for t, (kind, param) in self.heads.items():
            meta.append(f"{t}:{kind}")
            arrays[t] = (np.asarray([param]) if kind == "trivial"
                         else np.asarray(param))
        np.savez(path, __meta__=np.array(meta), **arrays)

    @classmethod
    def load(cls, path: str) -> "EmbedModel":
        data = np.load(path, allow_pickle=False)
        model = cls()
        for entry in data["__meta__"]:
            t, kind = str(entry).split(":")
            arr = data[t]
            model.heads[t] = (
                ("trivial", float(arr[0])) if kind == "trivial"
                else ("logistic", arr))
        return model


def embed_probs(df: DataFrame, model: EmbedModel,
                text_col: str = "context",
                out_col: str = "embed_probs") -> DataFrame:
    """E1+E2 as one Arrow-batched stage. The model rides the closure (tiny
    — per-type weight vectors); heavyweight models would ship via
    SparkContext.addFile + executor-global lazy load instead."""
    heads = model.heads
    fields = [f.name for f in df.schema.fields]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} map<string,double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = EmbedModel(heads)
        for pdf in batches:
            probs = local.predict_proba(list(pdf[text_col]))
            pdf = pdf.copy()
            pdf[out_col] = probs
            yield pdf[fields + [out_col]]

    return df.mapInPandas(run, out_schema)
