"""Trained-PQ serving-shape probe (driver round 8, verdict item 4).

``ann_pq_trained_matmul``'s registered entry is a parity gate
(corpus_mod = train_mod = 10 so it shares the trained template's
oracle). This probe runs the shape the docstring ADVERTISES for
production: train on the bounded sample, then serve the FULL corpus —
here a 10x re-keyed sf0.1 embeddings table (20 000 vectors) against
1 000 query vectors — and reports ms/query for the serving pass with
the training cost split out.

Corpus: copies 1..9 keyed ``vec_id + 2000*copy`` (collision-free);
``query_mod=20`` then selects exactly 100 originals + 900 copies =
1 000 queries. Training stays on the vec_id % 10 == 0 sample of the
10x corpus (2 000 vectors — bounded, the FAISS train-on-sample
recipe).

Usage: python tools/pq_serving_probe.py
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/cpss_pq_serving_x10"
N_COPIES = 10
QUERY_MOD = 20
TRAIN_MOD = 10


def main() -> int:
    from pyspark.sql import functions as F

    from catalog_pii_scanner_spark.operators.simsearch import (
        _trained_pq_codebooks, ann_pq_trained_matmul)
    from catalog_pii_scanner_spark.session import get_spark

    spark = get_spark("pq-serving-probe")
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    n0 = emb.count()
    if not os.path.isdir(OUT):
        parts = [emb] + [
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(n0 * c))
            for c in range(1, N_COPIES)]
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.repartition(32).write.mode("overwrite") \
            .parquet(f"{OUT}/embeddings.parquet")
    nbig = spark.read.parquet(f"{OUT}/embeddings.parquet").count()

    # The Lloyd-unrolled training SQL is driver/codegen-heavy and its
    # wall time swings run-to-run at this scale, so both measurements
    # are warmed once and taken best-of-2 (the bench.py discipline).
    spark.read.parquet(f"{OUT}/embeddings.parquet") \
        .createOrReplaceTempView("cpss_embeddings")

    def timed(fn, runs=2):
        best = float("inf")
        out = None
        for _ in range(runs):
            t0 = time.time()
            out = fn()
            best = min(best, time.time() - t0)
        return best, out

    _trained_pq_codebooks(spark, "cpss_embeddings", TRAIN_MOD)  # warm
    train_s, _ = timed(lambda: _trained_pq_codebooks(
        spark, "cpss_embeddings", TRAIN_MOD))
    total_s, rows = timed(lambda: ann_pq_trained_matmul(
        spark, OUT, corpus_mod=1, train_mod=TRAIN_MOD,
        query_mod=QUERY_MOD).collect())
    nq = len({r.query_id for r in rows})
    serve_s = max(total_s - train_s, 0.0)
    print(json.dumps({
        "probe": "pq_trained_serving_x10",
        "corpus_vectors": nbig, "n_queries": nq,
        "train_sample_vectors": nbig // TRAIN_MOD,
        "train_sec": round(train_s, 2),
        "serve_sec": round(serve_s, 2),
        "total_sec": round(total_s, 2),
        "ms_per_query_serve": round(1000 * serve_s / max(nq, 1), 3),
        "ms_per_query_total": round(1000 * total_s / max(nq, 1), 3),
        "result_rows": len(rows),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
