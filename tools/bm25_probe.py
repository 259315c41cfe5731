"""BM25 query-count scaling probe (r6 verdict item #7): the salted
two-phase top-k was gated at 3 literal queries, but the LLM-pipeline use
case (eval-set mining, decontamination audits) runs thousands. Measure
wall-clock at sf0.1 for 3 / 100 / 1000 synthetic queries and report
seconds-per-query — the broadcast term table and the per-(query, salt)
partial window must stay sub-linear per query as the query count grows
(the corpus-side aggs are computed once regardless of query count).

Usage: python tools/bm25_probe.py [sf_dir]
Prints one JSON line per query-count plus a summary.
"""

from __future__ import annotations

import json
import random
import sys
import time

sys.path.insert(0, ".")

VOCAB = (
    "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "value", "vector", "window")


def synth_queries(n: int, seed: int = 11):
    rng = random.Random(seed)
    out = []
    for qid in range(n):
        k = rng.randint(2, 4)
        out.append((qid, " ".join(rng.sample(VOCAB, k))))
    return tuple(out)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from catalog_pii_scanner_spark.operators.corpus import bm25_topk_docs
    from catalog_pii_scanner_spark.session import get_spark
    spark = get_spark("bm25probe")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()  # warm scan
    results = []
    for nq in (3, 100, 1000):
        qs = synth_queries(nq)
        best = None
        for _ in range(2):
            t0 = time.time()
            n_rows = bm25_topk_docs(docs, queries=qs).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
        rec = {"n_queries": nq, "rows": n_rows,
               "sec": round(best, 2),
               "ms_per_query": round(1000 * best / nq, 1)}
        results.append(rec)
        print(json.dumps(rec), flush=True)
    base = results[0]["sec"]
    print(json.dumps({
        "summary": "bm25_query_scaling", "sf_dir": sf_dir,
        "sec_3q": results[0]["sec"], "sec_100q": results[1]["sec"],
        "sec_1000q": results[2]["sec"],
        "x333_queries_cost_ratio": round(results[2]["sec"] / base, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
