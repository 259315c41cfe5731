"""Scaling-slope probe: measure wall-time at sf0.1 vs a ~10x re-keyed
corpus (the sf1 stand-in) for the headline scan, the dedup family's
heaviest members, the three BLAS ANN serving paths, and the skew-hardened
sessionization twin under a power-law hot key.

Corpus construction (the edge_sweep re-key trick, scaled):
- every copied table gets collision-free keys ``K*id + copy``;
- documents get a per-copy text prefix ("cN ") so copies stay NEAR-dups
  (the near-dup pair structure grows linearly, like a real bigger crawl,
  instead of exploding into exact duplicates);
- embeddings copies 1..K-1 are keyed ``10*id + copy``, which can never be
  ``% 50 == 0`` — so the ANN QUERY set stays exactly the sf0.1 one while
  the served corpus grows 10x (the serving-scale question is corpus
  growth at fixed query load). Copy 0 keeps original ids (rare id
  collisions with copies are harmless for a timing probe);
- region/nation stay single-copy (5/25 rows);
- the skew corpus pins user 0 on ~30% of 10x events (event_id % 10 < 3).

Caveat, documented: numeric key columns become distinct across copies but
text columns repeat 10x, so the scan's candidate-DISTINCT output stays
sf0.1-sized; the melt + regex + distinct-shuffle input (the dominant
cost) still scales 10x.

Usage: python tools/scale_probe.py [--rebuild] [query ...]
Prints one JSON line per (query, scale) and a summary slope table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = int(os.environ.get("SPARK_GRAFT_PROBE_K", "10"))
N_RUNS = int(os.environ.get("SPARK_GRAFT_PROBE_N", "2"))
X10 = f"/tmp/cpss_sfx{K}"
SKEW = f"/tmp/cpss_sfskew{K}"

#: (table, key columns to re-key)
REKEY = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
}

QUERIES = ["pii_scan_catalog_tables", "dedup_keep_list",
           "dedup_ngram_jaccard", "dedup_containment",
           "ann_cosine_matmul", "ann_lsh_matmul", "ann_ivf_matmul",
           "events_sessions", "events_sessions_salted"]

#: query -> declared input tables. The K > 10 embeddings guard is
#: DERIVED from this map, fail-closed (r12 ADVICE: the old
#: ann_*/embed_* name-prefix heuristic would silently bypass a future
#: embeddings-reading query named outside those prefixes — now an
#: UNDECLARED query cannot be probed at K > 10 at all until its
#: inputs are declared here).
QUERY_INPUTS: dict[str, tuple[str, ...]] = {
    "pii_scan_catalog_tables": ("region", "nation", "customer",
                                "supplier", "part", "orders",
                                "lineitem", "events", "documents"),
    "pii_incremental_scan": ("region", "nation", "customer", "supplier",
                             "part", "orders", "lineitem", "events",
                             "documents"),
    "findings_merge_upsert": ("region", "nation", "customer", "supplier",
                              "part", "orders", "lineitem", "events",
                              "documents"),
    "writeback_diff_plan": ("region", "nation", "customer", "supplier",
                            "part", "orders", "lineitem", "events",
                            "documents"),
    "sample_columns_topn": ("region", "nation", "customer", "supplier",
                            "part", "orders", "lineitem", "events",
                            "documents"),
    "dedup_keep_list": ("documents",),
    "dedup_ngram_jaccard": ("documents",),
    "dedup_containment": ("documents",),
    "dedup_embed_cosine": ("embeddings",),
    "ann_cosine_matmul": ("embeddings",),
    "ann_lsh_matmul": ("embeddings",),
    "ann_ivf_matmul": ("embeddings",),
    "ann_ivfpq_trained_topk": ("embeddings",),
    "embed_semantic_decon": ("embeddings",),
    "events_sessions": ("events",),
    "events_sessions_salted": ("events",),
    "stream_events_recent_score": ("events",),
    "orders_basket_pairs": ("orders", "lineitem"),
    "corpus_collocations": ("documents",),
    "corpus_ngram_novelty": ("documents",),
    "corpus_tokenizer_fertility": ("documents",),
    "orders_rfm_segments": ("orders",),
}


def build(spark) -> None:
    from functools import reduce

    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from catalog_pii_scanner_spark.sources.melt import read_table

    os.makedirs(X10, exist_ok=True)
    for t in ("region", "nation"):
        spark.read.parquet(f"{BASE}/{t}.parquet").write \
            .mode("overwrite").parquet(f"{X10}/{t}.parquet")
    for t, keys in REKEY.items():
        df = read_table(spark, BASE, t)
        copies = []
        for c in range(K):
            d = df
            for kcol in keys:
                d = d.withColumn(kcol, F.col(kcol) * K + F.lit(c))
            if t == "documents":
                d = d.withColumn(
                    "text", F.when(F.col("text").isNotNull(),
                                   F.concat(F.lit(f"c{c} "),
                                            F.col("text"))))
            copies.append(d)
        reduce(DataFrame.unionByName, copies).write \
            .mode("overwrite").parquet(f"{X10}/{t}.parquet")
    # the `10 * id + c` scheme keeps copies 1..9 out of the `% 50 == 0`
    # ANN query set and collision-free ONLY for <= 10 copies — at
    # K > 10 the embeddings table caps at 10 copies (disclosed: a
    # K=30 corpus grows embeddings 10x, everything else 30x; the
    # big-K probes target the scan/dedup/events families)
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    copies = [emb]
    for c in range(1, min(K, 10)):
        copies.append(emb.withColumn(
            "vec_id", F.col("vec_id") * 10 + F.lit(c)))
    reduce(DataFrame.unionByName, copies).write \
        .mode("overwrite").parquet(f"{X10}/embeddings.parquet")
    # power-law events: ~30% of 10x rows on one user
    os.makedirs(SKEW, exist_ok=True)
    ev = spark.read.parquet(f"{X10}/events.parquet")
    ev.withColumn(
        "user_id", F.when(F.col("event_id") % 10 < 3,
                          F.lit(0)).otherwise(F.col("user_id"))) \
        .write.mode("overwrite").parquet(f"{SKEW}/events.parquet")


def main() -> int:
    argv = [a for a in sys.argv[1:]]
    rebuild = "--rebuild" in argv
    names = [a for a in argv if not a.startswith("--")] or QUERIES
    if K > 10:
        undeclared = [n for n in names if n not in QUERY_INPUTS]
        if undeclared:
            raise SystemExit(
                f"K={K} > 10 but {undeclared} have no QUERY_INPUTS "
                f"declaration — declare their input tables before "
                f"probing past the embeddings-copy cap (fail-closed: "
                f"r12 ADVICE)")
        bad = [n for n in names if "embeddings" in QUERY_INPUTS[n]]
        if bad:
            raise SystemExit(
                f"K={K} > 10 but the embeddings table only supports 10 "
                f"copies — probing {bad} at this K would record a "
                f"silently-understated slope; probe those at K <= 10")
        print(f"# NOTE: K={K} — embeddings table capped at 10 copies "
              f"(non-embedding tables grow {K}x)")

    import __spark_entry__ as E
    from catalog_pii_scanner_spark.session import get_spark

    spark = get_spark("scale_probe")
    if rebuild or not os.path.exists(f"{X10}/documents.parquet") \
            or not os.path.exists(f"{SKEW}/events.parquet"):
        t0 = time.time()
        build(spark)
        print(f"# built {X10} + {SKEW} in {time.time() - t0:.1f}s")

    q = E.queries()
    results: dict[str, dict[str, float]] = {}
    runs = [(n, sf, d) for n in names
            for sf, d in (("sf0.1", BASE), ("sf1x", X10))
            if not (n.startswith("events_sessions") and sf == "sf1x")]
    # sessionization probes run on the SKEW corpus at 10x, that's the
    # question being asked (hot key), not plain scale
    runs += [(n, "sf1x_skew", SKEW) for n in names
             if n.startswith("events_sessions")]
    for name, label, d in runs:
        best, n_rows = None, None
        for _ in range(N_RUNS):  # warm best-of: planning noise in run 1
            # Evict the entry-level shared-relation memos BEFORE each
            # timed run: clearCache() drops only SQL-cached relations,
            # not localCheckpoint blocks or the memo dicts, so run 2
            # of a memoized query (catalog basis, shingles, LSH chain,
            # demo melt) would otherwise skip exactly the derivation
            # whose scaling this probe measures and silently
            # understate the slope.
            E.clear_session_memos()
            t0 = time.time()
            n_rows = q[name](spark, d).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
        results.setdefault(name, {})[label] = round(best, 2)
        print(json.dumps({"query": name, "scale": label,
                          "sec": round(best, 2), "rows": n_rows}),
              flush=True)
    print("\n| query | sf0.1 s | 10x s | slope (x) |")
    print("|---|---|---|---|")
    for name, r in results.items():
        a = r.get("sf0.1")
        b = r.get("sf1x", r.get("sf1x_skew"))
        slope = round(b / a, 1) if a and b else None
        tag = " (skew)" if "sf1x_skew" in r else ""
        print(f"| {name}{tag} | {a} | {b} | {slope} |")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
