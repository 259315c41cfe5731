"""phash band-bucket-cap probe at 10x (driver round 8, verdict item 5).

The round-7 10x scaling row for ``multimodal_phash_dedup`` measured the
CAP GUARD, not linear growth: the synthetic identical-image classes at
10x (~thousands of docs per band bucket) exceed PHASH_MAX_BUCKET=400,
so whole buckets drop and the pair output collapses. The correct scale
posture is to grow the cap with corpus size; this probe runs BOTH cap
settings on the same 10x corpus and reports pair recall of the capped
default against the scaled cap, plus the excluded-bucket census for
each — the numbers PERF.md's row cites.

Corpus: documents copies 1..9 keyed ``doc_id + n0*copy``
(collision-free; copies land in the same near-dup classes as their
originals since class = doc_id % 60, so bucket sizes genuinely grow
~10x — the worst case for the cap).

Usage: python tools/phash_cap_probe.py
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/cpss_phash_cap_x10"
N_COPIES = 10
CAP_DEFAULT = 400
CAP_SCALED = 4000


def main() -> int:
    from pyspark.sql import functions as F

    from catalog_pii_scanner_spark.operators.multimodal import (
        phash_dedup_query, phash_excluded_buckets)
    from catalog_pii_scanner_spark.session import get_spark

    spark = get_spark("phash-cap-probe")
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    n0 = docs.count()
    if not os.path.isdir(OUT):
        parts = [docs] + [
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(n0 * c))
            for c in range(1, N_COPIES)]
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.repartition(32).write.mode("overwrite") \
            .parquet(f"{OUT}/documents.parquet")

    res = {}
    for label, cap in (("default", CAP_DEFAULT), ("scaled", CAP_SCALED)):
        t0 = time.time()
        pairs = phash_dedup_query(spark, OUT, max_bucket=cap)
        n_pairs = pairs.count()
        wall = time.time() - t0
        exc = phash_excluded_buckets(spark, OUT, max_bucket=cap)
        exc_rows = exc.agg(
            F.count("*").alias("n_buckets"),
            F.coalesce(F.sum("n_docs"), F.lit(0)).alias("docs_in_excluded")
        ).collect()[0]
        res[label] = {"cap": cap, "n_pairs": n_pairs,
                      "wall_sec": round(wall, 2),
                      "excluded_buckets": exc_rows["n_buckets"],
                      "docs_in_excluded_buckets":
                          int(exc_rows["docs_in_excluded"])}
    recall = (res["default"]["n_pairs"]
              / max(res["scaled"]["n_pairs"], 1))
    res["pair_recall_default_vs_scaled"] = round(recall, 4)
    res["corpus_docs"] = n0 * N_COPIES
    print(json.dumps(res))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
