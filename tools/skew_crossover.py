"""Salted-sessionization crossover probe (round-6 brief item): measure
global session_window vs the (user, day)-bucketed salted twin at the 10x
probe scale under INCREASING hot-key intensity, so the deployment
guidance in events_sessions_salted's docstring carries a measured
events-per-hot-user number instead of a heuristic.

Corpora: the scale_probe 10x events re-key, with user 0 pinned on
p in {30%, 60%, 90%} of rows (event_id % 10 < {3, 6, 9}). Each corpus
reports the hot user's event count next to the two wall-times; the
crossover is the intensity where the salted twin first wins.

Usage: python tools/skew_crossover.py
Prints one JSON line per (intensity, query) and a markdown table for
PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = 3


def main() -> int:
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from catalog_pii_scanner_spark.session import get_spark

    from tools.scale_probe import X10, build

    spark = get_spark("skew_crossover")
    if not os.path.exists(f"{X10}/events.parquet"):
        build(spark)

    ev = spark.read.parquet(f"{X10}/events.parquet")
    corpora = []
    for pct in (30, 60, 90):
        d = f"/tmp/cpss_skew{pct}"
        if not os.path.exists(f"{d}/events.parquet"):
            os.makedirs(d, exist_ok=True)
            ev.withColumn(
                "user_id", F.when(F.col("event_id") % 10 < pct // 10,
                                  F.lit(0)).otherwise(F.col("user_id"))) \
                .write.mode("overwrite").parquet(f"{d}/events.parquet")
        hot = spark.read.parquet(f"{d}/events.parquet") \
            .where("user_id = 0").count()
        corpora.append((pct, d, hot))

    q = E.queries()
    rows = []
    for pct, d, hot in corpora:
        times = {}
        for name in ("events_sessions", "events_sessions_salted"):
            best = None
            for _ in range(N_RUNS):
                t0 = time.time()
                q[name](spark, d).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            times[name] = round(best, 2)
            print(json.dumps({"pct": pct, "hot_user_events": hot,
                              "query": name, "sec": times[name]}),
                  flush=True)
        rows.append((pct, hot, times["events_sessions"],
                     times["events_sessions_salted"]))

    print("\n| hot-key share | hot-user events | global s | salted s |"
          " winner |")
    print("|---|---|---|---|---|")
    for pct, hot, g, s in rows:
        print(f"| {pct}% | {hot:,} | {g} | {s} | "
              f"{'salted' if s < g else 'global'} |")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
