"""Per-query cost decomposition for the optimization rounds.

For each named query (default: the top-N by BENCH_DETAIL.json best
seconds), measures with the box otherwise idle:

- ``build``  — seconds to construct the DataFrame (py4j + eager memo
  builds inside the query fn),
- ``plan``   — seconds for ``explain("formatted")`` on the built frame
  (Catalyst analysis + optimization + physical planning, no execution),
- ``run1..runN`` — bench-methodology runs (fresh fn() + count() each),
  run1 after ``clear_session_memos()`` so it is the honest memo-cold
  cost, run2+ memo-warm like the bench's best-of-N.

Usage:
    python tools/bench_profile.py [--top K | name ...] [--runs N]
Writes /tmp/bench_profile.json and prints a table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    argv = sys.argv[1:]
    runs = 2
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    top_k = 0
    if argv and argv[0] == "--top":
        top_k = int(argv[1])
        argv = argv[2:]

    import __spark_entry__ as E
    from catalog_pii_scanner_spark.session import get_spark

    qs = E.queries()
    if top_k:
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH_DETAIL.json")) as f:
            detail = json.load(f)["queries"]
        names = [k for k, _ in sorted(detail.items(), key=lambda kv: -kv[1])
                 if k in qs][:top_k]
    else:
        names = argv or list(qs)

    spark = get_spark("bench_profile")
    try:
        E.entry(spark).count()  # JVM warm
    except Exception:
        pass

    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        E.clear_session_memos()
        spark.catalog.clearCache()
        rec: dict[str, float] = {}
        t0 = time.time()
        df = fn(spark, SF_DIR)
        rec["build"] = round(time.time() - t0, 3)
        t0 = time.time()
        df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        rec["plan"] = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(f"profile:{name}")
        for r in range(1, runs + 1):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.count()
            rec[f"run{r}"] = round(time.time() - t0, 3)
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        out[name] = rec
        print(f"{name:35s} build={rec['build']:6.2f} plan={rec['plan']:6.2f} "
              + " ".join(f"run{r}={rec[f'run{r}']:6.2f}"
                         for r in range(1, runs + 1)), flush=True)

    with open("/tmp/bench_profile.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
