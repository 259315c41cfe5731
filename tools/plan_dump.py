"""Dump ``explain("formatted")`` for named queries to files.

Deliverable helper for the optimization rounds: captures the physical
plan of each named query into <outdir>/<query>_<tag>.txt so before/after
plan claims in OPTIMIZATION_r*.md are checkable without running Spark.

    python tools/plan_dump.py OUTDIR TAG QUERY [QUERY ...]

Runs against $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) so the
captured plans match the bench scale.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    outdir, tag, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as E
    from catalog_pii_scanner_spark.session import get_spark

    spark = get_spark("plan-dump")
    qs = E.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = (df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
