"""Degenerate-input sweep: run EVERY queries()/oracle_sql() pair against
an empty or near-empty corpus and compare engines, exactly like the
driver's gate. Degenerate inputs (zero rows, empty/NULL text, zero-norm
embeddings, single-event groups) are where engine semantics diverge
(NULL vs NaN division, empty aggregations, sequences over NULL bounds) —
at 100 TB every one of these shapes occurs somewhere in the data.

    python tools/edge_sweep.py empty|micro [query ...]

Generates /tmp/cpss_edge_<mode>/ from sf0.001 via DuckDB, then reuses
selfcheck's comparison.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import duckdb

SRC = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def gen(mode: str) -> str:
    out = f"/tmp/cpss_edge_{mode}"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    con = duckdb.connect()
    limit = 0 if mode == "empty" else 2
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet') "
            f"LIMIT {limit}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    if mode == "micro":
        # edge rows: empty text, NULL text, 1-char doc; lone event type
        # with a single row (degenerate stats group); zero-norm embedding
        con.execute(f"""
COPY (
  (SELECT * FROM read_parquet('{SRC}/documents.parquet') LIMIT 2)
  UNION ALL SELECT 9001, '', 'en', 'edge', 0
  UNION ALL SELECT 9002, NULL, 'en', 'edge', NULL
  UNION ALL SELECT 9003, 'x', NULL, 'edge', 1
  UNION ALL SELECT 9007, 'lone a@b.io span 555-867-5309', 'en', 'edge', 29
) TO '{out}/documents.parquet' (FORMAT PARQUET)""")
        con.execute(f"""
COPY (
  (SELECT * FROM read_parquet('{SRC}/events.parquet') LIMIT 2)
  UNION ALL SELECT 900001, TIMESTAMP '2024-02-01 00:00:00', 9001,
                   'lonely', 1.5, NULL
  UNION ALL SELECT 900002, TIMESTAMP '2024-02-02 00:00:00', 9002,
                   'constpair', 2.0, '{{}}'
  UNION ALL SELECT 900003, TIMESTAMP '2024-02-03 00:00:00', 9002,
                   'constpair', 2.0, '{{}}'
) TO '{out}/events.parquet' (FORMAT PARQUET)""")
        con.execute(f"""
COPY (
  (SELECT * FROM read_parquet('{SRC}/embeddings.parquet') LIMIT 2)
  UNION ALL
  SELECT 9050, CAST(list_transform(range(64), i -> 0.0) AS FLOAT[]), 0
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
    return out


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "micro"
    queries = sys.argv[2:]
    out = gen(mode)
    print(f"generated {out}", file=sys.stderr)
    return subprocess.call(
        [sys.executable, "tools/selfcheck.py", out, *queries])


if __name__ == "__main__":
    raise SystemExit(main())
