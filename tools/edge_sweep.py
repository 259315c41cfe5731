"""Degenerate- and randomized-input sweeps: run EVERY
queries()/oracle_sql() pair against a generated corpus and compare
engines, exactly like the driver's gate.

- ``empty``: zero rows, real schemas — empty aggregations, NULL bounds.
- ``micro``: 2 rows per table plus edge rows — empty/NULL text,
  zero-norm embeddings, single-event stats groups.
- ``fuzz``: a seeded RANDOM dataset — PII-dense documents (mixed
  Luhn-valid/-invalid cards, NULL/empty/multi-lang rows), random events
  with duplicate timestamps and session-boundary gaps, random
  embeddings with exact duplicates and a zero vector. The whole suite,
  differentially, on data the fixed corpora never contain.

    python tools/edge_sweep.py empty|micro|fuzz [query ...]

Generates /tmp/cpss_edge_<mode>/, then reuses selfcheck's comparison.
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


def _fuzz_docs(rng):
    words = [f"word{i}" for i in range(300)]
    rows = []
    for i in range(400):
        parts = [rng.choice(words) for _ in range(rng.randint(2, 40))]
        r = rng.random()
        if r < 0.2:
            parts.insert(rng.randrange(len(parts)),
                         f"user{rng.randrange(999)}@mail{i % 9}.org")
        elif r < 0.35:
            parts.append(f"call 5{rng.randrange(10, 99)}-"
                         f"{rng.randrange(100, 999)}-"
                         f"{rng.randrange(1000, 9999)}")
        elif r < 0.5:
            digits = "".join(str(rng.randrange(10)) for _ in range(16))
            parts.append(f"card {digits}")
        lang = rng.choice(["en", "fr", "de", None])
        src = rng.choice(["web", "books", "code"])
        text = " ".join(parts)
        rows.append((i, text, lang, src, len(text)))
    rows += [(9001, "", "en", "edge", 0), (9002, None, "en", "edge", None),
             (9003, "   ", None, "edge", 3)]
    return rows


def gen_fuzz(out: str) -> None:
    import datetime as dt
    import random

    import numpy as np
    import pandas as pd

    seed = int(os.environ.get("CPSS_FUZZ_SEED", "20260814"))
    rng = random.Random(seed)
    pd.DataFrame(_fuzz_docs(rng),
                 columns=["doc_id", "text", "lang", "source", "n_chars"]) \
        .astype({"doc_id": "int64", "n_chars": "Int64"}) \
        .to_parquet(f"{out}/documents.parquet", index=False)

    t0 = dt.datetime(2024, 3, 1)
    ev = []
    for i in range(3000):
        ev.append((i, t0 + dt.timedelta(
            seconds=rng.randrange(21 * 24 * 3600),
            microseconds=rng.randrange(1_000_000)),
            rng.randrange(50),
            rng.choice(["view", "click", "purchase", "error", "signup"]),
            round(rng.uniform(0, 500), 2), "{}"))
    base = dt.datetime(2024, 3, 25, 12, 0, 0)
    ev += [(4001, base, 900, "view", 1.0, "{}"),
           (4002, base, 900, "click", 2.0, "{}"),     # duplicate ts
           (4003, base + dt.timedelta(minutes=30), 900, "view", 3.0, "{}"),
           (4004, base, 901, "lonely", 4.0, None)]    # 1-row stats group
    pd.DataFrame(ev, columns=["event_id", "ts", "user_id", "event_type",
                              "value", "props"])         .to_parquet(f"{out}/events.parquet", index=False)

    # default run must reproduce the historical fuzz corpus exactly:
    # the numpy stream keeps its original fixed seed (42) for the
    # documented default seed VALUE — branching on the value, not on
    # env-var presence, so CPSS_FUZZ_SEED=20260814 set explicitly
    # reproduces the same corpus as leaving it unset (round-10 ADVICE)
    npr = np.random.RandomState(42 if seed == 20260814
                                else seed % (2**31))
    V = npr.randn(300, 64).astype(np.float32)
    V[7] = V[3]                      # exact duplicate pair
    V[11] = 0.0                      # zero-norm vector
    emb = pd.DataFrame({
        "vec_id": np.arange(300, dtype=np.int64),
        "embedding": [v.tolist() for v in V],
        "label": npr.randint(0, 4, 300).astype(np.int32),
    })
    emb.to_parquet(f"{out}/embeddings.parquet", index=False)


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "micro"
    queries = sys.argv[2:]
    if mode == "fuzz":
        out = f"/tmp/cpss_edge_{mode}"
        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out)
        con = duckdb.connect()
        # business tables come through whole: the scan/OLAP queries need
        # their real variety, and randomizing them adds nothing
        for t in TABLES:
            if t not in ("documents", "events", "embeddings"):
                con.execute(
                    f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))"
                    f" TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        gen_fuzz(out)
    else:
        out = gen(mode)
    print(f"generated {out}", file=sys.stderr)
    return subprocess.call(
        [sys.executable, "tools/selfcheck.py", out, *queries])


if __name__ == "__main__":
    raise SystemExit(main())
