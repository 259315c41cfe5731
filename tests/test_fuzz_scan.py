"""Seeded fuzz differential over the CORE product path: the full scan
rollup (melt -> rule extraction -> checksum gate -> per-column findings)
on a random CRM-like table whose values include regex-hostile content —
quotes, backslashes, regex metacharacters, mixed PII with Luhn-valid and
-invalid cards — compared cell-for-cell against the DuckDB oracle."""

from __future__ import annotations

import random

import duckdb

from catalog_pii_scanner_spark.functions.checksums import luhn_ok


def _card(rng, valid: bool) -> str:
    base = "".join(str(rng.randrange(10)) for _ in range(15))
    for d in "0123456789":
        if luhn_ok(base + d) == valid:
            return base + d
    return base + "0"


def _rows(seed: int = 99, n: int = 120):
    rng = random.Random(seed)
    hostile = ["a(b", "c)d*", "x|y+", "[z]", "it's", 'say "hi"',
               "back\\slash", "dot.dot", "q?mark", "^caret$",
               # unicode: Java regex and DuckDB's RE2 agree on these
               # (verified by this differential, not assumed)
               "café münchen", "東京 2024", "naïve müller@straße.de",
               "émoji 🙂 here"]
    rows = []
    for i in range(n):
        email = (f"user{i}@ex{i % 5}.com" if rng.random() < 0.5
                 else rng.choice(hostile))
        phone = (f"5{rng.randrange(10, 99)}-{rng.randrange(100, 999)}-"
                 f"{rng.randrange(1000, 9999)}" if rng.random() < 0.5
                 else rng.choice(hostile))
        note_bits = [rng.choice(hostile + ["hello", "world"])
                     for _ in range(rng.randint(1, 6))]
        if rng.random() < 0.4:
            note_bits.append(f"card {_card(rng, rng.random() < 0.5)}")
        if rng.random() < 0.3:
            note_bits.append(f"ssn {rng.randrange(100, 999)}-"
                             f"{rng.randrange(10, 99)}-"
                             f"{rng.randrange(1000, 9999)}")
        rows.append((i, email, phone, " ".join(note_bits)))
    return rows


def test_fuzz_scan_rollup_matches_oracle(spark, tmp_path):
    import sys
    sys.path.insert(0, ".")
    from tools.selfcheck import frame_fingerprint
    from catalog_pii_scanner_spark import oracles
    from catalog_pii_scanner_spark.operators.findings import findings_rollup
    from catalog_pii_scanner_spark.sources.melt import melt_df

    cols = ("email", "phone", "notes")
    df = spark.createDataFrame(
        _rows(), "id bigint, email string, phone string, notes string")
    path = str(tmp_path / "fuzz_crm.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)

    sdf = findings_rollup(melt_df(spark.read.parquet(path),
                                  "fuzz_crm", cols))
    s_fp = frame_fingerprint(list(sdf.columns),
                             [tuple(r) for r in sdf.collect()])

    con = duckdb.connect()
    con.execute(f"CREATE VIEW fuzz_crm AS SELECT * FROM '{path}/*.parquet'")
    melted = "(" + " UNION ALL ".join(
        f"SELECT 'spark://fuzz_crm/{c}' AS column_ref, {c} AS value "
        f"FROM fuzz_crm" for c in cols) + ")"
    cur = con.execute(oracles.scan_findings_oracle(melted))
    o_fp = frame_fingerprint([c[0] for c in cur.description],
                             cur.fetchall())
    assert s_fp == o_fp

    # the corpus exercised the gate both ways: some CREDIT_CARD findings
    # (Luhn-valid) and fewer than the raw card count (invalid rejected)
    found = {(r.column_ref, r.pii_type) for r in sdf.collect()}
    assert ("spark://fuzz_crm/notes", "CREDIT_CARD") in found
    assert ("spark://fuzz_crm/email", "EMAIL") in found
    assert ("spark://fuzz_crm/phone", "PHONE_NUMBER") in found
