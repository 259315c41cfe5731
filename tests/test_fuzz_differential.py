"""Randomized (seeded) engine-vs-oracle differential over a PII-dense
corpus: random documents with embedded emails, phones, SSNs, and card
numbers — HALF of the cards deliberately failing Luhn — so the regex
families, the checksum gate, the density aggregation, and the
anonymization fold are all compared against DuckDB on content the fixed
testdata never contains."""

from __future__ import annotations

import random

import duckdb

from catalog_pii_scanner_spark.functions.checksums import luhn_ok


def _luhn_fix(digits15: str) -> str:
    """Append the check digit that makes a 16-digit Luhn-valid number."""
    for d in "0123456789":
        if luhn_ok(digits15 + d):
            return digits15 + d
    raise AssertionError("unreachable")


def _corpus(seed: int = 20260814, n: int = 150):
    rng = random.Random(seed)
    words = [f"word{i}" for i in range(200)]
    rows = []
    for i in range(n):
        parts = [rng.choice(words) for _ in range(rng.randint(3, 30))]
        r = rng.random()
        if r < 0.25:
            parts.insert(rng.randrange(len(parts)),
                         f"user{rng.randrange(999)}@mail{i % 7}.org")
        elif r < 0.45:
            parts.append(f"call 5{rng.randrange(10, 99)}-"
                         f"{rng.randrange(100, 999)}-"
                         f"{rng.randrange(1000, 9999)}")
        elif r < 0.6:
            parts.append(f"ssn {rng.randrange(100, 999)}-"
                         f"{rng.randrange(10, 99)}-"
                         f"{rng.randrange(1000, 9999)}")
        elif r < 0.8:
            base = "".join(str(rng.randrange(10)) for _ in range(15))
            card = _luhn_fix(base)
            if r >= 0.7:  # make half the cards FAIL the checksum
                bad = (int(card[-1]) + 1) % 10
                card = card[:-1] + str(bad)
            parts.append(f"card {card}")
        text = " ".join(parts)
        rows.append((i, text, "en", "fuzz", len(text)))
    return rows


def _fingerprint(cols, rows):
    import sys
    sys.path.insert(0, ".")
    from tools.selfcheck import frame_fingerprint
    return frame_fingerprint(list(cols), [tuple(r) for r in rows])


def test_fuzz_density_and_anonymize_match_oracle(spark, tmp_path):
    from catalog_pii_scanner_spark.operators.pii_docs import (
        anonymize_docs, corpus_anonymize_oracle_sql, doc_pii_density_docs,
        doc_pii_density_oracle_sql)
    rows = _corpus()
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{d}/documents.parquet/*.parquet'")

    # the oracle builders augment internally; the engine queries run the
    # same augmentation path as the driver-contract entries
    from catalog_pii_scanner_spark.operators.pii_docs import augment_docs
    docs = spark.read.parquet(f"{d}/documents.parquet")

    sdf = doc_pii_density_docs(augment_docs(docs))
    s_fp = _fingerprint(sdf.columns, sdf.collect())
    cur = con.execute(doc_pii_density_oracle_sql())
    o_fp = _fingerprint([c[0] for c in cur.description], cur.fetchall())
    assert s_fp == o_fp

    sdf = anonymize_docs(augment_docs(docs))
    s_fp = _fingerprint(sdf.columns, sdf.collect())
    cur = con.execute(corpus_anonymize_oracle_sql())
    o_fp = _fingerprint([c[0] for c in cur.description], cur.fetchall())
    assert s_fp == o_fp

    # sanity: the corpus really exercised the checksum gate both ways —
    # some Luhn-valid cards detected, and the raw texts contain cards
    # that were NOT detected (failed checksum)
    dens = {r.doc_id: r for r in
            doc_pii_density_docs(docs).collect()}
    texts = {i: t for i, t, *_ in rows}
    card_docs = [i for i, t in texts.items() if " card " in f" {t}"]
    detected = [i for i in card_docs
                if "CREDIT_CARD" in dens[i].pii_types_csv]
    undetected = [i for i in card_docs
                  if "CREDIT_CARD" not in dens[i].pii_types_csv]
    assert detected and undetected, (len(card_docs), len(detected))
