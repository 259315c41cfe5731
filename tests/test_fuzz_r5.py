"""Seeded random differentials for the round-5 operators: each Spark
implementation is checked against an independent brute-force Python
re-implementation on randomized corpora the fixed testdata never covers
(random token streams with planted duplicate spans; PII-dense texts with
repeated and adjacent entities)."""

from __future__ import annotations

import random
import re

import pytest


# --- corpus_substring_dedup vs brute force -----------------------------------

def _brute_substring_stats(texts: dict[int, str], w: int):
    """Reference implementation: windows per doc, global cross-doc dup
    flags, maximal run per doc."""
    wins: dict[int, list[str]] = {}
    for did, t in texts.items():
        toks = re.split(" +", t)
        wins[did] = [" ".join(toks[i:i + w])
                     for i in range(max(len(toks) - w + 1, 0))]
    owners: dict[str, set[int]] = {}
    for did, ws in wins.items():
        for g in ws:
            owners.setdefault(g, set()).add(did)
    out = {}
    for did, ws in wins.items():
        if not ws:
            continue
        dup = [len(owners[g]) > 1 for g in ws]
        n_dup = sum(dup)
        best = cur = 0
        for f in dup:
            cur = cur + 1 if f else 0
            best = max(best, cur)
        out[did] = (len(ws), n_dup, round(n_dup / len(ws), 6), best)
    return out


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_substring_dedup_matches_brute_force(spark, seed):
    from catalog_pii_scanner_spark.operators.corpus import (
        SUBSTR_W, substring_dup_docs)
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)]
    texts: dict[int, str] = {}
    # random docs, some sharing planted runs, some too short for windows
    planted = " ".join(rng.choices(vocab, k=SUBSTR_W + rng.randrange(5)))
    for did in range(30):
        n = rng.randrange(0, 30)
        toks = rng.choices(vocab, k=n)
        if rng.random() < 0.4:
            at = rng.randrange(0, len(toks) + 1)
            toks[at:at] = planted.split(" ")
        texts[did] = " ".join(toks)
    texts[97] = planted                      # exactly the planted run
    texts[98] = ""                           # empty text
    texts[99] = "solo"                       # shorter than W
    df = spark.createDataFrame(list(texts.items()),
                               "doc_id bigint, text string")
    got = {r.doc_id: (r.n_windows, r.n_dup_windows, r.dup_ratio,
                      r.max_dup_run)
           for r in substring_dup_docs(df).collect()}
    assert got == _brute_substring_stats(texts, SUBSTR_W)


# --- extract_candidates_pdf vs independent finditer --------------------------

def _brute_spans(text: str):
    """Independent re-implementation straight from the reference's
    semantics (reference rules.py:106-166): per family finditer, checksum
    gates, exact +/-8 dob window."""
    from catalog_pii_scanner_spark.functions.checksums import (
        luhn_ok, verhoeff_ok)
    from catalog_pii_scanner_spark.operators.rules import (
        DOB_BOOST, RULES, bounded_pattern)
    out = []
    for r in RULES:
        for m in re.finditer(bounded_pattern(r), text, re.ASCII):
            s, e, match = m.start(), m.end(), m.group(0)
            if r.validator == "luhn" and not luhn_ok(match):
                continue
            if r.validator == "verhoeff12" and not verhoeff_ok(match):
                continue
            conf = r.confidence
            if r.pii_type == "DATE":
                ctx = text[max(0, s - 8):e + 8].lower()
                if "dob" in ctx or "birth" in ctx:
                    conf += DOB_BOOST
            out.append((s + 1, e + 1, r.pii_type, match, round(conf, 6)))
    return sorted(out)


@pytest.mark.parametrize("seed", [21, 22])
def test_pdf_extraction_matches_brute_force_on_dense_texts(spark, seed):
    rng = random.Random(seed)
    entities = ["jane@x.io", "123-45-6789", "4111 1111 1111 1111",
                "(555) 867-5309", "aa:bb:cc:dd:ee:ff", "1990-03-14",
                "31/12/1990", "ABCDE1234F", "10.0.0.1", "John Smith",
                "2345 6789 0124", "1234 5678 9012",      # aadhaar ok/bad
                "4111 1111 1111 1112"]                    # luhn bad
    fill = ["dob", "birth", "x", "yy", "note", ",", ";", "-"]
    texts = []
    for i in range(40):
        parts = []
        for _ in range(rng.randrange(1, 8)):
            parts.append(rng.choice(entities) if rng.random() < 0.6
                         else rng.choice(fill))
        texts.append((i, " ".join(parts)))
    from catalog_pii_scanner_spark.operators.rules import (
        extract_candidates_pdf)
    df = spark.createDataFrame(texts, "text_id bigint, value string")
    rows = extract_candidates_pdf(df, keep_cols=("text_id",)).collect()
    got: dict[int, list] = {i: [] for i, _ in texts}
    for r in rows:
        got[r.text_id].append((r.pstart, r.pend, r.pii_type,
                               r.match_text, round(r.rule_confidence, 6)))
    for i, t in texts:
        assert sorted(got[i]) == _brute_spans(t), (i, t)
