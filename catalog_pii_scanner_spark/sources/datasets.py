"""Labeled-dataset sources (reference S7 JSONL reader + S8 synthetic
generator, src/catalog_pii_scanner/datasets.py).

S8 parity notes: the reference draws from 5 templates with random fillers
(email, phone, Luhn-valid CC, SSN, IP, name, ISO date) and emits exact
char-offset labels, n=500 seed=1234 defaults (datasets.py:76-120,
cli.py:295). Spark-first: generation is distributed — ``spark.range(n)``
with a deterministic per-row filler derivation (seeded off the row id), so
any executor count yields the identical dataset; labels are computed from
the assembled text by construction (template slot offsets), preserving the
reference's invariant ``text[start:end] == span_text``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LABELED_SCHEMA = (
    "text_id bigint, text string, "
    "labels array<struct<start:int, end:int, type:string, text:string>>")

FIRST = ("Alice", "Bob", "Carol", "David", "Emma", "Frank", "Grace")
LAST = ("Smith", "Jones", "Brown", "Taylor", "Lee", "Wilson", "Clark")


def _rng_ints(seed: int, row: int, n: int, mod: int) -> list[int]:
    """n deterministic ints in [0, mod) from md5(seed:row:i)."""
    out = []
    for i in range(n):
        h = hashlib.md5(f"{seed}:{row}:{i}".encode()).digest()
        out.append(int.from_bytes(h[:4], "big") % mod)
    return out


def _luhn_check_digit(partial: str) -> str:
    digits = [int(c) for c in partial]
    total = 0
    for i, d in enumerate(reversed(digits)):
        if i % 2 == 0:  # positions counted with the check digit appended
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return str((10 - total % 10) % 10)


def synth_example(row: int, seed: int = 1234) -> tuple[str, list]:
    """One labeled example: (text, labels)."""
    r = _rng_ints(seed, row, 10, 1_000_000)
    name = f"{FIRST[r[0] % len(FIRST)]} {LAST[r[1] % len(LAST)]}"
    email = f"user{r[2] % 10000}@example.com"
    phone = (f"({200 + r[3] % 800:03d}) {r[4] % 1000:03d}-"
             f"{r[5] % 10000:04d}")
    cc_partial = "4" + f"{r[6]:06d}" + f"{r[7]:06d}"[:8]
    cc = cc_partial + _luhn_check_digit(cc_partial)
    ssn = f"{100 + r[6] % 900:03d}-{10 + r[7] % 89:02d}-{1000 + r[8] % 9000:04d}"
    ip = ".".join(str(1 + (r[9] >> (8 * i)) % 254) for i in range(4))
    date = f"19{90 + r[8] % 10}-{1 + r[9] % 12:02d}-{1 + r[5] % 28:02d}"

    # Two templates carry unlabeled pattern-matching bait ("Support Team"
    # hits the weak PERSON rule; "234-56-7890" hits the SSN shape) so a
    # rules pass over the corpus yields false positives too — calibration
    # (F6) needs both classes, and the eval pipeline needs a non-trivial
    # precision story (the reference corpus is all-positive).
    templates = [
        ("Contact {name} via email {email} or phone {phone}.",
         [("name", "PERSON"), ("email", "EMAIL"),
          ("phone", "PHONE_NUMBER")]),
        ("Visa card {cc} expires on {date}. Ref 234-56-7890.",
         [("cc", "CREDIT_CARD"), ("date", "DATE")]),
        ("SSN for {name} is {ssn}. Regards Support Team.",
         [("name", "PERSON"), ("ssn", "SSN")]),
        ("Server IP {ip} logged a request from {name} on {date}.",
         [("ip", "IP_ADDRESS"), ("name", "PERSON"), ("date", "DATE")]),
        ("Primary contact: {email}. Secondary: {phone}.",
         [("email", "EMAIL"), ("phone", "PHONE_NUMBER")]),
    ]
    fillers = {"name": name, "email": email, "phone": phone, "cc": cc,
               "ssn": ssn, "ip": ip, "date": date}
    template, slots = templates[row % len(templates)]

    text = ""
    labels = []
    rest = template
    while "{" in rest:
        pre, after = rest.split("{", 1)
        slot, rest = after.split("}", 1)
        text += pre
        val = fillers[slot]
        slot_type = dict(slots)[slot]
        labels.append((len(text), len(text) + len(val), slot_type, val))
        text += val
    text += rest
    return text, labels


def generate_synthetic(spark: SparkSession, n: int = 500,
                       seed: int = 1234) -> DataFrame:
    """Distributed deterministic generation: same dataset for any
    partitioning/executor count."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, labels = [], []
            for row in pdf["id"]:
                t, ls = synth_example(int(row), seed)
                texts.append(t)
                labels.append([{"start": s, "end": e, "type": ty,
                                "text": tx} for s, e, ty, tx in ls])
            yield pd.DataFrame({"text_id": pdf["id"], "text": texts,
                                "labels": labels})

    return spark.range(n).mapInPandas(gen, LABELED_SCHEMA)


def load_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S7: JSONL labeled-example reader with the explicit schema."""
    return spark.read.schema(LABELED_SCHEMA).json(path)


def save_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)
