"""Redaction invariants (reference tests/test_redaction.py +
tests/test_logging.py): shape-preserving mask, length preservation, and
the core guarantee — no raw span text survives into model inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from catalog_pii_scanner_spark.operators.findings import scan_values
from catalog_pii_scanner_spark.operators.redaction import candidate_contexts

TEXTS = [
    ("t1", "Contact John Smith at john@x.io or (555) 123-4567"),
    ("t2", "card 4111 1111 1111 1111 and ssn 078-05-1120"),
    ("t3", "aadhaar 2345 6789 0124 ip 10.0.0.1 mac aa:bb:cc:dd:ee:ff"),
]


@pytest.fixture(scope="module")
def redacted(spark):
    df = spark.createDataFrame(TEXTS, "column_ref string, value string")
    return candidate_contexts(scan_values(df)).collect()


def test_mask_shape_preserving(redacted):
    for r in redacted:
        assert len(r.masked_match) == len(r.match_text)
        for orig, masked in zip(r.match_text, r.masked_match):
            if orig.isdigit():
                assert masked == "0"
            elif orig.islower():
                assert masked == "x"
            elif orig.isupper():
                assert masked == "X"
            else:
                assert masked == orig


def test_redaction_guarantee_no_raw_pii_in_contexts(redacted):
    """R3: model inputs (contexts) never contain the raw span text."""
    assert redacted
    for r in redacted:
        assert r.match_text not in r.redacted_value
        assert r.match_text not in r.context


def test_context_window_bounds(redacted):
    for r in redacted:
        assert len(r.context) <= len(r.masked_match) + 96
        assert r.masked_match in r.context
