"""Dataset invariants (reference tests/test_datasets.py):
``text[start:end] == span_text`` for every generated gold label;
generation is deterministic and partitioning-independent; JSONL round-trip
preserves everything."""

from __future__ import annotations

from catalog_pii_scanner_spark.functions.checksums import luhn_ok
from catalog_pii_scanner_spark.sources.datasets import (generate_synthetic,
                                                        load_jsonl,
                                                        save_jsonl,
                                                        synth_example)


def test_gold_span_invariant_local():
    for row in range(50):
        text, labels = synth_example(row)
        assert labels
        for start, end, _type, span_text in labels:
            assert text[start:end] == span_text


def test_generated_cc_are_luhn_valid():
    seen = 0
    for row in range(50):
        _, labels = synth_example(row)
        for _s, _e, t, v in labels:
            if t == "CREDIT_CARD":
                assert luhn_ok(v), v
                seen += 1
    assert seen > 0


def test_distributed_generation_deterministic(spark):
    a = {r.text_id: r.text
         for r in generate_synthetic(spark, 40).collect()}
    b = {r.text_id: r.text
         for r in generate_synthetic(spark, 40).repartition(7).collect()}
    assert a == b
    assert len(a) == 40


def test_jsonl_roundtrip(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("jsonl") / "data")
    df = generate_synthetic(spark, 20)
    save_jsonl(df, path)
    back = load_jsonl(spark, path)
    orig = {r.text_id: (r.text, [tuple(l) for l in r.labels])
            for r in df.collect()}
    rt = {r.text_id: (r.text, [tuple(l) for l in r.labels])
          for r in back.collect()}
    assert orig == rt
