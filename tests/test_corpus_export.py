"""Curated-corpus materializer: gates compose, text is scrubbed, the
layout partitions by lang, and repeated runs produce identical content
(the training-data reproducibility contract)."""

from __future__ import annotations

import hashlib
import os

from catalog_pii_scanner_spark.sinks.corpus_export import (
    export_training_corpus)


def _content_hash(spark, path: str) -> str:
    rows = spark.read.parquet(path).collect()
    lines = sorted("|".join(str(v) for v in r) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


def test_export_gates_layout_and_reproducibility(spark, sf_dir, tmp_path):
    out = str(tmp_path / "corpus")
    stats = export_training_corpus(spark, sf_dir, out)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert stats["n_docs"] == n_docs
    assert 0 < stats["n_exported"] <= n_docs
    assert stats["n_dropped_benchmark"] >= 0
    assert stats["n_dropped_curation"] >= 0
    assert stats["n_exported"] + stats["n_dropped_dedup"] \
        + stats["n_dropped_benchmark"] \
        + stats["n_dropped_curation"] == n_docs

    back = spark.read.parquet(out)
    assert back.count() == stats["n_exported"]
    assert set(back.columns) == {"doc_id", "text", "lang", "source",
                                 "n_chars", "n_masked"}
    # directory layout partitions by lang (partition pruning downstream)
    langs = {d.split("=", 1)[1] for d in os.listdir(out)
             if d.startswith("lang=")}
    got_langs = {r.lang for r in back.select("lang").distinct().collect()}
    assert langs == got_langs and langs

    # exported set == keep-list ∩ curation-keep
    from catalog_pii_scanner_spark.operators.corpus import curate
    from catalog_pii_scanner_spark.operators.dedup import dedup_keep_list
    keep = {r.doc_id for r in
            dedup_keep_list(spark, sf_dir).collect() if r.keep}
    cur = {r.doc_id for r in curate(spark, sf_dir).collect() if r.keep}
    exported = {r.doc_id for r in back.select("doc_id").collect()}
    assert exported == keep & cur

    # second run over the same inputs: identical content
    out2 = str(tmp_path / "corpus2")
    export_training_corpus(spark, sf_dir, out2)
    assert _content_hash(spark, out) == _content_hash(spark, out2)


def test_export_scrubs_pii_when_anonymizing(spark, tmp_path):
    """A PII-bearing kept document is exported with its spans masked and
    the mask count recorded; --no-anonymize keeps raw text."""
    texts = [
        ("reach me at jane.doe@example.com or 555-867-5309 for the "
         "quarterly report details we discussed yesterday afternoon"),
        ("a perfectly ordinary clean document about spark query planning "
         "and shuffle partitioning strategies in production clusters"),
    ]
    d = str(tmp_path / "src")
    # doc_ids start at 1: doc_id 0 is a benchmark doc (doc_id % bench_mod
    # == 0) and benchmark docs are never exported as training data
    rows = [(i + 1, t, "en", "unit", len(t))
            for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    out = str(tmp_path / "anon")
    export_training_corpus(spark, d, out)
    by_id = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert by_id[1].n_masked >= 2
    assert "jane.doe@example.com" not in by_id[1].text
    assert "555-867-5309" not in by_id[1].text
    assert by_id[2].text == texts[1] and by_id[2].n_masked == 0

    raw = str(tmp_path / "raw")
    export_training_corpus(spark, d, raw, anonymize=False)
    raw_by_id = {r.doc_id: r for r in spark.read.parquet(raw).collect()}
    assert raw_by_id[1].text == texts[0] and raw_by_id[1].n_masked == 0
