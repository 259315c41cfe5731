"""PII-over-corpus operators: per-doc density stats and corpus-wide
anonymization (the R3 no-raw-PII guarantee applied to the documents
table, reference redaction.py semantics at corpus scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from catalog_pii_scanner_spark.operators.pii_docs import (
    anonymize_docs, doc_pii_density_docs)


def _docs(spark, sf_dir):
    """Testdata documents plus two synthetic PII-bearing docs (sf0.001's
    documents may contain no rule-matchable span at all, and the
    invariants below need both hit and clean docs)."""
    base = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text", "n_chars"))
    extra_rows = [
        (10_000_001,
         "contact jane.doe@example.com or 555-867-5309; "
         "card 4111111111111111 on file"),
        (10_000_002, "ssn 123-45-6789 email jane.doe@example.com"),
    ]
    extra = spark.createDataFrame(
        [(i, t, len(t)) for i, t in extra_rows],
        "doc_id bigint, text string, n_chars bigint")
    return base.unionByName(extra)


def test_density_one_row_per_doc_with_zeros(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = doc_pii_density_docs(docs)
    rows = out.collect()
    assert len(rows) == docs.count()
    by_id = {r.doc_id: r for r in rows}
    assert len(by_id) == len(rows)  # doc_id unique
    hit = [r for r in rows if r.n_pii > 0]
    clean = [r for r in rows if r.n_pii == 0]
    assert hit, "testdata documents contain rule-matchable spans"
    assert all(r.pii_chars == 0 and r.pii_density == 0.0
               and r.pii_types_csv == "" for r in clean)
    for r in hit:
        assert r.n_pii_types == len(r.pii_types_csv.split(","))
        assert list(r.pii_types_csv.split(",")) == \
            sorted(r.pii_types_csv.split(","))
        assert r.pii_chars > 0 and r.pii_density > 0


def test_density_counts_match_manual_recount(spark, sf_dir):
    """n_pii equals a direct count of extract_candidates rows per doc."""
    from catalog_pii_scanner_spark.operators.rules import extract_candidates
    docs = _docs(spark, sf_dir)
    manual = {
        r.doc_id: r.n for r in
        extract_candidates(docs.select("doc_id", "text"),
                           value_col="text", keep_cols=("doc_id",))
        .groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    out = {r.doc_id: r.n_pii
           for r in doc_pii_density_docs(docs).collect() if r.n_pii}
    assert out == manual


def test_anonymize_no_raw_match_survives(spark, sf_dir):
    """R3 corpus-wide: no extracted span text remains in its document's
    anonymized text; shape (length) is preserved by the mask."""
    from catalog_pii_scanner_spark.operators.rules import extract_candidates
    docs = _docs(spark, sf_dir)
    anon = {r.doc_id: r for r in anonymize_docs(docs).collect()}
    assert len(anon) == docs.count()
    spans = (extract_candidates(docs.select("doc_id", "text"),
                                value_col="text", keep_cols=("doc_id",))
             .select("doc_id", "match_text").distinct().collect())
    assert spans
    leaked = [(r.doc_id, r.match_text) for r in spans
              if r.match_text in anon[r.doc_id].anon_text]
    assert not leaked, leaked[:5]
    n_masked = {r.doc_id: 0 for r in docs.select("doc_id").collect()}
    for r in spans:
        n_masked[r.doc_id] += 1
    assert {d: r.n_masked for d, r in anon.items()} == n_masked


def test_anonymize_preserves_text_length_and_structure(spark):
    """Masks are shape-preserving, so anonymized text keeps its length;
    longest-match-first folding resolves nested spans deterministically."""
    docs = spark.createDataFrame(
        [(1, "call 555-867-5309 or mail a.b@example.com today"),
         (2, "no pii here at all")],
        "doc_id bigint, text string")
    out = {r.doc_id: r for r in anonymize_docs(docs).collect()}
    src = {1: "call 555-867-5309 or mail a.b@example.com today",
           2: "no pii here at all"}
    for d, r in out.items():
        assert len(r.anon_text) == len(src[d])
    assert out[2].anon_text == src[2] and out[2].n_masked == 0
    assert "555-867-5309" not in out[1].anon_text
    assert "a.b@example.com" not in out[1].anon_text
    assert out[1].anon_text.startswith("call ")


def test_augment_injects_deterministic_pii(spark):
    from catalog_pii_scanner_spark.operators.pii_docs import (
        CONTACT_MOD, SSN_MOD, augment_docs)
    rows = [(i, f"plain body {i}", "en", "unit", 0) for i in
            (1, CONTACT_MOD, SSN_MOD, SSN_MOD * 2)]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint")
    out = {r.doc_id: r for r in augment_docs(docs).collect()}
    assert out[1].text == "plain body 1"
    assert "@example.com" in out[CONTACT_MOD].text
    assert "ssn" not in out[CONTACT_MOD].text
    assert "@example.com" in out[SSN_MOD].text
    assert "ssn 123-45-" in out[SSN_MOD].text
    for r in out.values():
        assert r.n_chars == len(r.text)      # recomputed post-augment
        assert r.lang == "en" and r.source == "unit"
    # deterministic: same input -> same output
    again = {r.doc_id: r.text for r in augment_docs(docs).collect()}
    assert again == {d: r.text for d, r in out.items()}


def test_curate_pii_gate_and_precedence(spark, sf_dir):
    """pii_heavy drops exactly the docs over the density budget among
    otherwise-kept docs; higher-precedence reasons are never displaced."""
    from catalog_pii_scanner_spark.operators.corpus import curate
    from catalog_pii_scanner_spark.operators.pii_docs import (
        MAX_PII_DENSITY, corpus_curate_pii)
    base = {r.doc_id: r for r in curate(spark, sf_dir).collect()}
    got = {r.doc_id: r for r in corpus_curate_pii(spark, sf_dir).collect()}
    # curate() runs on the raw corpus, curate_pii on the augmented one —
    # quality/repetition scores may shift slightly, but coverage (the
    # training-doc set) is identical
    assert set(got) == set(base)
    heavy = [r for r in got.values() if r.drop_reason == "pii_heavy"]
    assert heavy, "augmented corpus must contain over-budget docs"
    for r in heavy:
        assert r.pii_density > MAX_PII_DENSITY and not r.keep
    for r in got.values():
        if r.keep:
            assert (r.pii_density or 0.0) <= MAX_PII_DENSITY
        if r.drop_reason in ("contaminated", "repetitive", "low_quality"):
            # pii_heavy never displaces a higher-precedence reason
            assert r.drop_reason != "pii_heavy"


def test_scan_corpus_cli_reports_exposure(tmp_path, capsys, spark):
    """The scan-corpus verb prints a summary JSON and writes the per-doc
    frame; counts agree with the density operator."""
    import json as _json
    from catalog_pii_scanner_spark import cli
    texts = [
        (1, "contact jane.doe@example.com or 555-867-5309 today", "en"),
        (2, "a clean document about query planning in spark", "en"),
        (3, "ssn 123-45-6789 appears in this leaked record", "en"),
    ]
    d = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, t, lg, "unit", len(t)) for i, t, lg in texts],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = str(tmp_path / "dens")
    assert cli.main(["scan-corpus", "--sf-dir", d, "--out", out]) == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_docs"] == 3
    assert rep["n_docs_with_pii"] == 2
    assert rep["n_spans"] >= 3           # email + phone + ssn at least
    assert set(rep["docs_by_type"]) >= {"EMAIL", "PHONE_NUMBER", "SSN"}
    back = spark.read.parquet(out)
    assert back.count() == 3
