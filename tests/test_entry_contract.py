"""Driver-contract invariants on __spark_entry__ (no Spark session):
every query has an oracle, and the ordering policy that works around the
driver's 50-entry correctness cap stays intact — only designated stable
queries may sit past position 50."""

from __future__ import annotations

import __spark_entry__ as E

#: The deliberately-parked tail (see the ordering note in queries()):
#: untouched protocol stubs + textstats, all green in r3 AND in the
#: committed CORRECTNESS_LOCAL artifact. Anything else appearing past
#: position 50 would silently lose driver verification.
STABLE_PARKED = {
    "catalog_columns", "hms_columns", "unity_columns", "glue_columns",
    "pii_metadata_hints", "athena_sample_capped", "doc_quality",
    "doc_lang_id", "doc_token_counts", "doc_fingerprints",
    "doc_length_quantiles", "dedup_exact", "dedup_minhash_signatures",
    "dedup_simhash", "corpus_vocab_topk", "corpus_tfidf_keywords",
    "corpus_sample_stratified", "corpus_repetition",
    "corpus_decontaminate", "corpus_pack_sequences",
    "corpus_temperature_sample", "corpus_curate",
    "dedup_lsh_near_pairs", "dedup_clusters", "events_hourly",
    "events_props_stats", "profile_columns", "pii_scan_enabled_types",
    "dedup_ngram_jaccard", "stream_dedup_events",
    "pii_candidates_scored",
}


def test_every_query_has_an_oracle():
    q, o = E.queries(), E.oracle_sql()
    assert set(q) == set(o), (set(q) ^ set(o))


def test_only_designated_stable_queries_past_position_50():
    tail = list(E.queries())[50:]
    assert set(tail) <= STABLE_PARKED, set(tail) - STABLE_PARKED


def test_oracles_are_nonempty_sql():
    for name, sql in E.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
