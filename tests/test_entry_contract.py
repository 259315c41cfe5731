"""Driver-contract invariants on __spark_entry__ (no Spark session).

The driver gate checks only the FIRST 50 ``queries()`` entries each
round, so with 135 registered queries the catalog re-verifies on a
three-round cycle. Round 7's judge flagged that hand-maintained round
claims drifted from reality (a fronting promise was validated against
an internal build iteration the driver never consumed), so ALL driver
ages here are now derived from the committed ``CORRECTNESS_r*.json``
artifacts — the only ground truth — never from docstrings or internal
round numbering.

Rotation policy, enforced below:
(1) every query with NO driver row ever must be in the front 50
    (until the never-gated backlog fits, which it does: 29 <= 50);
(2) every query whose LATEST driver row failed any check must be in
    the front 50 (a red row may not be parked);
(3) no parked (past-position-50) entry's driver age may exceed
    MAX_DRIVER_AGE = 3 rounds;
(4) parked entries AT age 3 are the capacity remainder that must
    front next round — declared in MUST_FRONT_NEXT_ROUND so the set
    is explicit; rule (3) turns the declaration into a hard failure
    next round if it is not honored.
"""

from __future__ import annotations

import glob
import json
import os
import re

import __spark_entry__ as E

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Oldest driver row a parked entry may carry, in rounds. 135 queries
#: / 50-entry window = a 2.7-round full cycle, so 3 is the tightest
#: honest bound.
MAX_DRIVER_AGE = 3

#: The 24 round-5-row entries the 50-entry window could not fit this
#: round (front 50 = 27 never-gated + 2 round-7 hash-FAILs + 21 oldest
#: round-5 rows). They sit at age 3 now and MUST be in the front 50
#: next round — rule (3) fails the build otherwise.
MUST_FRONT_NEXT_ROUND = {
    "athena_sample_capped", "corpus_curate", "corpus_decontaminate",
    "corpus_pack_sequences", "corpus_repetition",
    "corpus_sample_stratified", "corpus_temperature_sample",
    "corpus_tfidf_keywords", "corpus_vocab_topk", "doc_fingerprints",
    "doc_lang_id", "doc_length_quantiles", "doc_quality",
    "doc_token_counts", "events_hourly", "events_props_stats",
    "events_sessions_salted", "glue_columns", "hms_columns",
    "multimodal_audio_energy", "multimodal_real_pgm_features",
    "multimodal_real_wav_features", "stream_doc_pii_density",
    "unity_columns",
}


def _driver_rows() -> dict[int, dict]:
    """Committed driver artifacts, keyed by driver round."""
    rounds = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json",
                         os.path.basename(path))
        if not m:
            continue  # CORRECTNESS_LOCAL_* etc. are soft signal
        with open(path) as f:
            rounds[int(m.group(1))] = json.load(f)
    return rounds


def _latest_driver_round() -> dict[str, int]:
    latest = {}
    for r in sorted(_driver_rows()):
        for q in _driver_rows()[r]:
            latest[q] = r
    return latest


def _latest_driver_result() -> dict[str, dict]:
    rows = _driver_rows()
    latest = {}
    for r in sorted(rows):
        for q, res in rows[r].items():
            latest[q] = res
    return latest


def _current_round() -> int:
    """The round in progress = one past the newest committed artifact."""
    return max(_driver_rows(), default=0) + 1


def test_every_query_has_an_oracle():
    q, o = E.queries(), E.oracle_sql()
    assert set(q) == set(o), (set(q) ^ set(o))


def test_front50_is_well_formed():
    q = list(E.queries())
    assert q[:50] == E.FRONT_50
    assert len(set(E.FRONT_50)) == 50
    assert len(q) == len(set(q))


def test_never_gated_queries_are_fronted():
    """Rule (1): anything without a driver row in ANY committed
    artifact must face the gate this round."""
    gated = set(_latest_driver_round())
    never = set(E.queries()) - gated
    front = set(E.FRONT_50)
    assert never <= front, never - front


def test_failed_driver_rows_are_fronted():
    """Rule (2): a red driver row may not be parked."""
    front = set(E.FRONT_50)
    failed = {
        q for q, res in _latest_driver_result().items()
        if q in E.queries() and not (
            res.get("rows_match") and res.get("schema_match")
            and res.get("hash_match"))
    }
    assert failed <= front, failed - front


def test_parked_driver_age_is_bounded():
    """Rules (3)+(4): parked entries age at most MAX_DRIVER_AGE, and
    the ones AT the bound are exactly the declared must-front set."""
    cur = _current_round()
    latest = _latest_driver_round()
    at_bound = set()
    for q in list(E.queries())[50:]:
        if q not in latest:
            continue  # never-gated: rule (1) already forces fronting
        age = cur - latest[q]
        assert age <= MAX_DRIVER_AGE, (q, age)
        if age == MAX_DRIVER_AGE:
            at_bound.add(q)
    assert at_bound == MUST_FRONT_NEXT_ROUND, (
        at_bound ^ MUST_FRONT_NEXT_ROUND)


def test_declared_names_are_registered():
    assert MUST_FRONT_NEXT_ROUND <= set(E.queries()), \
        MUST_FRONT_NEXT_ROUND - set(E.queries())


def test_oracles_are_nonempty_sql():
    for name, sql in E.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


#: Audit columns whose inputs are integer counts — the round-8
#: hardening made them exact integer division (never a double floor(),
#: which round 7's driver gate proved is not engine-build-stable).
#: query -> columns that must stay BIGINT in the DuckDB oracle.
INTEGER_AUDIT_COLUMNS = {
    "sketch_hll_distinct": ("est_distinct", "err_bp", "z_scaled"),
    "sketch_hll_union": ("est_distinct", "z_scaled"),
    "stream_hll_distinct": ("est_distinct", "z_scaled"),
    "sketch_cms_heavy_hitters": ("over_bp", "cms_est", "exact_count"),
    "dq_referential_suite": ("orphan_bp",),
    "dq_k_anonymity": ("risk_bp",),
    "layout_compaction_plan": ("bin_id", "fill_bp"),
    "layout_partition_skew": ("rec_salt",),
}


def test_integer_audit_columns_stay_integer_typed():
    """Running each oracle on the tiny sf0.001 tables, the declared
    audit columns must type as exact integers (BIGINT, or HUGEINT
    where DuckDB widens a SUM) — a DOUBLE sneaking back in
    reintroduces the engine-build divergence class."""
    import duckdb

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents",
              "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
                f"'/root/testdata/sf0.001/{t}.parquet')")
    oracles = E.oracle_sql()
    for qname, cols in INTEGER_AUDIT_COLUMNS.items():
        rel = con.sql(oracles[qname])
        types = dict(zip(rel.columns, (str(t) for t in rel.types)))
        for c in cols:
            assert types.get(c) in ("BIGINT", "HUGEINT"), \
                (qname, c, types.get(c))
