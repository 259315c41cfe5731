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

#: Parked entries sitting AT the age bound right now, i.e. the
#: capacity remainder that must be in the front 50 next round. The
#: round-9 window fronts every age-3 entry (all 13 round-6 rows), so
#: the set is EMPTY this round; the round-7-row cohort reaches the
#: bound only when CORRECTNESS_r09.json lands, at which point
#: test_parked_driver_age_is_bounded fires as the rotation-due
#: tripwire for round 10.
MUST_FRONT_NEXT_ROUND: set[str] = set()

#: Appended to the age-bound assertion failures so a red suite is
#: read correctly: the fix is rotating FRONT_50 in __spark_entry__.py
#: (and refreshing MUST_FRONT_NEXT_ROUND above), NOT a code bug — the
#: tripwire exists precisely to force the rotation to land atomically
#: with each new committed driver artifact.
_ROTATION_DUE_MSG = (
    "ROTATION DUE (not a correctness regression): a new "
    "CORRECTNESS_r*.json artifact advanced the round; update FRONT_50 "
    "in __spark_entry__.py to front the listed entries and refresh "
    "MUST_FRONT_NEXT_ROUND in this file."
)


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
        assert age <= MAX_DRIVER_AGE, (q, age, _ROTATION_DUE_MSG)
        if age == MAX_DRIVER_AGE:
            at_bound.add(q)
    assert at_bound == MUST_FRONT_NEXT_ROUND, (
        at_bound ^ MUST_FRONT_NEXT_ROUND, _ROTATION_DUE_MSG)


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
    "sketch_hll_registers": ("register", "mrho"),
    "sketch_hll_rho_parts": ("nz", "fd", "n_values"),
    "sketch_hll_state": ("v_zero", "z_scaled", "filled"),
    "sketch_cms_heavy_hitters": ("over_bp", "cms_est", "exact_count"),
    "dq_referential_suite": ("orphan_bp",),
    "dq_k_anonymity": ("risk_bp",),
    "layout_compaction_plan": ("bin_id", "fill_bp"),
    "layout_partition_skew": ("rec_salt",),
}


def test_no_pow_in_hashed_expressions():
    """``power(2, n)`` / ``F.pow`` bit-packing is banned repo-wide:
    libm/Math.pow carries a licensed 1-ulp error, so ``power(2, 30)``
    can render 2^30 - eps on one engine build and CAST-truncate to the
    wrong bit — the identified root cause of the round-8
    multimodal_audio_fingerprint driver hash failure. Powers of two in
    any hashed-output expression must use shift-left
    (oracles.shift1). Float-DOMAIN uses of pow (none today) would need
    an explicit ``pow-float-ok`` marker on the same line."""
    import glob as g

    pkg = os.path.join(REPO, "catalog_pii_scanner_spark")
    offenders = []
    for path in g.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
        with open(path) as f:
            for i, line in enumerate(f, 1):
                if "pow-float-ok" in line:
                    continue
                low = line.split("#")[0]
                if re.search(r"\bpower\s*\(\s*2\s*,", low) \
                        or "F.pow" in low:
                    offenders.append(f"{path}:{i}")
    assert not offenders, offenders


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
