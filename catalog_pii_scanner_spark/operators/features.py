"""Candidate feature projection (reference P8,
src/catalog_pii_scanner/rules.py:169-180 ``candidate_feature_vector``).

One row per candidate -> ~28 numeric/boolean feature columns: surface
shape (len, has_at, has_dot, has_digits, digits_ratio), the rule prior
(rule_conf), and per-type validation / rule-label one-hots. The
reference computes these per candidate dict-at-a-time for a feature
model it never trained in v0; here they are pure JVM column expressions
— zero shuffle, whole-stage codegen, and identical SQL renders for the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..oracles import ratio_round_halfup

from ..pii_types import ALL_PII_TYPES

#: key columns carried through the projection.
FEATURE_KEYS = ("column_ref", "value", "pii_type", "match_text")


def candidate_features(cands: DataFrame) -> DataFrame:
    """Candidates (match_text, rule_confidence, validated, pii_type) ->
    feature columns. ``validations`` in the reference is a per-type dict;
    our rule candidates validate under their own label's checksum, so
    ``val_<t>`` is validated AND label==t (the same truth table the
    reference's dict produces for rule candidates)."""
    text = F.col("match_text")
    # ONE digit-count definition for has_digits AND digits_ratio (the
    # DuckDB twin's nd discipline) — a drifting second copy would let
    # the two columns disagree on the same row. The regexp_replace is
    # HOISTED into a prior projection so the tie-exact fragment's
    # textual re-expansion (3x numerator) references a column, not the
    # regex (round-10 ADVICE — the corpus.py/textstats.py discipline).
    nd_sql = "length(regexp_replace(match_text, '[^0-9]', ''))"

    def one_hots():
        for t in ALL_PII_TYPES:
            is_t = F.col("pii_type") == t
            yield (is_t & F.col("validated")).alias(f"val_{t}")
            yield is_t.cast("int").alias(f"rule_is_{t}")

    # one select, one analysis pass (28 chained withColumns re-analyzed
    # the growing projection 28 times — pure driver overhead)
    return cands.select("*", F.expr(nd_sql).alias("_nd")).select(
        *FEATURE_KEYS,
        F.length(text).alias("len"),
        text.contains("@").alias("has_at"),
        text.contains(".").alias("has_dot"),
        (F.col("_nd") > 0).alias("has_digits"),
        F.expr(ratio_round_halfup(
            "spark", "_nd",
            "greatest(length(match_text), 1)")).alias("digits_ratio"),
        F.round("rule_confidence", 6).alias("rule_conf"),
        *one_hots())


def candidate_features_oracle_sql(cands_rel: str = "scored") -> str:
    """DuckDB rendering over a scored-candidates relation. The digit
    count is hoisted into the fbase projection so the tie-exact
    fragment references the ``_nd`` column instead of textually
    expanding the regexp_replace three times (round-10 ADVICE)."""
    nd = "length(regexp_replace(match_text, '[^0-9]', '', 'g'))"
    per_type = ", ".join(
        f"(pii_type = '{t}' AND validated) AS val_{t}, "
        f"CAST(pii_type = '{t}' AS INT) AS rule_is_{t}"
        for t in ALL_PII_TYPES)
    return f"""
SELECT column_ref, value, pii_type, match_text,
       length(match_text) AS len,
       contains(match_text, '@') AS has_at,
       contains(match_text, '.') AS has_dot,
       _nd > 0 AS has_digits,
       {ratio_round_halfup("duckdb", "_nd",
                            "greatest(length(match_text), 1)")}
         AS digits_ratio,
       round(rule_confidence, 6) AS rule_conf,
       {per_type}
FROM (SELECT *, {nd} AS _nd FROM {cands_rel}) fbase
"""
