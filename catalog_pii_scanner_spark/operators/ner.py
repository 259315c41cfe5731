"""NER operators (reference N1-N5, src/catalog_pii_scanner/ner.py).

Provider model mirrors the reference: a pluggable span detector with a
confidence gate (N3, default 0.60), merged with rule candidates by
per-type MAX (N4, ner.py:202-228), plus context-signal histograms (N5).

Providers:
- ``regex`` (default, hermetic): the reference's spaCy fallback — PERSON
  via the capitalized-bigram pattern at 0.85, EMAIL 0.99, PHONE 0.90
  (ner.py:53-117's fallback scores). Runs as JVM column expressions; this
  is the oracle-checkable path.
- ``spacy`` / ``presidio``: gated behind import-try; load lazily ONCE per
  Python worker (executor-global singleton, the standard heavy-model
  pattern), batch via Arrow in mapInPandas. Absent in this environment —
  selecting them without the package raises ImportError at plan time.

Scale notes: the regex provider is a projection (no shuffle, codegen). The
model providers are mapInPandas stages whose cost is bounded by Arrow
batch size; model weights distribute via SparkFiles/addFile, never
broadcast through the closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rules import RULES, Rule, extract_candidates

NER_CONFIDENCE_MIN = 0.60

#: regex-provider scores (reference ner.py fallback path).
NER_SCORES = {"PERSON": 0.85, "EMAIL": 0.99, "PHONE_NUMBER": 0.90}

_NER_RULES = tuple(
    Rule(r.pii_type, r.pattern, NER_SCORES[r.pii_type])
    for r in RULES if r.pii_type in NER_SCORES
)


def _spacy_provider_available() -> bool:
    try:  # pragma: no cover - not installed in this environment
        import spacy  # noqa: F401
        return True
    except ImportError:
        return False


def detect_ner_spans(values_df: DataFrame, value_col: str = "value",
                     keep_cols: tuple[str, ...] = ("column_ref",),
                     provider: str = "regex",
                     confidence_min: float = NER_CONFIDENCE_MIN) -> DataFrame:
    """N1+N3: provider dispatch + confidence gate.

    Output: keep_cols..., value, pii_type, match_text, ner_score.
    """
    if provider != "regex":
        if not _spacy_provider_available():
            raise ImportError(
                f"NER provider '{provider}' needs its model package, which "
                f"is not installed; use provider='regex'")
        raise NotImplementedError(
            "model providers plug in as a mapInPandas stage with an "
            "executor-global lazy singleton; not wired in this build")
    spans = extract_candidates(values_df, value_col, keep_cols,
                               rules=_NER_RULES)
    score = F.lit(None).cast("double")
    for t, s in NER_SCORES.items():
        score = F.when(F.col("pii_type") == t, F.lit(s)).otherwise(score)
    return (
        spans.withColumn("ner_score", score)
        .where(F.col("ner_score") >= confidence_min)
        .select(*keep_cols, value_col, "pii_type", "match_text",
                "ner_score")
    )


def merge_with_rules(rule_cands: DataFrame, ner_spans: DataFrame,
                     keys: tuple[str, ...] = ("column_ref", "value"),
                     w_rule_signal: float = 1.0) -> DataFrame:
    """N4/A1: per (keys, pii_type) MAX over rule confidences and NER
    scores — the union-then-max merge the reference applies
    (ner.py:202-228). One union + one aggregation."""
    r = rule_cands.select(*keys, "pii_type",
                          (F.col("rule_confidence")
                           * F.lit(w_rule_signal)).alias("signal"))
    n = ner_spans.select(*keys, "pii_type",
                         F.col("ner_score").alias("signal"))
    return (
        r.unionByName(n)
        .groupBy(*keys, "pii_type")
        .agg(F.round(F.max("signal"), 6).alias("merged_score"))
    )


def merge_with_rules_oracle_sql(scored_rel: str = "scored") -> str:
    """DuckDB rendering over the shared scored-candidates CTE: re-derive
    the NER spans from the same relation (EMAIL/PHONE/PERSON matches at
    provider scores), union with rule confidences, group-max."""
    score_case = " ".join(
        f"WHEN '{t}' THEN CAST({s} AS DOUBLE)"
        for t, s in NER_SCORES.items())
    return f"""
merged_in AS (
  SELECT column_ref, value, pii_type, rule_confidence AS signal
  FROM {scored_rel}
  UNION ALL
  SELECT column_ref, value, pii_type,
         (CASE pii_type {score_case} END) AS signal
  FROM {scored_rel}
  WHERE pii_type IN ({", ".join(f"'{t}'" for t in NER_SCORES)})
    AND (CASE pii_type {score_case} END) >= {NER_CONFIDENCE_MIN}
)
SELECT column_ref, value, pii_type,
       round(MAX(signal), 6) AS merged_score
FROM merged_in GROUP BY column_ref, value, pii_type
"""


def ner_context_signals(contexts: DataFrame,
                        context_col: str = "context",
                        keep_cols: tuple[str, ...] = ("column_ref",
                                                      "match_text"),
                        provider: str = "regex") -> DataFrame:
    """N5: entity-label histogram over redacted contexts -> normalized
    soft signals per context. With the regex provider the entities are the
    provider's three families detected in the (redacted) context; counts
    normalize to shares."""
    spans = detect_ner_spans(contexts, context_col, keep_cols,
                             provider=provider)
    counts = spans.groupBy(*keep_cols, "pii_type").agg(
        F.count("*").alias("n"))
    total = counts.groupBy(*keep_cols).agg(F.sum("n").alias("total"))
    return (
        counts.join(total, list(keep_cols))
        .select(*keep_cols, "pii_type",
                F.round(F.col("n") / F.col("total"), 6).alias("signal"))
    )
