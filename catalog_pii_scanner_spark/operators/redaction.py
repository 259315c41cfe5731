"""Redaction operators (reference R1-R4, src/catalog_pii_scanner/redaction.py).

- R1 ``mask``: shape-preserving mask — digit->0, lowercase->x, uppercase->X,
  punctuation/whitespace kept, length preserved (redaction.py:16-26).
- R2 ``redact``: replace candidate spans in the text with their masks
  (redaction.py:29-45).
- R4 ``context``: slice +/-``window`` chars around the (redacted) span
  (redaction.py:57-72; the ensemble uses window=48, ensemble.py:71).
- R3 redaction guarantee: no raw span text survives into model inputs —
  enforced here by construction (contexts are built from the redacted text)
  and asserted in tests/test_redaction.py.

All JVM-side column expressions (3 chained regexp_replace + replace/substr);
the same logic is rendered for DuckDB so redaction is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CONTEXT_WINDOW = 48


def mask(col: Column) -> Column:
    """Shape-preserving mask, JVM-side."""
    m = F.regexp_replace(col, "[0-9]", "0")
    m = F.regexp_replace(m, "[a-z]", "x")
    return F.regexp_replace(m, "[A-Z]", "X")


def mask_sql(col: str, dialect: str) -> str:
    """Identical mask as SQL text (DuckDB needs the 'g' flag)."""
    g = ", 'g'" if dialect == "duckdb" else ""
    m = f"regexp_replace({col}, '[0-9]', '0'{g})"
    m = f"regexp_replace({m}, '[a-z]', 'x'{g})"
    return f"regexp_replace({m}, '[A-Z]', 'X'{g})"


def redact_candidates(cands: DataFrame, value_col: str = "value",
                      match_col: str = "match_text") -> DataFrame:
    """Add ``masked_match`` and ``redacted_value`` columns (R1+R2).

    Replaces every occurrence of the matched span text in the value —
    equivalent to the reference's span-based replacement for non-overlapping
    spans, and a pure projection (no shuffle).
    """
    return cands.withColumn(
        "masked_match", mask(F.col(match_col))
    ).withColumn(
        "redacted_value",
        F.replace(F.col(value_col), F.col(match_col), F.col("masked_match")),
    )


def candidate_contexts(cands: DataFrame, window: int = CONTEXT_WINDOW,
                       value_col: str = "value",
                       match_col: str = "match_text") -> DataFrame:
    """Add a ``context`` column: +/-window chars of redacted text around the
    span (R4). Position from first occurrence (instr); the pandas-UDF
    detection pipeline carries exact offsets instead.
    """
    with_redacted = redact_candidates(cands, value_col, match_col)
    pos = F.instr(F.col(value_col), F.col(match_col))
    start = F.greatest(pos - F.lit(window), F.lit(1))
    length = F.length(F.col("masked_match")) + F.lit(2 * window)
    return with_redacted.withColumn(
        "context", F.substring(F.col("redacted_value"), start, length)
    )


def redaction_oracle_exprs(dialect: str = "duckdb",
                           window: int = CONTEXT_WINDOW) -> dict[str, str]:
    """SQL renderings of the three derived columns over (value, match_text)."""
    masked = mask_sql("match_text", dialect)
    redacted = f"replace(value, match_text, {masked})"
    pos = "instr(value, match_text)"
    start = f"greatest({pos} - {window}, 1)"
    length = f"length({masked}) + {2 * window}"
    return {
        "masked_match": masked,
        "redacted_value": redacted,
        "context": f"substr({redacted}, {start}, {length})",
    }
