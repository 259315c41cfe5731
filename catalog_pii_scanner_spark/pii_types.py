"""PII label vocabulary.

Mirrors the reference's 11-value enum and, critically, its *ordering*
(reference: src/catalog_pii_scanner/pii_types.py:8-34) — ensemble argmax
tie-breaking is defined as "highest probability, then ALL_PII_TYPES order",
so the order below is part of the engine's semantics, not cosmetics.
"""

from __future__ import annotations

from enum import Enum


class PIIType(str, Enum):
    EMAIL = "EMAIL"
    PHONE_NUMBER = "PHONE_NUMBER"
    CREDIT_CARD = "CREDIT_CARD"
    SSN = "SSN"
    IP_ADDRESS = "IP_ADDRESS"
    MAC_ADDRESS = "MAC_ADDRESS"
    AADHAAR = "AADHAAR"
    PAN = "PAN"
    PERSON = "PERSON"
    ADDRESS = "ADDRESS"
    DATE = "DATE"


#: Canonical ordering — fusion/argmax determinism depends on it.
ALL_PII_TYPES: tuple[str, ...] = tuple(t.value for t in PIIType)

#: 0-based rank used as the argmax tie-break key.
TYPE_RANK: dict[str, int] = {t: i for i, t in enumerate(ALL_PII_TYPES)}


def type_rank_sql(col: str) -> str:
    """A dialect-portable CASE expression mapping a label column to its rank.

    Works verbatim in Spark SQL and DuckDB — used so the Spark plan and the
    DuckDB oracle share one tie-break definition.
    """
    whens = " ".join(f"WHEN '{t}' THEN {i}" for i, t in enumerate(ALL_PII_TYPES))
    return f"(CASE {col} {whens} ELSE 99 END)"
