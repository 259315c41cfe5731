"""Metadata keyword hints (reference X11, rules.py:184-241).

Substring-match per-type keyword lists against column *name* and *comment*;
first hit per (field, type) at confidence 0.6. Spark shape: broadcast the
tiny keyword table, non-equi join on ``contains``, window to keep the first
hit per (column, type) with a deterministic (field_rank, keyword_rank)
order. Metadata cardinality is millions of rows at most — the broadcast
join never shuffles the (already small) columns side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HINT_CONFIDENCE = 0.6

#: type -> ordered keyword list (order = precedence inside a field).
KEYWORD_HINTS: dict[str, tuple[str, ...]] = {
    "EMAIL": ("email", "e_mail", "mail_addr"),
    "PHONE_NUMBER": ("phone", "mobile", "msisdn", "telephone"),
    "CREDIT_CARD": ("credit_card", "card_number", "cc_num"),
    "SSN": ("ssn", "social_security"),
    "IP_ADDRESS": ("ip_addr", "ip_address", "ipaddr"),
    "MAC_ADDRESS": ("mac_addr", "mac_address"),
    "AADHAAR": ("aadhaar", "aadhar"),
    "PAN": ("pan_number", "pan_no", "pan_card"),
    "PERSON": ("first_name", "last_name", "full_name", "person_name",
               "contact name", "full name"),
    "ADDRESS": ("address", "street", "postal_code", "zip_code"),
    "DATE": ("date_of_birth", "dob", "birth"),
}

#: fields scanned, in precedence order (reference scans name, description,
#: then tags; our canonical columns frame carries name + comment).
HINT_FIELDS = ("column", "comment")


def _keyword_rows() -> list[tuple[str, str, int]]:
    return [(t, kw, i)
            for t, kws in KEYWORD_HINTS.items()
            for i, kw in enumerate(kws)]


def metadata_hints(columns_df: DataFrame) -> DataFrame:
    """columns frame -> one hint row per (column, type, field) first match.

    Output: ``ref, pii_type, matched_field, keyword, confidence``.
    """
    spark = columns_df.sparkSession
    kw = spark.createDataFrame(_keyword_rows(),
                               "pii_type string, keyword string, kw_rank int")
    fields = None
    for f_rank, field in enumerate(HINT_FIELDS):
        part = (
            columns_df
            .select("ref", F.lower(F.coalesce(F.col(field), F.lit("")))
                    .alias("field_text"))
            .withColumn("matched_field", F.lit(field))
            .withColumn("field_rank", F.lit(f_rank))
        )
        fields = part if fields is None else fields.unionByName(part)
    hits = (
        fields.join(F.broadcast(kw),
                    F.col("field_text").contains(F.col("keyword")))
    )
    w = Window.partitionBy("ref", "pii_type", "matched_field") \
        .orderBy("kw_rank")
    return (
        hits.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("ref", "pii_type", "matched_field", "keyword",
                F.lit(HINT_CONFIDENCE).alias("confidence"))
    )


def metadata_hints_oracle_sql(columns_rel: str) -> str:
    """DuckDB rendering over a relation with the canonical columns schema."""
    kw_rows = ", ".join(f"('{t}', '{kw}', {i})"
                        for t, kw, i in _keyword_rows())
    field_selects = " UNION ALL ".join(
        f"SELECT ref, lower(coalesce(\"{field}\", '')) AS field_text, "
        f"'{field}' AS matched_field, {i} AS field_rank FROM {columns_rel}"
        for i, field in enumerate(HINT_FIELDS))
    return f"""
WITH fields AS ({field_selects}),
kw AS (SELECT * FROM (VALUES {kw_rows}) t(pii_type, keyword, kw_rank)),
hits AS (
  SELECT f.ref, k.pii_type, f.matched_field, k.keyword, k.kw_rank,
         row_number() OVER (PARTITION BY f.ref, k.pii_type, f.matched_field
                            ORDER BY k.kw_rank) AS rn
  FROM fields f JOIN kw k ON contains(f.field_text, k.keyword)
)
SELECT ref, pii_type, matched_field, keyword,
       CAST({HINT_CONFIDENCE} AS DOUBLE) AS confidence
FROM hits WHERE rn = 1
"""
