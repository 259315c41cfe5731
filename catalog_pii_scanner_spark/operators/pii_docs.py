"""PII operators over the documents corpus — the scanner applied to the
training-data pipeline (reference scope: the rule engine of
src/catalog_pii_scanner/rules.py run per *document* instead of per
catalog column; the rollup shape mirrors reference scanner.py's
per-column summary, keyed by doc_id).

Two products a 100 TB curation pipeline needs before training:

- ``doc_pii_density``: per-document PII exposure stats (candidate count,
  distinct types, masked-character share) — the filter signal for
  "drop or scrub documents above a PII budget".
- ``corpus_anonymize``: the scrubbed corpus itself — every checksum-valid
  rule match replaced by its shape-preserving mask (redaction.mask), the
  R3 guarantee applied corpus-wide.

Scale shape: both are one ``extract_candidates`` scan (single projection
+ explode, one Arrow checksum stage — see rules.py) followed by ONE
doc-keyed shuffle and a left join back to the (already doc-keyed)
documents relation. No window over the whole corpus, no driver
collection; the fold in ``corpus_anonymize`` is a per-row JVM
``F.aggregate`` over that document's own match list (bounded by matches
per doc, not corpus size).

Determinism across engines: the replacement fold runs longest-match-first
(ties by text) in BOTH dialects, so overlapping spans resolve
identically; ``pii_density`` divides by NULLIF(n_chars, 0) so an empty
document yields NULL in both engines instead of Spark-NULL vs DuckDB-inf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..oracles import candidates_cte
from .redaction import mask, mask_sql
from .rules import extract_candidates


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --- per-document PII density ------------------------------------------------

def doc_pii_density_docs(docs: DataFrame) -> DataFrame:
    """Per-document PII stats over every rule family (X1-X10, checksum
    gate included). Output: doc_id, n_pii, n_pii_types, pii_chars,
    pii_density (rounded 1e-6), pii_types_csv — one row per document,
    zeros for PII-free docs."""
    cands = extract_candidates(docs.select("doc_id", "text"),
                               value_col="text", keep_cols=("doc_id",))
    agg = (cands.groupBy("doc_id")
           .agg(F.count("*").alias("n_pii"),
                F.sum(F.length("match_text")).cast("bigint")
                .alias("pii_chars"),
                F.array_sort(F.collect_set("pii_type")).alias("types")))
    return (docs.select("doc_id", "n_chars")
            .join(agg, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce(F.col("n_pii"), F.lit(0)).cast("bigint")
                .alias("n_pii"),
                F.coalesce(F.size("types"), F.lit(0)).cast("bigint")
                .alias("n_pii_types"),
                F.coalesce(F.col("pii_chars"), F.lit(0)).cast("bigint")
                .alias("pii_chars"),
                F.round(F.coalesce(F.col("pii_chars"), F.lit(0))
                        .cast("double")
                        / F.nullif(F.col("n_chars"), F.lit(0)), 6)
                .alias("pii_density"),
                F.coalesce(F.array_join("types", ","), F.lit(""))
                .alias("pii_types_csv")))


def doc_pii_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_pii_density_docs(_docs(spark, sf_dir))


def doc_pii_density_oracle_sql(docs_rel: str = "documents") -> str:
    return f"""
WITH docs AS (SELECT doc_id, text, n_chars FROM {docs_rel}),
{candidates_cte('docs', key_col='doc_id', value_col='text')},
dist AS (SELECT DISTINCT doc_id, pii_type FROM cand_ok),
types AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pii_types,
         string_agg(pii_type, ',' ORDER BY pii_type) AS pii_types_csv
  FROM dist GROUP BY doc_id
),
agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pii,
         CAST(SUM(length(match_text)) AS BIGINT) AS pii_chars
  FROM cand_ok GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(a.n_pii, 0) AS BIGINT) AS n_pii,
       CAST(COALESCE(t.n_pii_types, 0) AS BIGINT) AS n_pii_types,
       CAST(COALESCE(a.pii_chars, 0) AS BIGINT) AS pii_chars,
       round(CAST(COALESCE(a.pii_chars, 0) AS DOUBLE)
             / NULLIF(d.n_chars, 0), 6) AS pii_density,
       COALESCE(t.pii_types_csv, '') AS pii_types_csv
FROM docs d
LEFT JOIN agg a USING (doc_id)
LEFT JOIN types t USING (doc_id)
"""


# --- corpus anonymization ----------------------------------------------------

def anonymize_docs(docs: DataFrame) -> DataFrame:
    """Scrubbed corpus: every distinct checksum-valid rule match in a
    document replaced (all occurrences) by its shape-preserving mask.
    Replacements fold longest-match-first, ties by text, so a span that
    contains another span is masked before the shorter one can split it.
    Output: doc_id, n_masked, anon_text."""
    cands = extract_candidates(docs.select("doc_id", "text"),
                               value_col="text", keep_cols=("doc_id",))
    matches = (cands.select("doc_id", "match_text").distinct()
               .groupBy("doc_id")
               .agg(F.collect_list(F.struct(
                   (-F.length("match_text")).alias("nl"),
                   F.col("match_text").alias("m"))).alias("ms0")))
    joined = (docs.select("doc_id", "text")
              .join(matches, "doc_id", "left")
              .select("doc_id", "text",
                      F.coalesce(
                          F.transform(F.array_sort("ms0"),
                                      lambda s: s["m"]),
                          F.array().cast("array<string>")).alias("ms")))
    anon = F.aggregate(F.col("ms"), F.col("text"),
                       lambda acc, x: F.replace(acc, x, mask(x)))
    return joined.select(
        "doc_id",
        F.size("ms").cast("bigint").alias("n_masked"),
        anon.alias("anon_text"))


def corpus_anonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return anonymize_docs(_docs(spark, sf_dir))


def corpus_anonymize_oracle_sql(docs_rel: str = "documents") -> str:
    fold_mask = mask_sql("x", "duckdb")
    return f"""
WITH docs AS (SELECT doc_id, text FROM {docs_rel}),
{candidates_cte('docs', key_col='doc_id', value_col='text')},
dist AS (SELECT DISTINCT doc_id, match_text FROM cand_ok),
ms AS (
  SELECT doc_id,
         list(match_text ORDER BY length(match_text) DESC, match_text)
           AS ms
  FROM dist GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(len(m.ms), 0) AS BIGINT) AS n_masked,
       list_reduce(
         list_prepend(d.text, COALESCE(m.ms, CAST([] AS VARCHAR[]))),
         (acc, x) -> replace(acc, x, {fold_mask})) AS anon_text
FROM docs d LEFT JOIN ms m USING (doc_id)
"""
