"""BPE merge training as a corpus operator — the first N merge rules
of a byte-pair-encoding tokenizer learned from the document corpus
(Sennrich, Haddow, Birch 2016; the standard subword-tokenizer trainer
every LLM data pipeline runs before anything else tokenizes).

Semantics (deterministic, dual-dialect):

- the vocabulary is the aggregated (token, count) relation over
  lowercase-ASCII word tokens (``^[a-z0-9]+$`` — BPE trainers
  normalize first, and the ASCII gate keeps the character split free
  of engine-specific unicode segmentation), each token capped at
  BPE_MAX_TOKEN_CHARS characters (straggler guard, mirrored in the
  oracle) and rendered as space-separated characters plus the
  ``</w>`` end-of-word symbol;
- each iteration counts adjacent symbol pairs weighted by token
  count, picks the best pair by (count DESC, pair ASC) — a total
  order, so the winner is unique — and applies the merge with ONE
  leftmost-non-overlapping string replace over the padded symbol
  string (``' s '``). NOTE: on a run of k >= 5 self-overlapping
  occurrences of the same pair inside one token this differs from
  classic greedy BPE (which re-scans after every merge); it is the
  exact semantics of Python's ``str.replace`` and of Spark's and
  DuckDB's ``replace``, identical in all three (pinned against an
  independent Python reference in tests/test_r8_ops.py), and the
  word-salad corpus has no such runs;
- iterations with no remaining pair (degenerate corpora) emit no row
  and leave the vocabulary unchanged.

Execution shape (the 100 TB story): the corpus is scanned ONCE into
the (token, count) vocabulary — after that every iteration works on
the vocabulary relation, whose size is bounded by the token universe,
not the corpus. The Spark path materializes the vocabulary and loops
driver-side (the embed_kmeans_lloyd discipline: the driver holds only
the ONE-ROW best pair per iteration — a bounded collect — and
controls the loop; all counting stays distributed), checkpointing the
merged vocabulary each round so the lineage stays flat. The DuckDB
oracle unrolls the same N iterations as CTEs (re-reference is free
there); Spark never runs the unrolled template, whose CTE
re-inlining would double the plan per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Number of merge rules to learn (unrolled in the oracle).
BPE_MERGES = 6
#: Per-token character cap (one monster token must not dominate the
#: pair explode), applied identically in both dialects.
BPE_MAX_TOKEN_CHARS = 24
#: End-of-word symbol (classic Sennrich marker).
BPE_EOW = "</w>"


def _vocab_cte(dialect: str, docs_rel: str) -> str:
    """(s, c): space-separated symbol string + token count."""
    unnest = "unnest" if dialect == "duckdb" else "explode"
    split = ("regexp_split_to_array(text, ' +')" if dialect == "duckdb"
             else "split(text, ' +')")
    spaced = (r"regexp_replace(substr(tok, 1, %d), '(.)', '\1 ', 'g')"
              % BPE_MAX_TOKEN_CHARS if dialect == "duckdb" else
              r"regexp_replace(substr(tok, 1, %d), '(.)', '$1 ')"
              % BPE_MAX_TOKEN_CHARS)
    return f"""
bpe_toks AS (
  SELECT tok FROM (
    SELECT {unnest}({split}) AS tok FROM {docs_rel}
  ) _e WHERE tok <> '' AND regexp_matches(tok, '^[a-z0-9]+$')
),
bpe_vocab_0 AS (
  SELECT trim({spaced}) || ' {BPE_EOW}' AS s, COUNT(*) AS c
  FROM bpe_toks GROUP BY tok
)""" if dialect == "duckdb" else f"""
bpe_toks AS (
  SELECT tok FROM (
    SELECT {unnest}({split}) AS tok FROM {docs_rel}
  ) _e WHERE tok <> '' AND tok RLIKE '^[a-z0-9]+$'
),
bpe_vocab_0 AS (
  SELECT trim({spaced}) || ' {BPE_EOW}' AS s, COUNT(*) AS c
  FROM bpe_toks GROUP BY tok
)"""


def _pairs_sql(dialect: str, vocab: str) -> str:
    """Adjacent symbol pairs of ``vocab``(s, c), weighted by c."""
    if dialect == "duckdb":
        return f"""
  SELECT list_extract(a, CAST(i AS INT)) AS pa,
         list_extract(a, CAST(i + 1 AS INT)) AS pb,
         SUM(c) AS cnt
  FROM (SELECT string_split(s, ' ') AS a, c FROM {vocab}) _v,
       (SELECT unnest(range(1, 2 * {BPE_MAX_TOKEN_CHARS})) AS i) _i
  WHERE i < len(a)
  GROUP BY 1, 2"""
    return f"""
  SELECT element_at(a, CAST(i AS INT)) AS pa,
         element_at(a, CAST(i + 1 AS INT)) AS pb,
         SUM(c) AS cnt
  FROM (SELECT split(s, ' ') AS a, c FROM {vocab}) _v
  LATERAL VIEW explode(sequence(1, 2 * {BPE_MAX_TOKEN_CHARS} - 1)) _i AS i
  WHERE i < size(a)
  GROUP BY 1, 2"""


def bpe_merges_sql(dialect: str, docs_rel: str = "documents",
                   n_merges: int = BPE_MERGES) -> str:
    """Fully-unrolled dual-dialect template: one row per learned merge,
    (it, pa, pb, merged, pair_count), ordered by it."""
    ctes = [_vocab_cte(dialect, docs_rel).lstrip()]
    rows = []
    for k in range(1, n_merges + 1):
        prev = f"bpe_vocab_{k - 1}"
        ctes.append(f"""
bpe_pairs_{k} AS ({_pairs_sql(dialect, prev)}
),
bpe_best_{k} AS (
  SELECT pa, pb, cnt FROM bpe_pairs_{k}
  ORDER BY cnt DESC, pa, pb LIMIT 1
),
bpe_vocab_{k} AS (
  SELECT CASE WHEN b.pa IS NULL THEN v.s
         ELSE trim(replace(' ' || v.s || ' ',
                           ' ' || b.pa || ' ' || b.pb || ' ',
                           ' ' || b.pa || b.pb || ' '))
         END AS s, v.c
  FROM {prev} v LEFT JOIN bpe_best_{k} b ON true
)""")
        rows.append(f"""
SELECT {k} AS it, pa, pb, pa || pb AS merged,
       CAST(cnt AS BIGINT) AS pair_count
FROM bpe_best_{k}""")
    body = "\nUNION ALL".join(rows)
    return (f"WITH {','.join(ctes)}\n"
            f"SELECT * FROM ({body}) allrows"
            f" WHERE pa IS NOT NULL ORDER BY it")


def corpus_bpe_merges(spark: SparkSession, sf_dir: str,
                      n_merges: int = BPE_MERGES) -> DataFrame:
    """BPE merge training, Spark path: the corpus collapses to the
    (symbols, count) vocabulary once; each iteration counts pairs
    distributed, collects the ONE best row (bounded driver collect —
    the codebook/centroid discipline), inlines it as literals into the
    merge expression, and checkpoints the merged vocabulary. Semantics
    identical to bpe_merges_sql (the oracle); see module docstring."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = (docs.select(F.explode(F.split("text", " +")).alias("tok"))
            .where((F.col("tok") != "")
                   & F.col("tok").rlike("^[a-z0-9]+$")))
    spaced = F.regexp_replace(
        F.substring("tok", 1, BPE_MAX_TOKEN_CHARS), "(.)", "$1 ")
    vocab = (toks.groupBy("tok").agg(F.count("*").alias("c"))
             .select(F.concat(F.trim(spaced), F.lit(f" {BPE_EOW}"))
                     .alias("s"), "c")
             .localCheckpoint(eager=True))
    out = []
    for k in range(1, n_merges + 1):
        arr = F.split("s", " ")
        pairs = (vocab.select(arr.alias("a"), "c")
                 .select("a", "c",
                         F.explode(F.sequence(
                             F.lit(1),
                             F.lit(2 * BPE_MAX_TOKEN_CHARS - 1)))
                         .alias("i"))
                 .where(F.col("i") < F.size("a"))
                 .groupBy(F.element_at("a", F.col("i").cast("int"))
                          .alias("pa"),
                          F.element_at("a", (F.col("i") + 1).cast("int"))
                          .alias("pb"))
                 .agg(F.sum("c").alias("cnt")))
        best = pairs.orderBy(F.col("cnt").desc(), "pa", "pb") \
            .limit(1).collect()
        if not best:
            break
        pa, pb, cnt = best[0].pa, best[0].pb, best[0].cnt
        out.append((k, pa, pb, pa + pb, int(cnt)))
        # literal (non-regex) replace with the collected pair inlined
        vocab = (vocab.selectExpr(
            f"trim(replace(' ' || s || ' ', "
            f"' ' || {_sql_str(pa)} || ' ' || {_sql_str(pb)} || ' ', "
            f"' ' || {_sql_str(pa)} || {_sql_str(pb)} || ' ')) AS s",
            "c").localCheckpoint(eager=True))
    return spark.createDataFrame(
        out, "it int, pa string, pb string, merged string,"
             " pair_count bigint").orderBy("it")


def _sql_str(s: str) -> str:
    """Single-quoted SQL string literal (symbols are ASCII [a-z0-9]
    or the </w> marker — no quoting hazards, asserted anyway)."""
    assert "'" not in s and "\\" not in s, s
    return "'" + s + "'"
