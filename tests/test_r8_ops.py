"""Semantic invariants for the r8 operator family: Count-Min sketch,
HLL union merge, line-level (segment) dedup, fuzzy MinHash
decontamination, and the compaction planner. The cross-engine hash
gate lives in tools/selfcheck.py; these pin the MATH — CMS one-sided
error, register-merge bit-identity, keep-first verdicts, next-fit bin
arithmetic — mostly on the DuckDB rendering of the shared dual-dialect
templates (same SQL text both engines run)."""

from __future__ import annotations

import hashlib

import duckdb

from catalog_pii_scanner_spark.operators.corpus import (
    LINE_SEG_TOKENS, line_dedup_oracle_sql, minhash_decontaminate_docs,
    minhash_decontaminate_oracle_sql)
from catalog_pii_scanner_spark.operators.layout import (
    COMPACT_TARGET_BYTES, compaction_plan_sql)
from catalog_pii_scanner_spark.operators.sketches import (
    CMS_D, CMS_W, cms_counters_sql, cms_heavy_hitters_sql,
    hll_union_sql)

from conftest import SF_DIR


def _duck_with_views(tables):
    con = duckdb.connect()
    for t in tables:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _duck_docs(rows):
    """(doc_id, text, source, n_chars) literal documents relation."""
    con = duckdb.connect()
    vals = ", ".join(
        f"({i}, '{t}', 'src{i % 3}', {len(t)})" for i, t in rows)
    con.sql(f"CREATE VIEW documents AS SELECT * FROM (VALUES {vals})"
            f" _v(doc_id, text, source, n_chars)")
    return con


# --- Count-Min ----------------------------------------------------------------

def _python_cms_bucket(j: int, tok: str) -> int:
    """Independent reimplementation of the operator's bucket spec."""
    h = hashlib.md5(f"{j}:{tok}".encode()).hexdigest()
    return (int(h[0], 16) * 256 + int(h[1], 16) * 16
            + int(h[2], 16)) % CMS_W


def test_cms_est_is_one_sided_and_buckets_match_python():
    con = _duck_with_views(["documents"])
    rows = con.sql(cms_heavy_hitters_sql("duckdb")).fetchall()
    assert len(rows) == 20
    for token, exact, est, over_bp in rows:
        # the CMS guarantee: collisions only ever ADD counts
        assert est >= exact, token
        assert over_bp >= 0, token
    # independent bucket math: probe one token through the counter
    # state and confirm MIN over its CMS_D buckets == the query's est
    counters = {(rj, b): t for rj, b, t in
                con.sql(cms_counters_sql("duckdb")).fetchall()}
    token, exact, est, _ = rows[0]
    mins = min(counters[(j, _python_cms_bucket(j, token))]
               for j in range(CMS_D))
    assert mins == est


def test_cms_counter_rows_conserve_total_per_hash_row():
    """Every hash row sees every increment: SUM(total) is identical
    across the CMS_D rows and equals the token-stream length."""
    con = _duck_with_views(["documents"])
    sums = dict(con.sql(
        f"SELECT rj, SUM(total) FROM ({cms_counters_sql('duckdb')}) _c"
        f" GROUP BY rj").fetchall())
    stream_len = con.sql(
        "SELECT COUNT(*) FROM (SELECT unnest(regexp_split_to_array("
        "text, ' +')) AS tok FROM documents) _e WHERE tok <> ''"
    ).fetchone()[0]
    assert set(sums) == set(range(CMS_D))
    assert all(v == stream_len for v in sums.values())


# --- HLL union ----------------------------------------------------------------

def test_hll_union_merge_is_bit_identical_to_direct_sketch():
    """MAX-merging the two parity-slice register tables must equal
    sketching the whole column directly — same z_scaled, same
    estimate (the never-rescan union property)."""
    con = _duck_with_views(["events", "orders", "lineitem",
                            "documents"])
    rows = {(r[0], r[1]): r for r in
            con.sql(hll_union_sql("duckdb")).fetchall()}
    # direct whole-column sketch, via the same register CTE spec
    from catalog_pii_scanner_spark.operators.sketches import (
        hll_distinct_sql)
    direct = {r[0]: r for r in
              con.sql(hll_distinct_sql("duckdb")).fetchall()}
    for colref in ("events.user_id", "orders.o_custkey"):
        u = rows[(colref, "union")]
        d = direct[colref]
        # (col_ref, part, m, v_zero, z_hi, z_lo, est, exact) vs
        # (col_ref, m, v_zero, z_hi, z_lo, est, exact, err_bp)
        assert u[3:7] == d[2:6], colref
        # parity slices have disjoint value sets: exacts add up
        assert (rows[(colref, "even")][7] + rows[(colref, "odd")][7]
                == u[7]), colref


# --- line dedup ----------------------------------------------------------------

def _seg(words, n=LINE_SEG_TOKENS):
    return " ".join(words[i % len(words)] + str(i) for i in range(n))


def test_line_dedup_keep_first_and_token_conservation():
    shared = _seg(["dup"])          # one full 16-token segment
    uniq = [_seg([w]) for w in ("aa", "bb", "cc")]
    rows = [(1, f"{shared} {uniq[0]}"),
            (5, f"{shared} {uniq[1]}"),   # later carrier: drop
            (9, uniq[2])]
    con = _duck_docs(rows)
    out = {r[0]: r for r in con.sql(line_dedup_oracle_sql()).fetchall()}
    # doc 1 is the min-doc_id carrier: keeps both segments
    assert out[1] == (1, 2, 0, 32, 0)
    # doc 5 drops exactly the shared segment
    assert out[5] == (5, 2, 1, 16, 16)
    assert out[9] == (9, 1, 0, 16, 0)
    for doc_id, (_, n_seg, n_drop, kept, dropped) in out.items():
        assert n_drop <= n_seg
        assert kept + dropped == 32 if doc_id != 9 else 16


def test_line_dedup_short_segments_never_drop():
    """A shared trailing segment below LINE_SEG_MIN_TOKENS is a chance
    collision, not boilerplate — must be kept everywhere."""
    short = "x1 x2 x3"   # 3 tokens, shared verbatim
    rows = [(1, f"{_seg(['aa'])} {short}"),
            (2, f"{_seg(['bb'])} {short}")]
    con = _duck_docs(rows)
    out = {r[0]: r for r in con.sql(line_dedup_oracle_sql()).fetchall()}
    assert out[1][2] == 0 and out[2][2] == 0


# --- fuzzy decontamination -----------------------------------------------------

def _decon_corpus():
    base = " ".join(f"tok{i}" for i in range(40))
    para = " ".join(f"tok{i}" for i in range(38)) + " tokX tokY"
    clean = " ".join(f"other{i}" for i in range(40))
    # doc 0 is benchmark (0 % 37 == 0); 1 is a light paraphrase of it;
    # 2 is unrelated
    return [(0, base), (1, para), (2, clean)]


def test_minhash_decontaminate_flags_paraphrase_only():
    con = _duck_docs(_decon_corpus())
    out = {r[0]: r for r in
           con.sql(minhash_decontaminate_oracle_sql()).fetchall()}
    assert set(out) == {1, 2}          # bench doc 0 excluded
    assert out[1][3] is True and out[1][1] >= 1
    assert out[1][2] > 0.8             # near-identical shingle sets
    assert out[2] == (2, 0, 0.0, False)


def test_minhash_decontaminate_spark_matches_oracle(spark):
    docs = spark.createDataFrame(
        [(i, t, "src", len(t)) for i, t in _decon_corpus()],
        "doc_id long, text string, source string, n_chars long")
    got = sorted(map(tuple,
                     minhash_decontaminate_docs(docs).collect()))
    con = _duck_docs(_decon_corpus())
    want = sorted(map(tuple,
                      con.sql(minhash_decontaminate_oracle_sql())
                      .fetchall()))
    assert got == want


# --- compaction planner --------------------------------------------------------

def test_compaction_plan_next_fit_literal():
    con = duckdb.connect()
    t = COMPACT_TARGET_BYTES  # 4096
    inv = [(1, t - 100), (2, 200), (3, 50),        # 2 straddles: bin 0
           (4, 3000), (5, 2000),                   # 4 starts bin 1
           (6, 1)]                                 # starts 9246 -> bin 2
    vals = ", ".join(f"('p', {i}, 'x', {b})" for i, b in inv)
    con.sql(f"CREATE VIEW documents AS SELECT * FROM (VALUES {vals})"
            f" _v(source, doc_id, text, n_chars)")
    out = con.sql(compaction_plan_sql("duckdb")).fetchall()
    assert out == [
        ("p", 0, 2, t + 100, 10244),   # files 1,2 (file 2 overflows)
        ("p", 1, 3, 5050, 12329),      # files 3,4,5
        ("p", 2, 1, 1, 2),             # file 6
    ]


def test_compaction_plan_conserves_bytes():
    con = _duck_with_views(["documents"])
    planned = con.sql(
        f"SELECT SUM(total_bytes), SUM(n_files) FROM "
        f"({compaction_plan_sql('duckdb')}) _p").fetchone()
    raw = con.sql("SELECT SUM(n_chars), COUNT(*) FROM documents"
                  " WHERE n_chars IS NOT NULL AND n_chars > 0"
                  ).fetchone()
    assert planned == raw


# --- streaming CMS drain -------------------------------------------------------

def test_stream_cms_counters_matches_batch_across_microbatches(
        spark, tmp_path, sf_dir):
    """SUM-merged per-microbatch counters must be BIT-identical to the
    batch counter state regardless of file splits: stripe documents
    into 12 files (maxFilesPerTrigger=4 -> >= 2 microbatches)."""
    import glob

    from pyspark.sql import functions as F

    from catalog_pii_scanner_spark.streaming.watcher import (
        stream_cms_counters)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = str(tmp_path)
    (docs.repartition(12, F.pmod(F.col("doc_id"), F.lit(12)))
     .write.mode("overwrite").parquet(f"{d}/documents.parquet"))
    assert len(glob.glob(f"{d}/documents.parquet/part-*")) >= 5

    spark.read.parquet(f"{d}/documents.parquet") \
        .createOrReplaceTempView("cpss_cms_batch_twin")
    batch = sorted(map(tuple, spark.sql(
        cms_counters_sql("spark", "cpss_cms_batch_twin")).collect()))
    stream = sorted(map(tuple, stream_cms_counters(spark, d).collect()))
    assert batch and batch == stream


# --- hard-negative mining ------------------------------------------------------

def test_hard_negatives_are_label_mismatched_topk():
    from catalog_pii_scanner_spark.operators.simsearch import (
        cosine_topk_sql, hard_negatives_sql)
    con = _duck_with_views(["embeddings"])
    rows = con.sql(hard_negatives_sql("duckdb")).fetchall()
    assert rows
    for qid, ql, nid, nl, rank, cosine in rows:
        assert ql != nl
        assert 1 <= rank <= 5
    # consistency with the unfiltered family: for each query, the
    # hard-negative list equals the other-label subsequence of a
    # deep unfiltered top-k (k large enough to cover the corpus)
    deep = con.sql(cosine_topk_sql("duckdb", k=10**6)).fetchall()
    labels = dict(con.sql(
        "SELECT vec_id, label FROM embeddings").fetchall())
    by_q = {}
    for qid, nid, rank, cosine in deep:
        if labels[nid] != labels[qid]:
            by_q.setdefault(qid, []).append((nid, cosine))
    for qid, ql, nid, nl, rank, cosine in rows:
        exp_nid, exp_cos = by_q[qid][rank - 1]
        assert (nid, cosine) == (exp_nid, exp_cos), (qid, rank)


# --- referential-integrity suite -------------------------------------------------

def test_dq_referential_detects_injected_orphans():
    from catalog_pii_scanner_spark.operators.dq import (
        dq_referential_sql)
    con = duckdb.connect()
    con.sql("CREATE VIEW parent AS SELECT * FROM (VALUES (1), (2)) _p(pk)")
    con.sql("CREATE VIEW child AS SELECT * FROM (VALUES "
            "(10, 1), (11, 2), (12, 99), (13, NULL)) _c(id, fk)")
    edges = (("child", "fk", "parent", "pk"),)
    row = con.sql(dq_referential_sql("duckdb", edges=edges)).fetchone()
    # 4 rows, 1 NULL fk, 1 orphan (fk=99), 1/3 non-NULL -> 3333 bp
    assert row == ("child.fk -> parent.pk", 4, 1, 1, 3333, False)


def test_dq_referential_all_edges_pass_on_clean_data():
    from catalog_pii_scanner_spark.operators.dq import (
        FK_EDGES, dq_referential_sql)
    con = _duck_with_views(sorted({t for e in FK_EDGES
                                   for t in (e[0], e[2])}))
    rows = con.sql(dq_referential_sql("duckdb")).fetchall()
    assert len(rows) == len(FK_EDGES)
    assert all(r[5] for r in rows), rows


# --- BPE merge training ----------------------------------------------------------

def _python_bpe(token_counts, n_merges):
    """Independent reference with the operator's exact spec: pairs
    weighted by token count, best = (count DESC, pair ASC), merge via
    str.replace (leftmost non-overlapping) on the padded string."""
    from catalog_pii_scanner_spark.operators.bpe import (
        BPE_EOW, BPE_MAX_TOKEN_CHARS)
    vocab = {}
    for tok, c in token_counts.items():
        s = " ".join(tok[:BPE_MAX_TOKEN_CHARS]) + f" {BPE_EOW}"
        vocab[s] = vocab.get(s, 0) + c
    rules = []
    for it in range(1, n_merges + 1):
        pairs = {}
        for s, c in vocab.items():
            a = s.split(" ")
            for i in range(len(a) - 1):
                pairs[(a[i], a[i + 1])] = pairs.get((a[i], a[i + 1]),
                                                    0) + c
        if not pairs:
            break
        (pa, pb), cnt = min(pairs.items(),
                            key=lambda kv: (-kv[1], kv[0]))
        rules.append((it, pa, pb, pa + pb, cnt))
        vocab = {
            (" " + s + " ").replace(f" {pa} {pb} ",
                                    f" {pa}{pb} ").strip(): c
            for s, c in vocab.items()}
    return rules


def test_bpe_oracle_matches_python_reference():
    from catalog_pii_scanner_spark.operators.bpe import bpe_merges_sql
    con = _duck_with_views(["documents"])
    got = con.sql(bpe_merges_sql("duckdb")).fetchall()
    counts = dict(con.sql(
        "SELECT tok, COUNT(*) FROM (SELECT unnest("
        "regexp_split_to_array(text, ' +')) AS tok FROM documents) _e"
        " WHERE tok <> '' AND regexp_matches(tok, '^[a-z0-9]+$')"
        " GROUP BY tok").fetchall())
    want = _python_bpe(counts, 6)
    assert [tuple(r) for r in got] == want
    # merges must compound: at least one later rule uses an earlier
    # merged symbol (otherwise this is just unigram pair counting)
    merged = {r[3] for r in got}
    assert any(r[1] in merged or r[2] in merged for r in got[1:])


def test_bpe_vocab_merge_collision_semantics():
    """The leftmost-non-overlapping replace: a self-overlapping run
    merges exactly like str.replace in BOTH the dual-dialect template
    and the reference (the documented divergence from re-scanning
    greedy BPE)."""
    from catalog_pii_scanner_spark.operators.bpe import bpe_merges_sql
    rows = [(1, "aaaaa"), (2, "aaaaa"), (3, "aaaaa")]
    con = _duck_docs(rows)
    got = con.sql(bpe_merges_sql("duckdb", n_merges=2)).fetchall()
    counts = {"aaaaa": 3}
    want = _python_bpe(counts, 2)
    assert [tuple(r) for r in got] == want


def test_hll_union_includes_negative_keys():
    """The odd parity slice is % 2 <> 0 (both engines give -1 for
    negative % 2): negative keys must land in exactly one slice and
    survive into the union — the r8 review regression."""
    con = duckdb.connect()
    con.sql("CREATE VIEW events AS SELECT * FROM (VALUES "
            "(1, TIMESTAMP '2024-01-01', -3), "
            "(2, TIMESTAMP '2024-01-01', -4), "
            "(3, TIMESTAMP '2024-01-01', 5)) _v(event_id, ts, user_id)")
    con.sql("CREATE VIEW orders AS SELECT * FROM (VALUES (1, 1))"
            " _o(o_orderkey, o_custkey)")
    rows = {(r[0], r[1]): r for r in
            con.sql(hll_union_sql("duckdb")).fetchall()}
    u = rows[("events.user_id", "union")]
    # (col_ref, part, m, v_zero, z_hi, z_lo, est, exact): exact is [7]
    assert u[7] == 3                          # all three users counted
    assert (rows[("events.user_id", "even")][7]
            + rows[("events.user_id", "odd")][7]) == 3


def test_dq_referential_empty_child_counts_are_zero_not_null():
    from catalog_pii_scanner_spark.operators.dq import (
        dq_referential_sql)
    con = duckdb.connect()
    con.sql("CREATE VIEW parent AS SELECT * FROM (VALUES (1)) _p(pk)")
    con.sql("CREATE VIEW child AS SELECT * FROM (VALUES (1, 1)) _c"
            "(id, fk) WHERE 1 = 0")
    edges = (("child", "fk", "parent", "pk"),)
    row = con.sql(dq_referential_sql("duckdb", edges=edges)).fetchone()
    assert row == ("child.fk -> parent.pk", 0, 0, 0, 0, True)


# --- BPE encoding (r9) --------------------------------------------------------

def _python_bpe_encode(texts, n_merges):
    """Independent encode reference: train via _python_bpe, apply the
    rules in order with the same padded str.replace, count symbols."""
    from catalog_pii_scanner_spark.operators.bpe import (
        BPE_EOW, BPE_MAX_TOKEN_CHARS)
    import re
    counts = {}
    for t in texts.values():
        for tok in re.split(" +", t):
            if tok and re.fullmatch("[a-z0-9]+", tok):
                counts[tok] = counts.get(tok, 0) + 1
    rules = _python_bpe(counts, n_merges)
    out = {}
    for doc_id, t in texts.items():
        toks = [tok for tok in re.split(" +", t) if tok]
        n_enc = n_bpe = 0
        for tok in toks:
            if not re.fullmatch("[a-z0-9]+", tok):
                continue
            s = " ".join(tok[:BPE_MAX_TOKEN_CHARS]) + f" {BPE_EOW}"
            for _, pa, pb, _, _ in rules:
                s = (" " + s + " ").replace(
                    f" {pa} {pb} ", f" {pa}{pb} ").strip()
            n_enc += 1
            n_bpe += len(s.split(" "))
        out[doc_id] = (len(toks), n_enc, n_bpe)
    return out


def test_bpe_encode_matches_python_reference():
    from catalog_pii_scanner_spark.operators.bpe import bpe_encode_sql
    rows = [(1, "lower lowest low low"), (2, "new newer newest"),
            (3, "low UPPER low 9lives"), (4, "wide wider widest er er")]
    con = _duck_docs(rows)
    got = {r[0]: (r[1], r[2], r[3])
           for r in con.sql(bpe_encode_sql("duckdb")).fetchall()}
    want = _python_bpe_encode({i: t for i, t in rows}, 6)
    assert got == want
    # the non-universe token (UPPER) is counted but not encoded;
    # 9lives IS in the [a-z0-9]+ universe
    assert got[3][0] == 4 and got[3][1] == 3


def test_bpe_encode_compresses():
    """After 6 merges the corpus BPE length must be strictly below the
    character count (+EOW) baseline — the merges actually apply."""
    from catalog_pii_scanner_spark.operators.bpe import bpe_encode_sql
    rows = [(i, "merge merger merged merges") for i in range(4)]
    con = _duck_docs(rows)
    got = con.sql(bpe_encode_sql("duckdb")).fetchall()
    for _, n_tokens, n_enc, n_bpe in got:
        baseline = sum(len(t) + 1 for t in
                       "merge merger merged merges".split())
        assert n_enc == n_tokens == 4
        assert n_bpe < baseline
