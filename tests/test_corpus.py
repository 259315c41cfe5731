"""Corpus-curation operators: decontamination, repetition, stratified
sampling, vocabulary top-k (operators/corpus.py)."""

from __future__ import annotations

import pytest

from catalog_pii_scanner_spark.operators.corpus import (
    decontaminate_docs, doc_kgrams, repetition_docs,
    stratified_sample_docs, vocab_topk_docs)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, "
                                       "lang string")


def test_kgrams_window_and_tail(spark):
    docs = _docs(spark, [(1, "a b c d", "en"), (2, "x", "en")])
    grams = sorted((r.doc_id, r.gram)
                   for r in doc_kgrams(docs, 3).collect())
    # doc 2 has < 3 tokens -> no grams; doc 1 drops tail partials
    assert grams == [(1, "a b c"), (1, "b c d")]


def test_decontaminate_flags_overlap(spark):
    # doc 0 is benchmark (0 % mod == 0); doc 1 copies its 13-gram run;
    # doc 2 shares nothing.
    bench_text = " ".join(f"w{i}" for i in range(15))
    docs = _docs(spark, [
        (0, bench_text, "en"),
        (1, "intro " + " ".join(f"w{i}" for i in range(13)) + " outro",
         "en"),
        (2, "totally different words only here", "en"),
    ])
    got = {r.doc_id: r for r in decontaminate_docs(docs).collect()}
    assert set(got) == {1, 2}  # benchmark doc excluded from output
    assert got[1].contaminated and got[1].n_hits == 1
    assert not got[2].contaminated and got[2].n_hits == 0


def test_repetition_stats(spark):
    docs = _docs(spark, [
        (1, "a b a b a", "en"),   # 2-grams: ab ba ab ba -> 4 total, 2 distinct
        (2, "solo", "en"),        # < 2 tokens -> zeros
        (3, "p q r", "en"),       # all distinct
    ])
    got = {r.doc_id: r for r in repetition_docs(docs).collect()}
    assert (got[1].n_grams, got[1].n_distinct) == (4, 2)
    assert got[1].dup_gram_frac == 0.5 and got[1].top_gram_share == 0.5
    assert (got[2].n_grams, got[2].dup_gram_frac) == (0, 0.0)
    assert got[3].dup_gram_frac == 0.0 and got[3].top_gram_share == 0.5


def test_stratified_sample_quota_and_determinism(spark):
    rows = [(i, f"text {i}", "en" if i % 3 else "fr") for i in range(40)]
    docs = _docs(spark, rows)
    a = sorted(map(tuple, stratified_sample_docs(docs, quota=5).collect()))
    b = sorted(map(tuple, stratified_sample_docs(docs, quota=5).collect()))
    assert a == b  # deterministic under re-run
    per_lang = {}
    for lang, rk, _ in a:
        per_lang.setdefault(lang, []).append(rk)
    assert all(sorted(v) == list(range(1, 6)) for v in per_lang.values())


def test_vocab_topk_tiebreak(spark):
    docs = _docs(spark, [(1, "b a b a c", "en"), (2, "A c", "en")])
    got = [(r.rk, r.token, r.n) for r in vocab_topk_docs(docs, 3).collect()]
    # a:3 (one uppercased), b:2, c:2 -> ties b/c break token-asc
    assert got == [(1, "a", 3), (2, "b", 2), (3, "c", 2)]


def test_tfidf_keywords_ranks_distinctive_tokens(spark):
    from catalog_pii_scanner_spark.operators.corpus import (
        tfidf_keywords_docs)
    # "zebra" appears only in doc 1 -> highest idf there; "common" is in
    # every doc -> idf ln(4/4)=0 -> never a keyword.
    docs = _docs(spark, [
        (1, "common zebra common", "en"),
        (2, "common apple apple", "en"),
        (3, "common berry", "en"),
    ])
    got = {}
    for r in tfidf_keywords_docs(docs, k=2).collect():
        got.setdefault(r.doc_id, []).append((r.rk, r.token, r.tfidf))
    assert got[1][0][1] == "zebra"
    assert got[2][0][1] == "apple"
    # "common" scores exactly 0 -> ranked below any positive token
    for doc, kws in got.items():
        toks = [t for _, t, s in kws if s > 0]
        assert "common" not in toks


def test_pack_sequences_matches_global_cumsum(spark):
    from catalog_pii_scanner_spark.operators.corpus import (
        pack_sequences_docs)
    rows = [(i, " ".join(f"t{j}" for j in range(3 + i % 7)), "en")
            for i in range(60)]
    docs = _docs(spark, rows)
    got = {r.doc_id: r for r in
           pack_sequences_docs(docs, budget=16).collect()}
    # reference semantics: one global cumsum over (md5(doc_id), doc_id)
    import hashlib
    order = sorted(rows, key=lambda r: (hashlib.md5(
        str(r[0]).encode()).hexdigest(), r[0]))
    start = 0
    covered = set()
    for doc_id, text, _ in order:
        n = len(text.split(" "))
        r = got[doc_id]
        assert (r.start_tok, r.n_tokens) == (start, n), doc_id
        assert r.seq_id == start // 16
        assert r.straddles == (start // 16 != (start + n - 1) // 16)
        covered.update(range(start // 16, (start + n - 1) // 16 + 1))
        start += n
    # chunking covers every sequence id in [0, ceil(total/16)) — no gaps
    assert covered == set(range(-(-start // 16)))


def test_temperature_sample_quota_shape(spark):
    from catalog_pii_scanner_spark.operators.corpus import (
        temperature_sample_docs)
    rows = [(i, f"text {i}", "en", "big" if i < 36 else "small")
            for i in range(40)]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string")
    got = temperature_sample_docs(docs, scale=1.0).collect()
    per_src = {}
    for r in got:
        per_src.setdefault(r.source, []).append(r.rk)
    # big: 36 docs -> quota floor(sqrt(36))=6; small: 4 -> quota 2
    assert sorted(per_src["big"]) == list(range(1, 7))
    assert sorted(per_src["small"]) == [1, 2]
    # rerun is deterministic
    again = temperature_sample_docs(docs, scale=1.0).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_curate_reason_precedence(spark):
    from catalog_pii_scanner_spark.operators.corpus import curate_docs
    bench_text = " ".join(f"w{i}" for i in range(20))
    rows = [
        (0, bench_text, "en"),                      # benchmark (excluded)
        # contaminated AND repetitive -> contamination wins
        (1, bench_text + " " + bench_text, "en"),
        # highly repetitive only
        (2, " ".join(["dup"] * 30), "en"),
        # clean prose-ish doc: keep
        (3, "the quick brown fox jumps over the lazy dog and then "
            "the fox rests while the dog watches the quiet field", "en"),
    ]
    docs = _docs(spark, rows)
    got = {r.doc_id: r for r in curate_docs(docs, spark).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1].drop_reason == "contaminated" and not got[1].keep
    assert got[2].drop_reason == "repetitive" and not got[2].keep
    assert got[3].keep and got[3].drop_reason is None


def test_unigram_logprob_orders_docs_by_surprise(spark):
    from catalog_pii_scanner_spark.operators.corpus import (
        unigram_logprob_docs)
    import math
    docs = _docs(spark, [
        (1, "the the the the", "en"),     # all common -> low surprise
        (2, "the zig zag qux", "en"),     # mostly rare -> high surprise
    ])
    got = {r.doc_id: r for r in unigram_logprob_docs(docs).collect()}
    assert got[1].n_tokens == 4 and got[2].n_tokens == 4
    assert got[1].avg_neg_logp < got[2].avg_neg_logp
    # doc 1: every token is 'the' (5 of 8 corpus tokens)
    assert got[1].avg_neg_logp == round(round(-math.log(5 / 8), 6), 6)


def test_bigram_logprob_exact_transition_costs(spark):
    """MLE conditional: cost(w1 w2) = -ln(c(w1 w2)/c(w1->*)); docs with
    <2 tokens produce no row."""
    from catalog_pii_scanner_spark.operators.corpus import (
        bigram_logprob_docs)
    import math
    docs = _docs(spark, [
        (1, "a b a b", "en"),   # bigrams: 'a b'x2, 'b a'
        (2, "a c", "en"),       # bigram: 'a c'
        (3, "solo", "en"),      # no bigram -> no row
    ])
    got = {r.doc_id: r for r in bigram_logprob_docs(docs).collect()}
    assert set(got) == {1, 2}
    assert got[1].n_bigrams == 3 and got[2].n_bigrams == 2 - 1
    # contexts: a->3 ('a b' x2 + 'a c'), b->1 ('b a')
    c_ab = round(-math.log(2 / 3), 6)
    c_ba = round(-math.log(1 / 1), 6)
    c_ac = round(-math.log(1 / 3), 6)
    assert got[1].avg_neg_logp == round((2 * c_ab + c_ba) / 3, 6)
    assert got[2].avg_neg_logp == round(c_ac, 6)
    # repeated transitions are cheaper than novel ones
    assert got[1].avg_neg_logp < got[2].avg_neg_logp


def test_length_quantiles_approx_close_to_exact(spark):
    from catalog_pii_scanner_spark.operators.textstats import (
        length_quantiles)
    sf = "/root/testdata/sf0.001"
    exact = {r.lang: r for r in length_quantiles(spark, sf).collect()}
    approx = {r.lang: r for r in
              length_quantiles(spark, sf, approx=True).collect()}
    assert set(exact) == set(approx)
    for lang, e in exact.items():
        a = approx[lang]
        assert a.n == e.n
        for col in ("p50", "p90", "p99"):
            # t-digest sketch within 10% relative of the exact value
            assert abs(getattr(a, col) - getattr(e, col)) \
                <= 0.1 * max(getattr(e, col), 1.0), (lang, col)


def test_dedup_keep_list_cli_rerun_is_byte_stable(spark, sf_dir, tmp_path,
                                                  monkeypatch, capsys):
    """The training-data pipeline's reproducibility contract: re-running
    the keep-list CLI over the same corpus writes the IDENTICAL parquet
    (same partition files, same bytes) — the keep/drop verdict is a
    deterministic function of the corpus, with no wall-clock, random, or
    scheduling dependence."""
    import hashlib
    import json
    import os
    import catalog_pii_scanner_spark.cli as cli

    monkeypatch.setattr(cli, "_spark", lambda app: spark)

    def file_hashes(d):
        # part-file NAMES embed Spark's per-job UUID; the contract is on
        # the CONTENT: the sorted multiset of per-file byte hashes
        out = []
        for name in sorted(os.listdir(d)):
            if name.endswith(".parquet"):
                with open(os.path.join(d, name), "rb") as f:
                    out.append(hashlib.sha256(f.read()).hexdigest())
        return sorted(out)

    outs = []
    for run in ("a", "b"):
        out = str(tmp_path / f"keep_{run}")
        assert cli.main(["dedup", "--sf-dir", sf_dir, "--out", out]) == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["true"] > 0                  # keep-list is non-trivial
        outs.append(file_hashes(out))
    assert outs[0] and outs[0] == outs[1]


def test_corpus_split_is_stable_under_growth(spark):
    """Hash-range assignment: a doc's split never changes when the corpus
    grows, every doc gets exactly one split, fractions are roughly
    honored."""
    from catalog_pii_scanner_spark.operators.corpus import split_docs
    small = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    s_small = {r.doc_id: r.split for r in split_docs(small).collect()}
    s_big = {r.doc_id: r.split for r in split_docs(big).collect()}
    assert all(s_big[d] == s for d, s in s_small.items())
    from collections import Counter
    frac = Counter(s_big.values())
    assert set(frac) == {"train", "val", "test"}
    assert 0.85 <= frac["train"] / 2000 <= 0.95
    assert frac["val"] + frac["test"] <= 0.2 * 2000


def test_char_entropy_hand_check(spark):
    """Uniform chars -> ln(k); constant char -> 0; computed per doc."""
    import math
    from catalog_pii_scanner_spark.operators.corpus import (
        char_entropy_docs)
    docs = spark.createDataFrame(
        [(1, "aaaa", "en"), (2, "abcd", "en"), (3, "aabb", "en")],
        "doc_id bigint, text string, lang string")
    got = {r.doc_id: r for r in char_entropy_docs(docs).collect()}
    assert got[1].entropy == 0.0 and got[1].n_distinct_chars == 1
    # per-term rounding to 1e-6 before the sum, as the operator computes
    t4 = round(0.25 * math.log(4), 6)
    assert got[2].entropy == round(4 * t4, 6)
    t2 = round(0.5 * math.log(2), 6)
    assert got[3].entropy == round(2 * t2, 6)
    assert all(r.n_chars_used == 4 for r in got.values())


def test_substring_dedup_hand_check(spark):
    """Cross-doc W-token window dedup (Lee-et-al span signal): two docs
    share an exact 10-token run; a third is unique. With W=8 the shared
    run yields 3 windows per sharing doc, merged into one run of 3."""
    from catalog_pii_scanner_spark.operators.corpus import (
        substring_dup_docs)
    shared = "a b c d e f g h i j"            # 10 tokens
    docs = spark.createDataFrame(
        [(1, shared + " unique1 tail1"),
         (2, "lead2 " + shared + " tail2"),
         (3, "totally different words with no overlap at all here")],
        "doc_id bigint, text string")
    rows = {r.doc_id: r for r in substring_dup_docs(docs, w=8).collect()}
    # doc1: 12 tokens -> 5 windows; starts 0..2 lie inside the shared run
    assert (rows[1].n_windows, rows[1].n_dup_windows,
            rows[1].max_dup_run) == (5, 3, 3)
    assert rows[1].dup_ratio == 0.6
    # doc2: 12 tokens -> 5 windows; shared run starts at token 1 -> 1..3
    assert (rows[2].n_windows, rows[2].n_dup_windows,
            rows[2].max_dup_run) == (5, 3, 3)
    # doc3: 9 tokens -> 2 windows, none duplicated
    assert (rows[3].n_windows, rows[3].n_dup_windows,
            rows[3].max_dup_run) == (2, 0, 0)


def test_bm25_hand_check(spark):
    """BM25 on a 3-doc corpus matches a from-scratch numpy derivation
    (independent of the DuckDB oracle): Lucene IDF, Robertson tf
    saturation, length normalization, rounded-then-ranked."""
    import math

    from catalog_pii_scanner_spark.operators.corpus import (
        BM25_B, BM25_K1, bm25_topk_docs)
    docs = spark.createDataFrame(
        [(0, "spark join spark", "en", "s", 16),
         (1, "join table scan", "en", "s", 15),
         (2, "value row line column agg window", "en", "s", 32)],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint")
    rows = {(r.query_id, r.doc_id): (r.rank, r.score)
            for r in bm25_topk_docs(
                docs, queries=((7, "spark join"),), k=3).collect()}

    tf = {0: {"spark": 2, "join": 1},
          1: {"join": 1, "table": 1, "scan": 1},
          2: {w: 1 for w in "value row line column agg window".split()}}
    dl = {d: sum(c.values()) for d, c in tf.items()}
    avgdl = sum(dl.values()) / 3
    df = {"spark": 1, "join": 2}

    def score(d):
        s = 0.0
        for t in ("spark", "join"):
            f = tf[d].get(t, 0)
            if not f:
                continue
            idf = math.log(1.0 + (3 - df[t] + 0.5) / (df[t] + 0.5))
            contrib = idf * f * (BM25_K1 + 1) / (
                f + BM25_K1 * (1 - BM25_B + BM25_B * dl[d] / avgdl))
            s += round(contrib, 6)
        return round(s, 6)

    assert rows[(7, 0)][1] == pytest.approx(score(0), abs=1e-9)
    assert rows[(7, 1)][1] == pytest.approx(score(1), abs=1e-9)
    assert (7, 2) not in rows                     # no matching term
    # doc 0 (spark x2 + join) outranks doc 1 (join only)
    assert rows[(7, 0)][0] == 1 and rows[(7, 1)][0] == 2


def test_chunk_overlap_hand_check(spark):
    """Chunking math on a crafted doc: 10 tokens, size 4, stride 3 ->
    starts 0,3,6,9; the last chunk is short; empty/NULL docs emit no
    chunks; multi-space splits collapse."""
    from catalog_pii_scanner_spark.operators.corpus import (
        chunk_overlap_docs)
    toks = [f"t{i}" for i in range(10)]
    docs = spark.createDataFrame(
        [(1, "  ".join(toks), "en", "s", 0),
         (2, "", "en", "s", 0),
         (3, None, "en", "s", 0)],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint")
    rows = sorted(
        (r.doc_id, r.chunk_no, r.n_tokens, r.chunk_text)
        for r in chunk_overlap_docs(docs, size=4, stride=3).collect())
    assert rows == [
        (1, 0, 4, "t0 t1 t2 t3"),
        (1, 1, 4, "t3 t4 t5 t6"),
        (1, 2, 4, "t6 t7 t8 t9"),
        (1, 3, 1, "t9"),
    ]


def test_cdc_chunks_realign_after_insertion(spark):
    """The CDC selling point: a head insertion shifts every byte, but
    content-defined boundaries re-align downstream, so most chunk
    fingerprints still match the original (fixed-stride chunking would
    share ~none). Also pins cross-engine equality on an edge corpus
    (empty doc, sub-gram doc, exact duplicate)."""
    import random

    import duckdb

    from catalog_pii_scanner_spark.operators.corpus import (cdc_dedup_sql)

    rng = random.Random(3)
    words = ["alpha", "bravo", "china", "delta", "echo", "fox", "golf"]
    text = " ".join(rng.choice(words) for _ in range(400))
    docs = [(0, text), (1, "zzz inserted head " + text),
            (2, ""), (3, "ab"), (4, text)]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    sdf.createOrReplaceTempView("cdc_docs")
    got = {r.doc_id: r for r in spark.sql(
        cdc_dedup_sql("spark", "cdc_docs")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    want = sorted(map(tuple, con.execute(
        cdc_dedup_sql("duckdb", "documents")).fetchall()))
    assert sorted((r.doc_id, r.n_chunks, r.n_dup_chunks, r.dup_chars,
                   r.total_chars, r.dup_ratio)
                  for r in got.values()) == want
    # doc 0 vs its head-shifted copy: boundaries re-align, so the bulk
    # of doc 1's chars sit in chunks doc 0 (or 4) also has
    assert got[1].dup_ratio >= 0.8, got[1]
    # exact duplicate: every chunk shared
    assert got[4].dup_ratio == 1.0
    # edge rows survive with zero-chunk verdicts
    assert got[2].n_chunks == 0 and got[2].dup_ratio == 0.0
    assert got[3].n_chunks == 1


def test_cdc_chunks_partition_the_text_exactly(spark):
    """Brute-force differential: re-derive the chunking in plain Python
    (md5 of every gram, boundary scan, sequential split) and assert the
    SQL's per-doc chunk count and char totals match, and that chunks
    partition the capped text exactly (no gap, no overlap)."""
    import hashlib
    import random

    from catalog_pii_scanner_spark.operators.corpus import (
        CDC_CHAR_CAP, CDC_DIVISOR, CDC_W, cdc_dedup_sql)

    rng = random.Random(9)
    words = ["kilo", "lima", "mike", "nov", "osc", "papa"]
    docs = [(i, " ".join(rng.choice(words)
                         for _ in range(rng.randint(5, 300))))
            for i in range(40)]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    sdf.createOrReplaceTempView("cdc_part_docs")
    got = {r.doc_id: r for r in spark.sql(
        cdc_dedup_sql("spark", "cdc_part_docs")).collect()}

    def bucket16(g: str) -> int:
        return int(hashlib.md5(g.encode()).hexdigest()[:4], 16)

    for doc_id, text in docs:
        t = text[:CDC_CHAR_CAP]
        starts = [1] + [p for p in range(1, len(t) - CDC_W + 2)
                        if p != 1
                        and bucket16(t[p - 1:p - 1 + CDC_W])
                        % CDC_DIVISOR == 0]
        # p=1 may also satisfy the boundary condition; dedup like the SQL
        starts = sorted(set(starts))
        chunks = [t[s - 1:(starts[i + 1] - 1 if i + 1 < len(starts)
                           else len(t))]
                  for i, s in enumerate(starts)]
        assert "".join(chunks) == t, doc_id          # exact partition
        r = got[doc_id]
        assert r.n_chunks == len(chunks), doc_id
        assert r.total_chars == len(t), doc_id
