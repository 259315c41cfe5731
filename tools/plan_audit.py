"""Dump physical-plan evidence for the scale-critical queries.

Checks, per query: parquet PushedFilters / ReadSchema (column pruning),
broadcast joins where intended, number of exchanges (shuffles). Output is
a markdown report (PLANS.md) the next round can diff against.

    python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as E
    from catalog_pii_scanner_spark.session import get_spark

    spark = get_spark("plan-audit")
    qs = E.queries()
    audit = [
        ("pii_scan_catalog_tables", "whole-catalog scan"),
        ("pii_ensemble_predictions", "fusion without explode"),
        ("dedup_lsh_near_pairs", "LSH join path"),
        ("dedup_ngram_jaccard", "prefix-filtered similarity join"),
        ("dedup_embed_cosine", "LSH-blocked cosine pairs"),
        ("ann_cosine_topk", "brute-force ANN"),
        ("ann_cosine_matmul", "BLAS mapInPandas serving path"),
        ("ann_lsh_matmul", "LSH one-pass broadcast-probe search"),
        ("ann_ivf_topk", "IVF probe path"),
        ("ann_ivf_matmul", "IVF+BLAS one-pass search"),
        ("ann_pq_topk", "PQ/ADC shortlist + exact re-rank"),
        ("ann_pq_matmul", "PQ LUT-gather serving path"),
        ("ann_ivfpq_matmul", "IVFADC one-pass serving stack"),
        ("corpus_substring_dedup", "cross-doc window dedup"),
        ("multimodal_real_pgm_features", "SQL-built PGM + real decode"),
        ("ann_pq_trained_topk", "unrolled Lloyd train + ADC search"),
        ("multimodal_phash_dedup", "aHash + banded Hamming blocking"),
        ("corpus_bm25_topk", "broadcast terms + salted two-phase top-k"),
        ("stream_dedup_keep_list", "streaming signatures + compaction"),
        ("eval_greedy_metrics", "range join + windows"),
        ("pii_repeated_spans", "position-exact Arrow extraction + fold"),
        ("events_sessions_salted", "bucketed sessions + boundary merge"),
        ("events_hourly", "windowed aggregation"),
        ("corpus_decontaminate", "benchmark-gram broadcast join"),
        ("corpus_repetition", "gram window + reused partitioning"),
        ("corpus_vocab_topk", "partial agg + TakeOrdered top-k"),
        ("corpus_tfidf_keywords", "reduce-before-join tf-idf"),
        ("corpus_pack_sequences", "two-level bucketed prefix sum"),
        ("corpus_temperature_sample", "broadcast quotas + source window"),
        ("corpus_curate", "doc-keyed three-way verdict join"),
        ("pii_overlap_suppressed", "array-fold redaction"),
        ("pii_ensemble_gated", "fusion gate above the distinct"),
        ("llm_budget_plan", "bucketed prefix-sum cost metering"),
        ("events_props_stats", "typed from_json inside codegen"),
        ("events_value_outliers", "decimal moments + broadcast stats"),
        ("pii_candidates_rollup", "one-shuffle grouping sets"),
        ("doc_pii_density", "rule scan over documents + doc-keyed agg"),
        ("corpus_anonymize", "per-doc mask fold, one doc-keyed shuffle"),
        ("corpus_bigram_logprob", "doc-window bigrams + decimal mean"),
        ("dedup_containment", "df-capped prefix-vs-full gram join"),
        ("embed_cluster_mix", "broadcast centroids + per-vector argmax"),
        ("embed_kmeans_lloyd", "iterative refine, checkpointed rounds"),
        ("corpus_curate_pii", "four-way doc-keyed verdict join"),
        ("events_retention", "cohort matrix, broadcast cohort relation"),
        ("events_funnel", "per-stage keyed min + broadcast prev stage"),
        ("events_asof_join", "union + running-last window, one shuffle"),
        ("events_hourly_gapfill", "one-row bounds spine + keyed join"),
        ("corpus_split", "hash-range projection, zero shuffles"),
        ("corpus_char_entropy", "char explode + two keyed aggs"),
        ("pii_incremental_scan", "fingerprint diff -> broadcast "
                                 "action prune -> scan changed cols only"),
        ("sketch_kmv_distinct", "KMV: pruned scans + partial DISTINCT "
                                "+ TakeOrdered k"),
        ("tpch_pricing_summary", "pushed date filter, one-shuffle agg"),
        ("top_customers_by_revenue", "broadcast star join + TakeOrdered"),
        ("monthly_revenue_running", "partition-bounded cumulative window"),
        ("churned_customers", "LEFT ANTI + broadcast dims"),
        ("ann_pq_trained_matmul", "trained-codebook one-pass ADC serve"),
        ("corpus_quality_classifier",
         "hashed-ngram scorer, broadcast weight map, no UDF"),
        ("multimodal_phash_keep_list",
         "banded pairs + components + capped-bucket flag"),
        ("corpus_chunk_overlap", "posexplode windows, zero shuffles"),
        ("stream_phash_keep_list",
         "phash band spool drain + one compaction resolve"),
        ("corpus_cdc_dedup",
         "content-defined chunking, one md5-keyed fingerprint shuffle"),
        ("embed_semdedup_keep_list",
         "within-cell pairs + label propagation + cap flag"),
        ("events_neighbor_window",
         "range self-join via complete 3-bin blocking"),
        ("sketch_hll_distinct",
         "per-column 64-register partial-max shuffle, integer Z"),
        ("bloom_semijoin_filter",
         "63-bit-word Bloom build + broadcast word probes"),
        ("dq_constraint_suite",
         "one aggregation pass per table, stack unpivot"),
        ("layout_zorder_stats",
         "morton bucketing, one fact shuffle, broadcast probes"),
        ("embed_jl_topk",
         "JL projection shortlist + shortlist-only exact re-rank"),
        ("sketch_histogram_quantiles",
         "1024-bucket mergeable histogram + tiny cumulative window"),
        ("stream_hll_distinct",
         "per-batch register spool + MAX-merge compaction"),
        ("dq_anomaly_days",
         "day-grain agg + one-row baseline broadcast"),
        ("corpus_line_dedup",
         "segment hash df + keep-first verdict join"),
        ("corpus_minhash_decontaminate",
         "banded train x broadcast bench, no self-join"),
        ("sketch_cms_heavy_hitters",
         "fixed 4x1024 counter shuffle + audit probe"),
        ("stream_cms_counters",
         "per-batch counter spool + SUM-merge compaction"),
        ("sketch_hll_union",
         "two slice sketches + <=128-row MAX merge"),
        ("layout_compaction_plan",
         "partition-keyed next-fit window, one shuffle"),
        ("embed_hard_negatives",
         "other-label cosine top-k parity gate"),
        ("dq_referential_suite",
         "per-edge anti-join counts, broadcast dims"),
        ("corpus_bpe_merges",
         "one corpus scan + driver-looped vocab iterations"),
        ("stream_events_recent_score",
         "stateful drain + final per-user argmax window"),
        ("corpus_dsir_select",
         "one bigram explode, materialized doc-bucket counts,"
         " broadcast 128-row weight map, salted top-k"),
        ("dq_k_anonymity",
         "one GROUPING SETS pass + zero-column broadcast total"),
        ("corpus_bpe_encode",
         "trained merges + vocabulary-bounded broadcast encode map"),
        ("embed_spectrum_stats",
         "exact integer Gram materialized once, 64-row stats"),
        ("layout_partition_skew",
         "per-edge key-count aggs, no global key window"),
        ("multimodal_audio_fingerprint",
         "Arrow window rows -> asset-keyed lag/agg -> fp-keyed census"),
        ("tpch_local_supplier_volume",
         "snowflake join: facts shuffle, dims broadcast"),
        ("stream_dsir_select",
         "doc-local featurize spool + one compaction resolve"),
        ("corpus_winnow_pairs",
         "gram argmin windows, materialized sel, df-capped pair join"),
        ("embed_knn_eval",
         "cosine top-k + majority vote, cosine_topk shape"),
        ("orders_basket_pairs",
         "per-order pairing, materialized (o,p), bounded quadratic"),
        ("events_transition_matrix",
         "one user-keyed lead window + pair agg"),
        ("corpus_bpe_apply",
         "frozen merges folded into one projection, broadcast encode map"),
        ("corpus_normalize_text",
         "zero-shuffle codegen normalization projection"),
        ("ann_filtered_topk",
         "label pushed to candidate scan + broadcast-queries BLAS topk"),
        ("stream_kmv_distinct",
         "per-batch min-k spool + one distinct-union TakeOrdered"),
        ("corpus_collocations",
         "vocabulary-bounded pair/marginal aggs + broadcast total, "
         "exact-integer PMI lift"),
        ("events_user_state_history",
         "ONE user-keyed exchange feeding all three SCD-2 windows"),
        ("findings_merge_upsert",
         "shared checkpointed basis, one extraction, dual-snapshot "
         "conditional aggs, store-scale full join"),
        ("writeback_diff_plan",
         "one extraction, two per-column aggs, store-scale left join"),
        ("corpus_ngram_novelty",
         "one gram shuffle; eval-suite bench grams broadcast into the "
         "seen-join — the train side never reshuffles for the join"),
        ("embed_semantic_decon",
         "bench queries broadcast through the one-pass BLAS body; "
         "train side streams, shuffle carries per-partition top-1 only"),
        ("orders_rfm_segments",
         "two-level exact rank (bucket histogram + within-bucket "
         "row_number) x3 metrics — no single-task global ntile window"),
        ("corpus_tokenizer_fertility",
         "lang_id + bpe_apply CTEs joined doc-keyed, language rollup"),
        ("unity_rest_columns",
         "driver-side paginated REST walk -> createDataFrame "
         "(catalog metadata scale; no data-plane jobs)"),
    ]
    lines = ["# PLANS — physical plan audit (auto-generated)", "",
             f"sf_dir: {sf_dir}", ""]
    for name, why in audit:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_exchange = plan.count("Exchange")
        n_reused = plan.count("ReusedExchange")
        n_bhj = plan.count("BroadcastHashJoin")
        n_smj = plan.count("SortMergeJoin")
        pushed = sorted(set(re.findall(r"PushedFilters: \[[^\]]*\]",
                                       plan)))[:3]
        schemas = sorted(set(re.findall(r"ReadSchema: [^\n]*", plan)))[:4]
        lines += [f"## {name} — {why}", "",
                  f"- exchanges: {n_exchange} (reused {n_reused}), "
                  f"broadcast joins: {n_bhj}, sort-merge joins: {n_smj}"]
        for p in pushed:
            lines.append(f"- {p}")
        for s in schemas:
            lines.append(f"- {s[:160]}")
        lines.append("")
    out = "\n".join(lines)
    with open("PLANS.md", "w") as f:
        f.write(out)
    print(out)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
