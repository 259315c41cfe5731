"""The flagship scan composition (reference ``Ensemble.predict``,
src/catalog_pii_scanner/ensemble.py:69-136 — the engine behind
``cps scan_text``, cli.py:249-272):

    candidates -> redacted +/-48-char contexts (R4)
               -> N5 context-signal histogram (per distinct context)
               -> E2 embedding probabilities (per distinct context)
               -> 11-type fusion with both signal maps bound
               -> calibrate -> normalize -> argmax [-> P6 gate]

Scale shape: signals compute once per DISTINCT context (keyed by
md5(context)) and join back — the model stages are bounded by
unique-context count, not candidate count. The candidate relation is
localCheckpointed so the extraction lineage isn't re-derived by the two
signal branches plus the fusion join (blocks free on driver GC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .embeddings import EmbedModel, deterministic_model, embed_probs
from .ensemble import EnsembleWeights, REFERENCE_WEIGHTS, fuse_predictions
from .ner import ner_context_signals
from .redaction import candidate_contexts

#: fusion input key columns.
CAND_COLS = ("column_ref", "value", "pii_type", "match_text")


def full_scan_predictions(
    cands: DataFrame,
    model: EmbedModel | None = None,
    weights: EnsembleWeights = REFERENCE_WEIGHTS,
    decision_threshold: float | None = None,
    ner_provider: str = "regex",
    calibration: dict[str, tuple[float, float]] | None = None,
    llm_cost_cap_usd: float | None = None,
    llm_cache_ttl_minutes: int | None = None,
    precomputed_enriched: DataFrame | None = None,
) -> DataFrame:
    """Scored candidates (CAND_COLS + rule_confidence + validated) ->
    fused predictions with the REAL signal path bound. ``model`` defaults
    to the deterministic md5hex model (hermetic offline mode — the
    reference's CPS_OFFLINE analog); pass a trained EmbedModel for the
    live path.

    ``precomputed_enriched`` lets a caller that already evaluated the
    signal plumbing (``enriched_candidates`` over the SAME cands/model/
    provider — identical by construction) hand it over, so compositions
    that fit AND predict (the trained eval) analyze the context/NER/
    embed tree once instead of twice; semantics are unchanged.

    With ``ner_provider='fake_llm'`` the declared LLM runtime knobs are
    ENFORCED, not just validated: ``llm_cost_cap_usd`` budget-gates the
    distinct-context relation through ``llm.llm_budget_plan`` before any
    model invocation (out-of-budget contexts simply contribute no NER
    signal — the fusion's missing-signal path), and
    ``llm_cache_ttl_minutes`` reaches the worker-singleton provider
    construction."""
    if precomputed_enriched is not None and (
            ner_provider != "regex" or llm_cost_cap_usd is not None
            or llm_cache_ttl_minutes is not None):
        # the enrichment branch is the ONLY consumer of these knobs —
        # a precomputed relation was built under its caller's knobs, so
        # accepting both would silently drop the budget gate / TTL /
        # provider the caller asked for here.
        raise ValueError(
            "precomputed_enriched already fixes the signal path; pass "
            "ner_provider/llm_cost_cap_usd/llm_cache_ttl_minutes to the "
            "enrichment that builds it, not alongside it")
    enriched = (precomputed_enriched if precomputed_enriched is not None
                else _enriched_candidates(cands, model, ner_provider,
                                          llm_cost_cap_usd,
                                          llm_cache_ttl_minutes))
    return fuse_predictions(
        enriched,
        weights=weights,
        calibration=calibration,
        ner_signal=F.col("ner_sig"),
        embed_signal=F.col("embed_probs"),
        decision_threshold=decision_threshold,
    ).select(*CAND_COLS, "label", "score")


def _enriched_candidates(
    cands: DataFrame,
    model: EmbedModel | None,
    ner_provider: str,
    llm_cost_cap_usd: float | None = None,
    llm_cache_ttl_minutes: int | None = None,
) -> DataFrame:
    """Shared signal plumbing: distinct candidates + context -> N5 signal
    map + E2 probability map joined back by context hash."""
    model = model or deterministic_model()
    cands = (
        candidate_contexts(cands)
        .select(*CAND_COLS, "rule_confidence", "validated", "context")
        .distinct()
        .withColumn("ckey", F.md5("context"))
        .localCheckpoint(eager=True)
    )
    ctxs = cands.select("ckey", "context").distinct()
    ner_ctxs, provider_opts = ctxs, None
    if ner_provider == "fake_llm":
        from .llm import llm_budget_plan
        if llm_cost_cap_usd is not None:
            # cap/price bounds the in-budget set regardless of corpus
            # size, so the semi-join side is broadcast-safe by
            # construction (same argument as llm.detect_llm_spans).
            plan = llm_budget_plan(ctxs, id_col="ckey",
                                   text_col="context",
                                   cost_cap_usd=llm_cost_cap_usd)
            allowed = plan.where("in_budget") \
                .select(F.col("ckey").alias("_ok_ckey"))
            ner_ctxs = ctxs.join(
                F.broadcast(allowed),
                F.col("ckey") == F.col("_ok_ckey"), "left_semi")
        if llm_cache_ttl_minutes is not None:
            provider_opts = {"cache_ttl_minutes": llm_cache_ttl_minutes}
    ner_map = (
        ner_context_signals(ner_ctxs, keep_cols=("ckey",),
                            provider=ner_provider,
                            provider_opts=provider_opts)
        .groupBy("ckey")
        .agg(F.map_from_entries(
            F.collect_list(F.struct("pii_type", "signal")))
            .alias("ner_sig"))
    )
    emb_map = embed_probs(ctxs, model).select("ckey", "embed_probs")
    return cands.join(ner_map, "ckey", "left") \
                .join(emb_map, "ckey", "left")


def full_scan_raw_scores(
    cands: DataFrame,
    model: EmbedModel | None = None,
    weights: EnsembleWeights = REFERENCE_WEIGHTS,
    ner_provider: str = "regex",
    precomputed_enriched: DataFrame | None = None,
) -> DataFrame:
    """Pre-calibration per-type raw fused scores with the REAL signal
    path bound (reference ``Ensemble.raw_scores``, ensemble.py:138-167) —
    the input to the calibrator fit. Output: CAND_COLS + rule_confidence
    + validated + score_type + raw (11 rows per candidate).
    ``precomputed_enriched`` as in :func:`full_scan_predictions`."""
    from .ensemble import raw_type_scores
    if precomputed_enriched is not None and ner_provider != "regex":
        raise ValueError(
            "precomputed_enriched already fixes the signal path; pass "
            "ner_provider to the enrichment that builds it, not "
            "alongside it")
    enriched = (precomputed_enriched if precomputed_enriched is not None
                else _enriched_candidates(cands, model, ner_provider))
    return raw_type_scores(
        enriched, weights=weights,
        ner_signal=F.col("ner_sig"),
        embed_signal=F.col("embed_probs"),
    ).select(*CAND_COLS, "rule_confidence", "validated",
             "score_type", "raw")
