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
) -> DataFrame:
    """Scored candidates (CAND_COLS + rule_confidence + validated) ->
    fused predictions with the REAL signal path bound. ``model`` defaults
    to the deterministic md5hex model (hermetic offline mode — the
    reference's CPS_OFFLINE analog); pass a trained EmbedModel for the
    live path."""
    model = model or deterministic_model()
    cands = (
        candidate_contexts(cands)
        .select(*CAND_COLS, "rule_confidence", "validated", "context")
        .distinct()
        .withColumn("ckey", F.md5("context"))
        .localCheckpoint(eager=True)
    )
    ctxs = cands.select("ckey", "context").distinct()
    ner_map = (
        ner_context_signals(ctxs, keep_cols=("ckey",),
                            provider=ner_provider)
        .groupBy("ckey")
        .agg(F.map_from_entries(
            F.collect_list(F.struct("pii_type", "signal")))
            .alias("ner_sig"))
    )
    emb_map = embed_probs(ctxs, model).select("ckey", "embed_probs")
    enriched = cands.join(ner_map, "ckey", "left") \
                    .join(emb_map, "ckey", "left")
    return fuse_predictions(
        enriched,
        weights=weights,
        calibration=calibration,
        ner_signal=F.col("ner_sig"),
        embed_signal=F.col("embed_probs"),
        decision_threshold=decision_threshold,
    ).select(*CAND_COLS, "label", "score")
