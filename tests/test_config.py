"""Config validation (reference tests/test_config.py): valid/invalid
layered configs, env overrides with __ nesting, strict unknown-key
rejection, ranged thresholds."""

from __future__ import annotations

import json

import pytest

from catalog_pii_scanner_spark.config import (AppConfig, ConfigError,
                                              load_config)


def test_defaults():
    cfg = load_config(environ={})
    assert cfg.ai.mode == "rules"
    assert cfg.ai.ner.confidence_min == 0.60
    assert cfg.ai.ensemble.decision_threshold == 0.55


def test_file_plus_env_override(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(
        {"ai": {"mode": "ensemble", "ner": {"confidence_min": 0.7}}}))
    cfg = load_config(str(p), environ={
        "CPS_AI__NER__ENABLED": "false",
        "CPS_AI__ENSEMBLE__DECISION_THRESHOLD": "0.8",
        "CPS_SAMPLE_N": "50",
        "UNRELATED": "x",
    })
    assert cfg.ai.mode == "ensemble"
    assert cfg.ai.ner.confidence_min == 0.7   # from file
    assert cfg.ai.ner.enabled is False        # env override
    assert cfg.ai.ensemble.decision_threshold == 0.8
    assert cfg.sample_n == 50


@pytest.mark.parametrize("environ", [
    {"CPS_AI__MODE": '"nonsense"'},
    {"CPS_AI__NER__CONFIDENCE_MIN": "1.5"},
    {"CPS_AI__NER__PROVIDER": '"gpt"'},
    {"CPS_SAMPLE_N": "0"},
])
def test_invalid_values_rejected(environ):
    with pytest.raises(ConfigError):
        load_config(environ=environ)


def test_unknown_keys_rejected(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"ai": {"bogus_key": 1}}))
    with pytest.raises(ConfigError, match="bogus_key"):
        load_config(str(p), environ={})
