"""Privacy invariant (reference tests/test_logging.py): no raw PII
substring appears anywhere in emitted logs; JSON structure + correlation
id are present."""

from __future__ import annotations

import json
import logging

from catalog_pii_scanner_spark.logging_utils import (get_logger,
                                                     new_correlation_id,
                                                     safe_log, scrub_text)

PII_SAMPLES = [
    "john.doe@example.com",
    "4111 1111 1111 1111",
    "078-05-1120",
    "10.0.0.1",
    "aa:bb:cc:dd:ee:ff",
    "2345 6789 0124",
]


def test_scrub_removes_all_pii():
    text = "msg " + " | ".join(PII_SAMPLES)
    scrubbed = scrub_text(text)
    for sample in PII_SAMPLES:
        assert sample not in scrubbed
    # shape preserved
    assert "xxxx.xxx@xxxxxxx.xxx" in scrubbed
    assert "0000 0000 0000 0000" in scrubbed


def test_safe_log_json_structure(capsys):
    logger = get_logger("cpss-test")
    logger.setLevel(logging.INFO)
    cid = new_correlation_id()
    safe_log(logger, logging.INFO,
             "scanned value john.doe@example.com",
             column="users.email", sample="078-05-1120")
    err = capsys.readouterr().err
    record = json.loads(err.strip().splitlines()[-1])
    assert record["correlation_id"] == cid
    assert record["level"] == "INFO"
    assert "john.doe@example.com" not in err
    assert "078-05-1120" not in err
    assert record["sample"] == "000-00-0000"
