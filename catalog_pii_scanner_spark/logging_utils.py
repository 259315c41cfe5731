"""Structured JSON logging with PII scrubbing (reference K6,
src/catalog_pii_scanner/logging_utils.py:59-210).

Reference behaviors kept: JSON-formatted records, a correlation-id
contextvar stamped on every record, and ``safe_log`` — recursive scrubbing
of every logged string through the shape-preserving mask before emission,
so raw PII can never reach a log sink. On executors the same scrubber is
used inside UDF error paths; driver-side it wraps the standard logging
module (log4j handles the JVM side).
"""

from __future__ import annotations

import json
import logging
import re
import time
import uuid
from contextvars import ContextVar
from typing import Any

from .operators.rules import RULES, bounded_pattern

correlation_id: ContextVar[str] = ContextVar("correlation_id", default="")

_PATTERNS = [re.compile(bounded_pattern(r)) for r in RULES]


def mask_token(token: str) -> str:
    """Shape-preserving mask (R1): digit->0, lower->x, upper->X."""
    out = []
    for ch in token:
        if ch.isdigit():
            out.append("0")
        elif ch.islower():
            out.append("x")
        elif ch.isupper():
            out.append("X")
        else:
            out.append(ch)
    return "".join(out)


def scrub_text(text: str) -> str:
    """Mask every rule-pattern match in a string."""
    for pat in _PATTERNS:
        text = pat.sub(lambda m: mask_token(m.group(0)), text)
    return text


def dedupe_spans(texts: list[str | None] | None) -> list[str]:
    """P9: unique-by-text span list, first occurrence wins (reference
    logging_utils.py:149-158) — applied before span lists reach a log
    record. Data-plane twin for spans riding as array columns:
    ``F.array_distinct`` (order of first occurrence, same semantics)."""
    if not texts:
        return []
    seen: set[str] = set()
    out: list[str] = []
    for t in texts:
        if t and t not in seen:
            out.append(t)
            seen.add(t)
    return out


def scrub(value: Any) -> Any:
    """Recursive scrub of any JSON-able structure."""
    if isinstance(value, str):
        return scrub_text(value)
    if isinstance(value, dict):
        return {k: scrub(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [scrub(v) for v in value]
    return value


class JsonFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        payload = {
            "ts": round(time.time(), 3),
            "level": record.levelname,
            "logger": record.name,
            "message": record.getMessage(),
            "correlation_id": correlation_id.get() or None,
        }
        extra = getattr(record, "extra_fields", None)
        if extra:
            payload.update(extra)
        return json.dumps(payload, default=str)


def new_correlation_id() -> str:
    cid = uuid.uuid4().hex[:16]
    correlation_id.set(cid)
    return cid


def get_logger(name: str = "cpss") -> logging.Logger:
    logger = logging.getLogger(name)
    if not any(isinstance(h.formatter, JsonFormatter)
               for h in logger.handlers):
        h = logging.StreamHandler()
        h.setFormatter(JsonFormatter())
        logger.addHandler(h)
        logger.propagate = False
    return logger


def safe_log(logger: logging.Logger, level: int, message: str,
             **fields: Any) -> None:
    """Scrub-then-log: no raw PII reaches the record."""
    logger.log(level, scrub_text(message),
               extra={"extra_fields": scrub(fields)})
