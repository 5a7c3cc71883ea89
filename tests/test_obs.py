"""Structured JSON logging + spans (reference logging.py / tracing.py)."""

from __future__ import annotations

import json
import logging

import pytest

from dativo_ingest_spark import obs


def _fmt(record_args, redact=True, **extra):
    formatter = obs.StructuredJSONFormatter(redact_secrets=redact)
    record = logging.LogRecord("t", logging.INFO, __file__, 1,
                               record_args, (), None)
    for k, v in extra.items():
        setattr(record, k, v)
    return json.loads(formatter.format(record))


def test_formatter_emits_json_with_extras():
    doc = _fmt("hello", event_type="unit", tenant_id="acme")
    assert doc["message"] == "hello"
    assert doc["level"] == "INFO"
    assert doc["event_type"] == "unit"
    assert doc["tenant_id"] == "acme"
    assert "timestamp" in doc


def test_formatter_redacts_credential_keys():
    doc = _fmt('connecting with password=hunter2 and api_key="tok-99"')
    assert "hunter2" not in json.dumps(doc)
    assert "tok-99" not in json.dumps(doc)
    assert "[REDACTED]" in doc["message"]
    # non-credential values survive
    doc2 = _fmt("count=42 path=/data/x")
    assert "42" in doc2["message"] and "/data/x" in doc2["message"]


def test_redact_text_value_targeted():
    s = '{"password": "p@ss", "rows": 10, "token": "abc"}'
    red = obs.redact_text(s)
    assert "p@ss" not in red and "abc" not in red
    assert '"rows": 10' in red
    assert json.loads(red)  # stays valid JSON


def test_setup_logging_tenant_tagging(capsys):
    logger = obs.setup_logging(tenant_id="acme", logger_name="t_obs1")
    logger.info("job starting", extra={"event_type": "startup"})
    line = capsys.readouterr().err.strip().splitlines()[-1]
    doc = json.loads(line)
    assert doc["tenant_id"] == "acme"
    assert doc["event_type"] == "startup"
    # idempotent: re-setup doesn't double handlers
    logger = obs.setup_logging(tenant_id="acme", logger_name="t_obs1")
    assert len(logger.handlers) == 1


def test_span_logs_start_end_duration(caplog):
    logger = logging.getLogger("t_obs2")
    with caplog.at_level(logging.INFO, logger="t_obs2"):
        with obs.span("extract", {"source": "csv"}, logger=logger) as attrs:
            attrs["rows"] = 3
    events = [(r.event_type, getattr(r, "span", None)) for r in caplog.records]
    assert ("span_start", "extract") in events
    end = [r for r in caplog.records if r.event_type == "span_end"][0]
    assert end.status == "ok" and end.duration_s >= 0
    assert end.rows == 3 and end.source == "csv"


def test_span_marks_errors(caplog):
    logger = logging.getLogger("t_obs3")
    with caplog.at_level(logging.INFO, logger="t_obs3"):
        with pytest.raises(ValueError):
            with obs.span("boom", logger=logger):
                raise ValueError("x")
    end = [r for r in caplog.records if r.event_type == "span_end"][0]
    assert end.status == "error"
