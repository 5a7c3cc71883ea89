"""Observability: structured JSON logging with redaction, and job spans.

The reference emits one JSON object per log line with tenant/job/event
tagging and pattern-based secret redaction (reference:
src/dativo_ingest/logging.py:9-168) and wraps job phases in OpenTelemetry
spans with a no-op fallback when the SDK is absent (tracing.py:24-168).
Same surface here:

* :class:`StructuredJSONFormatter` — timestamp/level/message/module plus
  any ``extra`` fields; two redaction layers: key-pattern scrubbing
  (password/token/api_key/secret/credential values) and, when a secrets
  dict is registered via :func:`secrets.redactor`, exact-value masking;
* :func:`setup_logging` — configures the engine's root logger with the
  JSON formatter and optional tenant tagging on every record;
* :func:`span` — a context manager that times a phase and logs
  ``span_start``/``span_end`` events (duration, status, attributes);
  if ``opentelemetry`` is importable the span is ALSO exported through
  the real tracer, so a jar-present deployment gets genuine traces with
  zero code change.

Driver-side only; executor logs stay Spark-managed (log4j).
"""

from __future__ import annotations

import json
import logging
import re
import time
from contextlib import contextmanager
from typing import Any

_SECRET_KEY_RE = re.compile(
    r'("?(?:password|token|api_key|secret|credential)[s]?"?\s*[:=]\s*)'
    r'("?)([^",\s}]+)(\2)',
    re.IGNORECASE,
)

# Secret-value masking filters registered via secrets.redactor(). They are
# attached to HANDLERS, not loggers: logging evaluates logger-level filters
# only on the logger a record was created on, so a filter on the root (or
# package) logger never sees records propagated up from module loggers
# (dativo_ingest_spark.sources.jdbc etc.) — which is where credential
# material actually gets logged. Handler filters DO run for propagated
# records. The registry lets a later setup_logging() re-attach every live
# filter to its replacement handler.
_SECRET_FILTERS: list[logging.Filter] = []


def register_secret_filter(filt: logging.Filter) -> None:
    """Attach a secret-masking filter to every handler that currently
    renders engine records (the package logger's handlers plus any root
    handlers), and remember it so :func:`setup_logging` re-attaches it when
    it replaces the handler."""
    if filt not in _SECRET_FILTERS:
        _SECRET_FILTERS.append(filt)
    for lg in (logging.getLogger("dativo_ingest_spark"),
               logging.getLogger()):
        for handler in lg.handlers:
            if filt not in handler.filters:
                handler.addFilter(filt)


def redact_text(text: str) -> str:
    """Scrub values of credential-shaped keys (reference
    logging.py:16-23 patterns, applied value-targeted so surrounding
    JSON stays parseable)."""
    return _SECRET_KEY_RE.sub(r"\1\2[REDACTED]\4", text)


class StructuredJSONFormatter(logging.Formatter):
    """One JSON object per line; ``extra={...}`` fields ride along."""

    _STANDARD = set(vars(logging.makeLogRecord({})).keys()) | {"message"}

    def __init__(self, redact_secrets: bool = True):
        super().__init__()
        self.redact_secrets = redact_secrets

    def format(self, record: logging.LogRecord) -> str:
        doc: dict[str, Any] = {
            "timestamp": self.formatTime(record),
            "level": record.levelname,
            "logger": record.name,
            "message": record.getMessage(),
            "module": record.module,
            "line": record.lineno,
        }
        for key, value in vars(record).items():
            if key not in self._STANDARD and not key.startswith("_"):
                try:
                    json.dumps(value)
                    doc[key] = value
                except (TypeError, ValueError):
                    doc[key] = str(value)
        if record.exc_info and record.exc_info[0] is not None:
            # prefer exc_text: a SecretRedactingFilter pre-renders the
            # traceback there with exact-value masking applied
            exc = record.exc_text or self.formatException(record.exc_info)
            doc["exception"] = exc[-2000:]
        if self.redact_secrets:
            # redact field-by-field BEFORE encoding: scrubbing the encoded
            # line would fight JSON escaping and can corrupt the document
            doc = {k: redact_text(v) if isinstance(v, str) else v
                   for k, v in doc.items()}
        return json.dumps(doc, default=str)


def setup_logging(
    level: str = "INFO",
    redact_secrets: bool = True,
    tenant_id: str | None = None,
    logger_name: str = "dativo_ingest_spark",
) -> logging.Logger:
    """Configure the engine logger for structured JSON output (reference
    logging.py:70-141). Idempotent: replaces prior handlers. When
    ``tenant_id`` is given every record carries it (multi-tenant log
    routing)."""
    logger = logging.getLogger(logger_name)
    logger.setLevel(getattr(logging, level.upper(), logging.INFO))
    logger.handlers.clear()
    handler = logging.StreamHandler()
    handler.setFormatter(StructuredJSONFormatter(redact_secrets))
    for filt in _SECRET_FILTERS:  # survive handler replacement
        handler.addFilter(filt)
    logger.addHandler(handler)
    # propagation stays ON: the root logger has no handlers in a normal
    # CLI process (no duplicate lines), and silencing it would hide these
    # records from test harnesses / embedding applications that collect
    # at the root
    if tenant_id:
        class _TenantFilter(logging.Filter):
            def filter(self, record: logging.LogRecord) -> bool:
                if not hasattr(record, "tenant_id"):
                    record.tenant_id = tenant_id
                return True
        logger.addFilter(_TenantFilter())
    return logger


def _otel_tracer():  # pragma: no cover - needs opentelemetry installed
    try:
        from opentelemetry import trace
    except ImportError:
        return None
    return trace.get_tracer("dativo-ingest-spark")


@contextmanager
def span(name: str, attributes: dict[str, Any] | None = None,
         logger: logging.Logger | None = None):
    """Timed phase span: logs span_start/span_end (+duration/status) and
    exports through OpenTelemetry when available (reference
    tracing.py:128-168 trace_job_execution/trace_phase with the no-op
    fallback). Yields a dict the body can add attributes to."""
    log = logger or logging.getLogger("dativo_ingest_spark")
    attrs = dict(attributes or {})
    log.info("span start: %s", name,
             extra={"event_type": "span_start", "span": name, **attrs})
    tracer = _otel_tracer()
    ctx = tracer.start_as_current_span(name) if tracer else None
    if ctx:
        ctx.__enter__()  # pragma: no cover
    t0 = time.perf_counter()
    status = "ok"
    try:
        yield attrs
    except BaseException:
        status = "error"
        raise
    finally:
        if ctx:  # pragma: no cover
            ctx.__exit__(None, None, None)
        log.info(
            "span end: %s (%s)", name, status,
            extra={"event_type": "span_end", "span": name,
                   "status": status,
                   "duration_s": round(time.perf_counter() - t0, 3),
                   **attrs})
