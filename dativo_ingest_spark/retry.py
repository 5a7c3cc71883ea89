"""Retry policy: exit-code + error-pattern classification, exponential
backoff.

Reference semantics (``/root/reference/src/dativo_ingest/retry_policy.py:
23-105``, config ``config.py:475-500``): exit codes 1|2 retryable by
default; optional regex patterns gate on the error message (no patterns ⇒
any message retries, invalid patterns are skipped); delay =
``initial * multiplier^attempt`` capped at ``max_delay_seconds``.

Driver-side only — Spark task-level retries stay with
``spark.task.maxFailures``; this wraps whole-job re-runs (idempotent thanks
to the runner's commit-then-state ordering).
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass, field as dc_field
from typing import Callable

from dativo_ingest_spark.runner import JobResult


@dataclass
class RetryConfig:
    max_retries: int = 3
    initial_delay_seconds: float = 1.0
    backoff_multiplier: float = 2.0
    max_delay_seconds: float = 60.0
    retryable_exit_codes: tuple[int, ...] = (1, 2)
    retryable_error_patterns: tuple[str, ...] = ()


@dataclass
class RetryPolicy:
    config: RetryConfig = dc_field(default_factory=RetryConfig)

    def should_retry(self, exit_code: int, error_message: str | None = None,
                     attempt: int = 0) -> bool:
        if attempt >= self.config.max_retries:
            return False
        if exit_code not in self.config.retryable_exit_codes:
            return False
        if error_message and self.config.retryable_error_patterns:
            return self._matches(error_message)
        return True

    def _matches(self, message: str) -> bool:
        for pattern in self.config.retryable_error_patterns:
            try:
                if re.search(pattern, message, re.IGNORECASE):
                    return True
            except re.error:
                continue  # invalid pattern: skip, like the reference
        return False

    def calculate_delay(self, attempt: int) -> float:
        delay = self.config.initial_delay_seconds * (
            self.config.backoff_multiplier ** attempt
        )
        return min(delay, self.config.max_delay_seconds)

    def run_with_retries(
        self,
        fn: Callable[[], JobResult],
        error_message_of: Callable[[JobResult], str | None] = (
            lambda r: "; ".join(str(e) for e in r.error_sample) or None
        ),
        sleep: Callable[[float], None] = time.sleep,
    ) -> tuple[JobResult, int]:
        """Run ``fn`` until success or retries exhausted; returns the last
        result and the number of attempts made."""
        attempt = 0
        while True:
            result = fn()
            if result.exit_code == 0:
                return result, attempt + 1
            if not self.should_retry(result.exit_code,
                                     error_message_of(result), attempt):
                return result, attempt + 1
            sleep(self.calculate_delay(attempt))
            attempt += 1
