"""Warn-only infrastructure preflight (S3/MinIO, Nessie, ports).

The reference probes object-store and catalog reachability before running
jobs (reference: src/dativo_ingest/infrastructure.py:13-240, wired in the
cli.py startup sequence): a MinIO health endpoint / bare-endpoint GET for
S3, the ``/api/v1/config`` endpoint for Nessie, and TCP connects for
required ports. Here the probes are non-fatal by design — like the catalog
push, a dead endpoint should surface loudly in logs but never change a
job's exit code (the write itself will fail with the real error if the
endpoint truly matters).

Transport is injectable (``http_get`` / ``tcp_connect``) so tests exercise
failure handling without sockets; the defaults use stdlib ``urllib`` /
``socket`` only.
"""

from __future__ import annotations

import logging
import os
import socket
from typing import Any, Callable
from urllib.parse import urlparse

log = logging.getLogger(__name__)

#: seconds — probes must never stall a job start
DEFAULT_TIMEOUT = 5.0


def _default_http_get(url: str, timeout: float) -> int:
    """GET returning the HTTP status code (4xx/5xx included — any response
    proves the server is reachable)."""
    import urllib.error
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            return int(resp.status)
    except urllib.error.HTTPError as exc:  # server responded
        return int(exc.code)


def _default_tcp_connect(host: str, port: int, timeout: float) -> bool:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as sock:
        sock.settimeout(timeout)
        return sock.connect_ex((host, port)) == 0


def validate_required_ports(
    ports: list[int], host: str = "localhost",
    tcp_connect: Callable[[str, int, float], bool] | None = None,
    timeout: float = 2.0,
) -> None:
    """TCP-connect probe; raises ValueError listing unreachable ports
    (reference infrastructure.py:13-42)."""
    connect = tcp_connect or _default_tcp_connect
    failed = []
    for port in ports:
        try:
            ok = connect(host, int(port), timeout)
        except Exception:
            ok = False
        if not ok:
            failed.append(int(port))
    if failed:
        raise ValueError(f"ports not accessible on {host}: {failed}")


def check_s3_connectivity(
    endpoint: str,
    http_get: Callable[[str, float], int] | None = None,
    timeout: float = DEFAULT_TIMEOUT,
) -> bool:
    """S3/MinIO reachability: MinIO live-health first, then the bare
    endpoint — any HTTP response (403 included) proves reachability
    (reference infrastructure.py:86-129)."""
    get = http_get or _default_http_get
    parsed = urlparse(endpoint)
    try:
        if get(f"{parsed.scheme}://{parsed.netloc}/minio/health/live",
               timeout) == 200:
            return True
    except Exception:
        pass
    try:
        get(endpoint, timeout)
        return True
    except Exception as exc:
        raise ValueError(f"cannot reach S3 at {endpoint}: {exc}") from exc


def check_nessie_connectivity(
    uri: str,
    http_get: Callable[[str, float], int] | None = None,
    timeout: float = DEFAULT_TIMEOUT,
) -> bool:
    """Nessie catalog reachability via ``/api/v1/config`` (404/405 still
    count as reachable — reference infrastructure.py:44-84)."""
    get = http_get or _default_http_get
    parsed = urlparse(uri)
    base = f"{parsed.scheme}://{parsed.netloc}"
    try:
        if get(f"{base}/api/v1/config", timeout) in (200, 404):
            return True
        if get(f"{base}/api/v1", timeout) in (200, 404, 405):
            return True
        raise ValueError(f"unexpected status from Nessie at {uri}")
    except ValueError:
        raise
    except Exception as exc:
        raise ValueError(f"cannot reach Nessie at {uri}: {exc}") from exc


def validate_infrastructure(
    job: Any,
    http_get: Callable[[str, float], int] | None = None,
    tcp_connect: Callable[[str, int, float], bool] | None = None,
    environ: dict[str, str] | None = None,
) -> dict[str, list[str]]:
    """Preflight a job's target endpoints; returns ``{"errors": [...],
    "warnings": [...]}`` and logs each — never raises (the runner treats
    the whole probe as warn-only; reference validate_infrastructure raises,
    cli.py catches and logs — same net effect, reference
    infrastructure.py:132-240 / cli.py:236-244).

    Probed: ``s3``/``iceberg``/``table`` targets with an ``S3_ENDPOINT``
    (or ``target.options.s3_endpoint``); Nessie when ``NESSIE_URI`` (or
    ``target.options.nessie_uri``) is set."""
    env = environ if environ is not None else os.environ
    errors: list[str] = []
    warnings: list[str] = []
    target_type = getattr(job.target, "type", "parquet")
    opts = getattr(job.target, "options", {}) or {}

    if target_type in ("s3", "iceberg", "table"):
        s3_endpoint = opts.get("s3_endpoint") or env.get("S3_ENDPOINT")
        if s3_endpoint:
            try:
                check_s3_connectivity(s3_endpoint, http_get=http_get)
            except ValueError as exc:
                errors.append(str(exc))
            parsed = urlparse(s3_endpoint)
            if parsed.port:
                try:
                    validate_required_ports(
                        [parsed.port], parsed.hostname or "localhost",
                        tcp_connect=tcp_connect)
                except ValueError as exc:
                    warnings.append(str(exc))
        elif target_type in ("s3", "iceberg"):
            warnings.append(
                f"{target_type} target without S3_ENDPOINT — skipping "
                "object-store preflight")

    nessie_uri = opts.get("nessie_uri") or env.get("NESSIE_URI")
    if nessie_uri and target_type in ("iceberg", "table"):
        try:
            check_nessie_connectivity(nessie_uri, http_get=http_get)
        except ValueError as exc:
            errors.append(str(exc))

    for msg in warnings:
        log.warning("infrastructure preflight: %s", msg)
    for msg in errors:
        log.warning("infrastructure preflight FAILED (non-fatal): %s", msg)
    return {"errors": errors, "warnings": warnings}
