"""Infrastructure preflight (injected transports, warn-only semantics) and
the end-of-job metrics parity surface.

Reference: src/dativo_ingest/infrastructure.py:13-240 (probes),
metrics.py:189-238 (summary dict), cli.py:236-244 (catch-and-log)."""

from __future__ import annotations

import pytest

from dativo_ingest_spark import infrastructure, runner
from dativo_ingest_spark.config.contracts import JobConfig


def _http_ok(status=200):
    def get(url, timeout):
        return status
    return get


def _http_down(url, timeout):
    raise ConnectionError("connection refused")


def test_s3_check_health_endpoint_then_bare():
    assert infrastructure.check_s3_connectivity(
        "http://minio.local:9000", http_get=_http_ok(200))
    # health 403 then bare endpoint responds -> reachable
    calls = []

    def get(url, timeout):
        calls.append(url)
        if url.endswith("/minio/health/live"):
            raise ConnectionError("no health endpoint")
        return 403

    assert infrastructure.check_s3_connectivity(
        "http://s3.local", http_get=get)
    assert calls[-1] == "http://s3.local"
    with pytest.raises(ValueError, match="cannot reach S3"):
        infrastructure.check_s3_connectivity("http://down.local",
                                             http_get=_http_down)


def test_nessie_check_statuses():
    assert infrastructure.check_nessie_connectivity(
        "http://nessie.local:19120/api/v1", http_get=_http_ok(200))
    assert infrastructure.check_nessie_connectivity(
        "http://nessie.local:19120/api/v1", http_get=_http_ok(404))
    with pytest.raises(ValueError, match="cannot reach Nessie"):
        infrastructure.check_nessie_connectivity(
            "http://down.local/api/v1", http_get=_http_down)
    with pytest.raises(ValueError, match="unexpected status"):
        infrastructure.check_nessie_connectivity(
            "http://odd.local/api/v1", http_get=_http_ok(500))


def test_required_ports_with_injected_connect():
    infrastructure.validate_required_ports(
        [9000], tcp_connect=lambda h, p, t: True)
    with pytest.raises(ValueError, match=r"\[9000, 19120\]"):
        infrastructure.validate_required_ports(
            [9000, 19120], tcp_connect=lambda h, p, t: False)


def _job(target_type="s3", options=None):
    return JobConfig.from_dict({
        "tenant_id": "acme",
        "source": {"type": "csv", "path": "/tmp/x.csv"},
        "target": {"type": target_type, "path": "/tmp/out",
                   "options": options or {}},
        "asset": {"name": "a", "version": "1", "domain": "d",
                  "schema": [{"name": "id", "type": "integer"}]},
    })


def test_validate_infrastructure_collects_errors_never_raises():
    res = infrastructure.validate_infrastructure(
        _job("s3", {"s3_endpoint": "http://down.local:9000"}),
        http_get=_http_down, tcp_connect=lambda h, p, t: False,
        environ={})
    assert any("cannot reach S3" in e for e in res["errors"])
    assert any("ports not accessible" in w for w in res["warnings"])


def test_validate_infrastructure_env_endpoints_and_nessie():
    env = {"S3_ENDPOINT": "http://s3.local:9000",
           "NESSIE_URI": "http://nessie.local:19120/api/v1"}
    res = infrastructure.validate_infrastructure(
        _job("table"), http_get=_http_ok(200),
        tcp_connect=lambda h, p, t: True, environ=env)
    assert res == {"errors": [], "warnings": []}
    # dead nessie surfaces as an error string, still no raise
    res = infrastructure.validate_infrastructure(
        _job("table"), http_get=_http_down,
        tcp_connect=lambda h, p, t: True, environ=env)
    assert any("Nessie" in e for e in res["errors"])


def test_validate_infrastructure_plain_parquet_is_silent():
    res = infrastructure.validate_infrastructure(
        _job("parquet"), http_get=_http_down, environ={})
    assert res == {"errors": [], "warnings": []}


def test_s3_target_without_endpoint_warns():
    res = infrastructure.validate_infrastructure(
        _job("s3"), http_get=_http_ok(), environ={})
    assert any("S3_ENDPOINT" in w for w in res["warnings"])


# --- metrics parity (runner e2e) ------------------------------------------


def test_run_job_emits_metrics_parity_dict(spark, tmp_path, caplog):
    import logging

    src = tmp_path / "people.csv"
    src.write_text("id,name\n1,alice\n2,bob\n3,carol\n")
    out = str(tmp_path / "out")
    job = JobConfig.from_dict({
        "tenant_id": "acme",
        "source": {"type": "csv", "path": str(src)},
        "target": {"type": "parquet", "path": out,
                   "options": {"mode": "overwrite"}},
        "asset": {"name": "people", "version": "1", "domain": "hr",
                  "schema": [{"name": "id", "type": "integer",
                              "required": True},
                             {"name": "name", "type": "string"}]},
    })
    with caplog.at_level(logging.INFO, logger="dativo_ingest_spark.runner"):
        res = runner.run_job(spark, job)
    m = res.metrics()
    assert m["status"] == "success"
    assert m["records_extracted"] == 3
    assert m["records_valid"] == 3
    assert m["records_loaded"] == 3
    assert m["records_per_second"] > 0
    assert m["execution_time_seconds"] > 0
    assert m["output_path"] == out
    assert res.infrastructure == {"errors": [], "warnings": []}
    assert any("job metrics" in r.message and "records_per_second"
               in r.message for r in caplog.records)


def test_warn_mode_metrics_count_loaded_invalid_rows(spark, tmp_path):
    src = tmp_path / "p.csv"
    src.write_text("id,name\n1,alice\n,missing\n")
    job = JobConfig.from_dict({
        "tenant_id": "acme",
        "schema_validation_mode": "warn",
        "source": {"type": "csv", "path": str(src)},
        "target": {"type": "parquet", "path": str(tmp_path / "o"),
                   "options": {"mode": "overwrite"}},
        "asset": {"name": "p", "version": "1", "domain": "d",
                  "schema": [{"name": "id", "type": "integer",
                              "required": True},
                             {"name": "name", "type": "string"}]},
    })
    res = runner.run_job(spark, job)
    m = res.metrics()
    assert m["status"] == "partial"
    # warn mode writes every row, valid or not
    assert m["records_loaded"] == 2
    assert m["records_valid"] == 1
