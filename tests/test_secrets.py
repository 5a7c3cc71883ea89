"""Secret managers: env/filesystem/vault/aws/gcp resolution, placeholder
substitution into jobs, connector validation, log redaction.

Reference semantics: src/dativo_ingest/secrets/ (registry __init__.py:41-55,
env naming managers/env.py:11-88, tenant dirs managers/filesystem.py,
Vault KV v1/v2 managers/vault.py, AWS/GCP definitions-or-bundle
managers/aws.py + gcp.py, validation validation.py:9-70), wired before any
job runs at cli.py:201-217. Cloud managers run against injected fake
clients — no live endpoints."""

from __future__ import annotations

import json
import logging

import pytest
import yaml

from dativo_ingest_spark import runner, secrets
from dativo_ingest_spark.config.contracts import ConfigError

# --- parsers ---------------------------------------------------------------


def test_parse_env_blob():
    blob = '# comment\nHOST=db.internal\nPORT="5432"\n\nbad line\nPW=\'x\'\n'
    assert secrets.parse_env_blob(blob) == {
        "HOST": "db.internal", "PORT": "5432", "PW": "x"}


def test_parse_payload_auto_json_env_text(monkeypatch):
    monkeypatch.setenv("REGION", "eu-west-1")
    assert secrets.parse_payload('{"user": "u", "region": "$REGION"}') == {
        "user": "u", "region": "eu-west-1"}
    assert secrets.parse_payload("A=1\nB=2") == {"A": "1", "B": "2"}
    assert secrets.parse_payload("plain-token") == "plain-token"
    # explicit json hint on invalid json raises
    with pytest.raises(json.JSONDecodeError):
        secrets.parse_payload("not json", "json")
    # raw hint keeps an {-prefixed string a string
    assert secrets.parse_payload('{"a": 1}', "raw") == '{"a": 1}'


# --- env manager -----------------------------------------------------------


def test_env_manager_scoping_and_format_hints():
    env = {
        "DATIVO_SECRET__ACME__DB_PASSWORD": "hunter2",
        "DATIVO_SECRET__ACME__CREDS__JSON": '{"user": "u"}',
        "DATIVO_SECRET__GLOBAL__API_KEY": "g-key",
        "DATIVO_SECRET__OTHER__LEAK": "nope",
        "DATIVO_SECRET__MALFORMED": "nope",
        "UNRELATED": "nope",
    }
    got = secrets.EnvSecretManager(environ=env).load("acme")
    assert got == {"db_password": "hunter2", "creds": {"user": "u"},
                   "api_key": "g-key"}


def test_env_manager_global_scope_can_be_disabled():
    env = {"DATIVO_SECRET__GLOBAL__K": "v"}
    got = secrets.EnvSecretManager(environ=env,
                                   allow_global_scope=False).load("acme")
    assert got == {}


# --- filesystem manager ----------------------------------------------------


def test_filesystem_manager_loads_tenant_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("PGHOST", "pg.internal")
    tdir = tmp_path / "acme"
    tdir.mkdir()
    (tdir / "gsheets.json").write_text('{"client_email": "a@b", '
                                       '"host": "$PGHOST"}')
    (tdir / "postgres.env").write_text("PGUSER=app\nPGPASSWORD=s3cret\n")
    (tdir / "api_key.txt").write_text("tok-123\n")
    (tdir / ".hidden").write_text("skip")
    got = secrets.FilesystemSecretManager(str(tmp_path)).load("acme")
    assert got["gsheets"] == {"client_email": "a@b", "host": "pg.internal"}
    assert got["postgres"] == {"PGUSER": "app", "PGPASSWORD": "s3cret"}
    assert got["api_key"] == "tok-123"
    assert ".hidden" not in got and "hidden" not in got


def test_filesystem_manager_missing_tenant_raises(tmp_path):
    with pytest.raises(ConfigError, match="not found"):
        secrets.FilesystemSecretManager(str(tmp_path)).load("ghost")


# --- vault manager (fake client) ------------------------------------------


class _FakeVaultKV2:
    def __init__(self, store):
        self.store = store

    def read_secret_version(self, path, mount_point):
        return {"data": {"data": self.store.get((mount_point, path), {})}}


class _FakeVaultKV1:
    def __init__(self, store):
        self.store = store

    def read_secret(self, path, mount_point):
        return {"data": self.store.get((mount_point, path), {})}


class _FakeVaultClient:
    def __init__(self, store):
        class _KV:
            pass
        self.secrets = type("S", (), {})()
        self.secrets.kv = _KV()
        self.secrets.kv.v1 = _FakeVaultKV1(store)
        self.secrets.kv.v2 = _FakeVaultKV2(store)


def test_vault_manager_kv2_default_and_kv1_paths():
    store = {
        ("secret", "acme"): {"db_password": "v2-pass"},
        ("legacy", "teams/acme"): {"token": "v1-tok"},
    }
    mgr = secrets.VaultSecretManager(
        address="http://vault.local",
        paths=["{tenant}",
               {"path": "teams/{tenant}", "mount_point": "legacy",
                "kv_version": 1}],
        client_factory=lambda: _FakeVaultClient(store),
    )
    assert mgr.load("acme") == {"db_password": "v2-pass", "token": "v1-tok"}


def test_vault_manager_requires_address(monkeypatch):
    monkeypatch.delenv("VAULT_ADDR", raising=False)
    with pytest.raises(ConfigError, match="VAULT_ADDR"):
        secrets.VaultSecretManager()


# --- aws manager (fake client) --------------------------------------------


class _FakeAwsClient:
    def __init__(self, store):
        self.store = store
        self.calls = []

    def get_secret_value(self, **params):
        self.calls.append(params)
        return self.store[params["SecretId"]]


def test_aws_manager_definitions_and_versions():
    client = _FakeAwsClient({
        "acme/db": {"SecretString": '{"user": "u", "password": "p"}'},
        "shared/api": {"SecretBinary": b"bin-tok"},
    })
    mgr = secrets.AwsSecretManager(
        secrets=["db", {"name": "api", "id": "shared/api",
                        "version": "v7", "format": "raw"}],
        client=client)
    got = mgr.load("acme")
    assert got == {"db": {"user": "u", "password": "p"}, "api": "bin-tok"}
    assert {"SecretId": "shared/api", "VersionId": "v7"} in client.calls


def test_aws_manager_bundle():
    client = _FakeAwsClient(
        {"tenants/acme": {"SecretString": '{"k1": "v1", "k2": "v2"}'}})
    mgr = secrets.AwsSecretManager(
        bundle_secret_id_template="tenants/{tenant}", client=client)
    assert mgr.load("acme") == {"k1": "v1", "k2": "v2"}
    with pytest.raises(ConfigError, match="dict"):
        secrets.AwsSecretManager(
            bundle_secret_id_template="tenants/{tenant}",
            client=_FakeAwsClient(
                {"tenants/acme": {"SecretString": '"just a string"'}}),
        ).load("acme")


def test_aws_manager_requires_config():
    with pytest.raises(ConfigError, match="definitions"):
        secrets.AwsSecretManager(client=_FakeAwsClient({})).load("acme")


# --- gcp manager (fake client) --------------------------------------------


class _FakeGcpClient:
    def __init__(self, store):
        self.store = store

    def access_secret_version(self, name):
        payload = type("P", (), {"data": self.store[name]})()
        return type("R", (), {"payload": payload})()


def test_gcp_manager_definitions_and_resource_names():
    client = _FakeGcpClient({
        "projects/proj1/secrets/acme-db/versions/latest":
            b"USER=u\nPASSWORD=p",
        "projects/other/secrets/x/versions/3": b"tok",
    })
    mgr = secrets.GcpSecretManager(
        project_id="proj1",
        secrets=["db", {"name": "x", "id": "projects/other/secrets/x",
                        "version": "3", "format": "raw"}],
        client=client)
    got = mgr.load("acme")
    assert got == {"db": {"USER": "u", "PASSWORD": "p"}, "x": "tok"}


def test_gcp_manager_requires_project(monkeypatch):
    monkeypatch.delenv("GOOGLE_CLOUD_PROJECT", raising=False)
    with pytest.raises(ConfigError, match="project_id"):
        secrets.GcpSecretManager()


# --- registry --------------------------------------------------------------


def test_registry_dispatch_and_aliases(tmp_path):
    (tmp_path / "t1").mkdir()
    (tmp_path / "t1" / "k.txt").write_text("v")
    for alias in ("filesystem", "fs", "file"):
        got = secrets.load_secrets("t1", secrets_dir=str(tmp_path),
                                   manager_type=alias)
        assert got == {"k": "v"}
    with pytest.raises(ConfigError, match="unsupported"):
        secrets.create_manager("consul")
    # default manager is env
    assert isinstance(secrets.create_manager(None),
                      secrets.EnvSecretManager)


# --- placeholder resolution ------------------------------------------------


def test_resolve_placeholders_types_and_dotted_paths():
    loaded = {"db": {"user": "app", "password": "p@ss"},
              "api_key": "tok", "creds": {"a": 1}}
    doc = {
        "url": "jdbc:postgresql://h/db?user=${secret:db.user}",
        "password": "${secret:db.password}",
        "nested": {"key": "${secret:api_key}"},
        "whole": "${secret:creds}",
        "list": ["${secret:api_key}"],
        "untouched": "plain",
    }
    out = secrets.resolve_placeholders(doc, loaded)
    assert out["url"] == "jdbc:postgresql://h/db?user=app"
    assert out["password"] == "p@ss"
    assert out["nested"]["key"] == "tok"
    assert out["whole"] == {"a": 1}  # exact placeholder keeps native type
    assert out["list"] == ["tok"]
    assert out["untouched"] == "plain"


def test_resolve_placeholders_unknown_raises():
    with pytest.raises(ConfigError, match="unknown secret"):
        secrets.resolve_placeholders({"x": "${secret:nope}"}, {})
    with pytest.raises(ConfigError, match="unknown secret"):
        secrets.resolve_placeholders({"x": "${secret:db.missing}"},
                                     {"db": {"user": "u"}})


# --- connector validation --------------------------------------------------


def test_validate_for_connector():
    assert secrets.validate_for_connector({}, "csv", {"type": "none"})
    assert secrets.validate_for_connector(
        {"stripe_api_key": "sk"}, "stripe", {"type": "api_key"})
    with pytest.raises(ConfigError, match="stripe_api_key"):
        secrets.validate_for_connector({}, "stripe", {"type": "api_key"})
    # file_template-derived requirement (validation.py:31-38)
    assert secrets.validate_for_connector(
        {"gsheets": {"email": "e"}}, "google_sheets",
        {"type": "service_account",
         "file_template": "/secrets/{tenant}/gsheets.json"})
    with pytest.raises(ConfigError, match="gsheets"):
        secrets.validate_for_connector(
            {}, "google_sheets",
            {"type": "service_account",
             "file_template": "/secrets/{tenant}/gsheets.json"})
    # postgres requires a postgres-prefixed secret
    assert secrets.validate_for_connector(
        {"postgres": {"PGUSER": "u"}}, "postgres", {"type": "env"})
    with pytest.raises(ConfigError, match="postgres"):
        secrets.validate_for_connector({"other": 1}, "postgres",
                                       {"type": "env"})


# --- log redaction ---------------------------------------------------------


def test_redacting_filter_masks_values(caplog):
    logger = logging.getLogger("test_secrets_redact")
    filt = secrets.SecretRedactingFilter(
        {"db": {"password": "hunter2"}, "short": "ab", "tok": "tok-123"})
    logger.addFilter(filt)
    try:
        with caplog.at_level(logging.INFO, logger="test_secrets_redact"):
            logger.info("connecting with password=%s token=%s",
                        "hunter2", "tok-123")
        assert "hunter2" not in caplog.text
        assert "tok-123" not in caplog.text
        assert "***" in caplog.text
    finally:
        logger.removeFilter(filt)


def test_redactor_masks_propagated_child_logger_records(capsys):
    """The real wiring: redactor() with no logger argument must mask
    records created on MODULE loggers (dativo_ingest_spark.*) that only
    reach output by propagating to the handler obs.setup_logging installed
    on the package logger. Logger-level filters never run for propagated
    records — the filter has to live on the handler."""
    from dativo_ingest_spark import obs

    obs.setup_logging()
    pkg = logging.getLogger("dativo_ingest_spark")
    try:
        filt = secrets.redactor({"db": {"password": "hunter2-swordfish"}})
        child = logging.getLogger("dativo_ingest_spark.sources.jdbc")
        child.info("jdbc:postgresql://u:hunter2-swordfish@db/x")
        try:
            raise RuntimeError("auth failed for hunter2-swordfish")
        except RuntimeError:
            child.error("connect blew up", exc_info=True)
        err = capsys.readouterr().err
        assert "hunter2-swordfish" not in err
        assert "***" in err
        # the exception traceback is masked too, not just the message
        assert "auth failed for ***" in err
    finally:
        pkg.handlers.clear()
        logging.getLogger().removeFilter(filt)
        obs._SECRET_FILTERS.clear()


def test_redactor_survives_setup_logging_rerun(capsys):
    """setup_logging() replaces the package handler (idempotent re-config);
    a redactor registered before that must re-attach to the new handler."""
    from dativo_ingest_spark import obs

    obs.setup_logging()
    pkg = logging.getLogger("dativo_ingest_spark")
    try:
        filt = secrets.redactor({"token": "tok-9f8e7d6c"})
        obs.setup_logging(level="DEBUG")  # replaces the handler
        logging.getLogger("dativo_ingest_spark.runner").info(
            "using token tok-9f8e7d6c")
        err = capsys.readouterr().err
        assert "tok-9f8e7d6c" not in err
        assert "***" in err
    finally:
        pkg.handlers.clear()
        logging.getLogger().removeFilter(filt)
        obs._SECRET_FILTERS.clear()


# --- runner e2e: env-backed secrets resolve into a job ---------------------


def test_run_job_file_with_env_secrets(spark, tmp_path, monkeypatch):
    """A job whose target path rides a ${secret:...} placeholder runs
    end-to-end with the env manager — the reference's startup order
    (secrets resolve before config validation, cli.py:201-217)."""
    src = tmp_path / "people.csv"
    src.write_text("id,name\n1,alice\n2,bob\n")
    out = tmp_path / "out"
    monkeypatch.setenv("DATIVO_SECRET__ACME__OUT_DIR", str(out))
    job = {
        "tenant_id": "acme",
        "secrets": {"manager": "env"},
        "source": {"type": "csv", "path": str(src)},
        "target": {"type": "parquet", "path": "${secret:out_dir}",
                   "options": {"mode": "overwrite"}},
        "asset": {"name": "people", "version": "1", "domain": "hr",
                  "schema": [{"name": "id", "type": "integer",
                              "required": True},
                             {"name": "name", "type": "string"}]},
    }
    cfg = tmp_path / "job.yaml"
    cfg.write_text(yaml.dump(job))
    res = runner.run_job_file(spark, str(cfg))
    assert res.exit_code == runner.EXIT_SUCCESS
    assert spark.read.parquet(str(out)).count() == 2


def test_load_job_with_secrets_noop_without_placeholders(tmp_path):
    """No secrets block, no placeholders → no manager is consulted."""
    src = tmp_path / "x.csv"
    src.write_text("id\n1\n")
    job = {
        "tenant_id": "acme",
        "source": {"type": "csv", "path": str(src)},
        "target": {"type": "parquet", "path": str(tmp_path / "o")},
        "asset": {"name": "a", "version": "1", "domain": "d",
                  "schema": [{"name": "id", "type": "integer"}]},
    }
    cfg = tmp_path / "job.yaml"
    cfg.write_text(yaml.dump(job))
    loaded = runner.load_job_with_secrets(str(cfg))
    assert loaded.tenant_id == "acme"


def test_job_missing_secret_fails_at_config_time(tmp_path, monkeypatch):
    monkeypatch.delenv("DATIVO_SECRET__ACME__PW", raising=False)
    job = {
        "tenant_id": "acme",
        "secrets": {"manager": "env"},
        "source": {"type": "csv", "path": str(tmp_path / "x.csv")},
        "target": {"type": "parquet", "path": "${secret:pw}"},
        "asset": {"name": "a", "version": "1", "domain": "d",
                  "schema": [{"name": "id", "type": "integer"}]},
    }
    cfg = tmp_path / "job.yaml"
    cfg.write_text(yaml.dump(job))
    with pytest.raises(ConfigError, match="unknown secret"):
        runner.load_job_with_secrets(str(cfg))


def test_jdbc_job_with_secret_backed_url(spark, tmp_path, monkeypatch):
    """The realistic secrets flow: a JDBC job whose connection URL and
    credentials ride ${secret:...} placeholders resolved from the env
    manager before extraction (reference startup order cli.py:201-217 —
    secrets precede connector construction). Derby embedded accepts any
    user/password, which proves the reader-option plumbing end-to-end."""
    url = f"jdbc:derby:{tmp_path}/sdb;create=true"
    from pyspark.sql import functions as F

    spark.range(0, 10).select(
        F.col("id").alias("ID"), (F.col("id") * 2).alias("V")
    ).write.format("jdbc").option("url", url).option("dbtable", "T").save()

    monkeypatch.setenv("DATIVO_SECRET__ACME__DERBY__JSON",
                       '{"url": "%s", "user": "app", "password": "pw"}' % url)
    out = str(tmp_path / "out")
    job = {
        "tenant_id": "acme",
        "secrets": {"manager": "env"},
        "source": {
            "type": "derby",
            "options": {"url": "${secret:derby.url}",
                        "user": "${secret:derby.user}",
                        "password": "${secret:derby.password}",
                        "table": "T"},
        },
        "target": {"type": "parquet", "path": out,
                   "options": {"mode": "overwrite"}},
        "asset": {"name": "t", "schema": [
            {"name": "ID", "type": "integer", "required": True},
            {"name": "V", "type": "integer", "required": True},
        ]},
    }
    cfg = tmp_path / "job.yaml"
    cfg.write_text(yaml.dump(job))
    res = runner.run_job_file(spark, str(cfg))
    assert res.exit_code == runner.EXIT_SUCCESS
    assert res.records_valid == 10
    assert spark.read.parquet(out).count() == 10
