"""Tenant-scoped secret resolution (env / filesystem / Vault / AWS / GCP).

The reference resolves credentials through a pluggable manager registry
before any job runs (reference: src/dativo_ingest/secrets/__init__.py:41-55,
wired at cli.py:201-217); jobs then never carry raw credentials in YAML.
This module provides the same surface for the Spark runner:

* ``load_secrets(tenant_id, ...)`` — registry-dispatched entry point;
* five managers with the reference's resolution semantics
  (env var naming, per-tenant filesystem layout, Vault KV v1/v2,
  AWS/GCP per-secret definitions or JSON bundles);
* ``resolve_placeholders`` — ``${secret:name}`` / ``${secret:name.key}``
  substitution into job/source options, so YAML references secrets by name
  and values ride only in the manager backend;
* ``validate_for_connector`` — startup-time required-secret checks
  (reference: secrets/validation.py:9-70);
* ``redactor`` — a logging filter that masks loaded secret values.

Cloud/vault managers take injectable clients (``client=`` /
``client_factory=``) so unit tests run without live endpoints; the real
SDK imports are lazy and gated.

Driver-side only: secrets never enter a Spark plan as literals here —
they flow into JDBC reader options / API clients, exactly like the
reference's connector configs.
"""

from __future__ import annotations

import json
import logging
import os
import re
from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import Any, Callable

from dativo_ingest_spark.config.contracts import ConfigError

# --- payload parsing -------------------------------------------------------

_FORMAT_HINTS = {"json", "env", "text", "raw"}


def parse_env_blob(blob: str) -> dict[str, str]:
    """KEY=VALUE lines (comments/blanks skipped, quotes stripped,
    ``$VAR`` expanded) — the ``.env`` secret file format."""
    out: dict[str, str] = {}
    for raw in blob.splitlines():
        line = raw.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        k, v = line.split("=", 1)
        out[k.strip()] = os.path.expandvars(v.strip().strip('"').strip("'"))
    return out


def expand_env_deep(value: Any) -> Any:
    """Recursive ``$VAR`` expansion through dict/list/str payloads."""
    if isinstance(value, dict):
        return {k: expand_env_deep(v) for k, v in value.items()}
    if isinstance(value, list):
        return [expand_env_deep(v) for v in value]
    if isinstance(value, str):
        return os.path.expandvars(value)
    return value


def parse_payload(payload: Any, format_hint: str | None = None) -> Any:
    """Decode a raw secret payload: explicit hint wins, else auto-detect
    JSON (``{``/``[`` prefix) then .env blobs, else plain text."""
    if isinstance(payload, (dict, list)):
        return expand_env_deep(payload)
    if not isinstance(payload, str):
        return payload
    text = payload.strip()
    hint = (format_hint or "auto").lower()
    if hint == "json" or (hint == "auto" and text.startswith(("{", "["))):
        try:
            return expand_env_deep(json.loads(text))
        except json.JSONDecodeError:
            if hint == "json":
                raise
    if hint == "env" or (hint == "auto" and "\n" in text and "=" in text):
        return parse_env_blob(text)
    return os.path.expandvars(text)


# --- manager protocol ------------------------------------------------------


class BaseSecretManager(ABC):
    """One backend; ``load(tenant_id)`` returns {name: parsed payload}."""

    type_name = "base"

    @abstractmethod
    def load(self, tenant_id: str) -> dict[str, Any]: ...


@dataclass
class SecretDefinition:
    """One named secret to fetch from a remote manager (AWS/GCP)."""

    name: str
    identifier: str | None = None
    version: str | None = None
    format: str | None = None

    @classmethod
    def many(cls, entries: list[Any] | None) -> list["SecretDefinition"]:
        defs: list[SecretDefinition] = []
        for e in entries or []:
            if isinstance(e, str):
                defs.append(cls(name=e))
            elif isinstance(e, dict) and "name" in e:
                defs.append(cls(
                    name=e["name"],
                    identifier=e.get("id") or e.get("identifier"),
                    version=e.get("version") or e.get("version_id")
                    or e.get("version_stage"),
                    format=e.get("format"),
                ))
            else:
                raise ConfigError(
                    "secret definitions must be names or dicts with 'name'")
        return defs

    def resolve_id(self, tenant_id: str, template: str) -> str:
        return (self.identifier or template).format(
            tenant=tenant_id, name=self.name)


class EnvSecretManager(BaseSecretManager):
    """``DATIVO_SECRET__<SCOPE>__<NAME...>[__<format>]`` environment
    variables; scope must be the tenant (or GLOBAL/ALL when allowed).
    Reference: secrets/managers/env.py:11-88."""

    type_name = "env"

    def __init__(self, prefix: str = "DATIVO_SECRET", delimiter: str = "__",
                 allow_global_scope: bool = True, environ: dict | None = None):
        self.prefix = prefix.upper()
        self.delimiter = delimiter
        self.allow_global_scope = allow_global_scope
        self._environ = environ  # injectable for tests

    def load(self, tenant_id: str) -> dict[str, Any]:
        env = self._environ if self._environ is not None else os.environ
        scopes = {tenant_id.upper()}
        if self.allow_global_scope:
            scopes |= {"GLOBAL", "ALL"}
        head = f"{self.prefix}{self.delimiter}"
        out: dict[str, Any] = {}
        for key, value in env.items():
            if not key.upper().startswith(head):
                continue
            parts = key.split(self.delimiter)
            if len(parts) < 3 or parts[1].upper() not in scopes:
                continue
            name_parts = parts[2:]
            hint = None
            if name_parts and name_parts[-1].lower() in _FORMAT_HINTS:
                hint = name_parts.pop().lower()
            name = "_".join(p for p in name_parts if p).lower()
            if name:
                out[name] = parse_payload(value, hint)
        return out


class FilesystemSecretManager(BaseSecretManager):
    """``<secrets_dir>/<tenant>/<name>.{json,env,*}`` — one file per
    secret, stem is the name. Reference: secrets/managers/filesystem.py."""

    type_name = "filesystem"

    def __init__(self, secrets_dir: str = "/secrets"):
        self.secrets_dir = str(secrets_dir)

    def load(self, tenant_id: str) -> dict[str, Any]:
        tenant_dir = os.path.join(self.secrets_dir, tenant_id)
        if not os.path.isdir(tenant_dir):
            raise ConfigError(f"secrets directory not found: {tenant_dir}")
        out: dict[str, Any] = {}
        log = logging.getLogger(__name__)
        for fname in sorted(os.listdir(tenant_dir)):
            path = os.path.join(tenant_dir, fname)
            if fname.startswith(".") or not os.path.isfile(path):
                continue
            stem, ext = os.path.splitext(fname)
            try:
                with open(path, encoding="utf-8") as fh:
                    raw = fh.read()
                if ext == ".json":
                    out[stem] = expand_env_deep(json.loads(raw))
                elif ext == ".env":
                    out[stem] = parse_env_blob(raw)
                else:
                    out[stem] = os.path.expandvars(raw.strip())
            except Exception as exc:  # non-fatal, like the reference
                log.warning("failed to load secret file %s: %s", path, exc)
        return out


class VaultSecretManager(BaseSecretManager):
    """HashiCorp Vault KV (v1/v2) with token or approle auth; paths render
    ``{tenant}``. Reference: secrets/managers/vault.py:11-189. ``hvac`` is
    imported lazily; tests inject ``client_factory``."""

    type_name = "vault"

    def __init__(self, address: str | None = None, mount_point: str = "secret",
                 path_template: str = "{tenant}", kv_version: int = 2,
                 namespace: str | None = None, auth_method: str = "token",
                 token: str | None = None, role_id: str | None = None,
                 secret_id: str | None = None,
                 paths: list[Any] | None = None,
                 client_factory: Callable[[], Any] | None = None):
        self.address = address or os.environ.get("VAULT_ADDR")
        if not self.address and client_factory is None:
            raise ConfigError("vault manager needs 'address' or VAULT_ADDR")
        self.mount_point = mount_point
        self.kv_version = kv_version
        self.namespace = namespace or os.environ.get("VAULT_NAMESPACE")
        self.auth_method = auth_method
        self.token = token or os.environ.get("VAULT_TOKEN")
        self.role_id = role_id or os.environ.get("VAULT_ROLE_ID")
        self.secret_id = secret_id or os.environ.get("VAULT_SECRET_ID")
        self._client_factory = client_factory or self._build_client
        self.paths = self._normalize(paths, path_template)

    def _normalize(self, paths: list[Any] | None,
                   template: str) -> list[dict[str, Any]]:
        base = {"mount_point": self.mount_point,
                "kv_version": self.kv_version}
        if not paths:
            return [{"path": template, **base}]
        out = []
        for p in paths:
            if isinstance(p, str):
                out.append({"path": p, **base})
            elif isinstance(p, dict) and "path" in p:
                out.append({**base, **p})
            else:
                raise ConfigError("vault paths must be strings or "
                                  "dicts with 'path'")
        return out

    def load(self, tenant_id: str) -> dict[str, Any]:
        client = self._client_factory()
        out: dict[str, Any] = {}
        for p in self.paths:
            path = p["path"].format(tenant=tenant_id)
            if int(p["kv_version"]) == 1:
                resp = client.secrets.kv.v1.read_secret(
                    path=path, mount_point=p["mount_point"])
                data = (resp or {}).get("data", {})
            else:
                resp = client.secrets.kv.v2.read_secret_version(
                    path=path, mount_point=p["mount_point"])
                data = (resp or {}).get("data", {}).get("data", {})
            if data:
                out.update(expand_env_deep(data))
        return out

    def _build_client(self) -> Any:  # pragma: no cover - needs live vault
        try:
            import hvac
        except ImportError as exc:
            raise ConfigError("hvac is required for the vault secret "
                              "manager") from exc
        client = hvac.Client(url=self.address, namespace=self.namespace)
        if self.auth_method == "token":
            if not self.token:
                raise ConfigError("vault token auth needs a token")
            client.token = self.token
        elif self.auth_method == "approle":
            if not (self.role_id and self.secret_id):
                raise ConfigError("vault approle auth needs role_id + "
                                  "secret_id")
            client.auth.approle.login(role_id=self.role_id,
                                      secret_id=self.secret_id)
        else:
            raise ConfigError(f"unsupported vault auth: {self.auth_method}")
        if not client.is_authenticated():
            raise ConfigError("vault authentication failed")
        return client


class AwsSecretManager(BaseSecretManager):
    """AWS Secrets Manager: either per-secret definitions rendered from
    ``secret_id_template`` or one JSON bundle per tenant. Reference:
    secrets/managers/aws.py:10-141. ``boto3`` lazy; tests inject
    ``client``."""

    type_name = "aws"

    def __init__(self, region_name: str | None = None,
                 secret_id_template: str = "{tenant}/{name}",
                 secrets: list[Any] | None = None,
                 bundle_secret_id_template: str | None = None,
                 bundle_format: str = "json",
                 client: Any | None = None):
        self.region_name = region_name
        self.secret_id_template = secret_id_template
        self.bundle_secret_id_template = bundle_secret_id_template
        self.bundle_format = bundle_format
        self.definitions = SecretDefinition.many(secrets)
        self._client = client

    def load(self, tenant_id: str) -> dict[str, Any]:
        client = self._client or self._build_client()
        if self.definitions:
            out: dict[str, Any] = {}
            for d in self.definitions:
                sid = d.resolve_id(tenant_id, self.secret_id_template)
                out[d.name] = parse_payload(
                    self._value(client, sid, d.version), d.format)
            return out
        if not self.bundle_secret_id_template:
            raise ConfigError("aws manager needs 'secrets' definitions or "
                              "'bundle_secret_id_template'")
        bundle = parse_payload(
            self._value(client,
                        self.bundle_secret_id_template.format(
                            tenant=tenant_id), None),
            self.bundle_format)
        if not isinstance(bundle, dict):
            raise ConfigError("aws bundle secret must decode to a dict")
        return expand_env_deep(bundle)

    @staticmethod
    def _value(client: Any, secret_id: str, version: str | None) -> str:
        params: dict[str, str] = {"SecretId": secret_id}
        if version:
            params["VersionId"] = version
        resp = client.get_secret_value(**params)
        if resp.get("SecretString") is not None:
            return resp["SecretString"]
        blob = resp.get("SecretBinary")
        if blob is None:
            return ""
        return blob.decode("utf-8") if isinstance(blob, bytes) else str(blob)

    def _build_client(self) -> Any:  # pragma: no cover - needs live AWS
        try:
            import boto3
        except ImportError as exc:
            raise ConfigError("boto3 is required for the aws secret "
                              "manager") from exc
        return boto3.session.Session().client(
            "secretsmanager", region_name=self.region_name)


class GcpSecretManager(BaseSecretManager):
    """Google Cloud Secret Manager: per-secret definitions or a JSON
    bundle; resource name ``projects/{project}/secrets/{id}/versions/{v}``.
    Reference: secrets/managers/gcp.py:10-140. SDK lazy; tests inject
    ``client``."""

    type_name = "gcp"

    def __init__(self, project_id: str | None = None,
                 secret_id_template: str = "{tenant}-{name}",
                 secrets: list[Any] | None = None,
                 bundle_secret_id_template: str | None = None,
                 bundle_format: str = "json", version: str = "latest",
                 client: Any | None = None):
        self.project_id = project_id or os.environ.get("GOOGLE_CLOUD_PROJECT")
        if not self.project_id:
            raise ConfigError("gcp secret manager needs project_id")
        self.secret_id_template = secret_id_template
        self.bundle_secret_id_template = bundle_secret_id_template
        self.bundle_format = bundle_format
        self.version = version
        self.definitions = SecretDefinition.many(secrets)
        self._client = client

    def _resource(self, secret_id: str, version: str) -> str:
        base = (secret_id if secret_id.startswith("projects/")
                else f"projects/{self.project_id}/secrets/{secret_id}")
        return f"{base}/versions/{version}"

    def _access(self, client: Any, secret_id: str, version: str) -> str:
        resp = client.access_secret_version(
            name=self._resource(secret_id, version))
        data = resp.payload.data
        return data.decode("utf-8") if isinstance(data, bytes) else str(data)

    def load(self, tenant_id: str) -> dict[str, Any]:
        client = self._client or self._build_client()
        if self.definitions:
            out: dict[str, Any] = {}
            for d in self.definitions:
                sid = d.resolve_id(tenant_id, self.secret_id_template)
                out[d.name] = parse_payload(
                    self._access(client, sid, d.version or self.version),
                    d.format)
            return out
        if not self.bundle_secret_id_template:
            raise ConfigError("gcp manager needs 'secrets' definitions or "
                              "'bundle_secret_id_template'")
        bundle = parse_payload(
            self._access(client,
                         self.bundle_secret_id_template.format(
                             tenant=tenant_id), self.version),
            self.bundle_format)
        if not isinstance(bundle, dict):
            raise ConfigError("gcp bundle secret must decode to a dict")
        return expand_env_deep(bundle)

    def _build_client(self) -> Any:  # pragma: no cover - needs live GCP
        try:
            from google.cloud import secretmanager
        except ImportError as exc:
            raise ConfigError("google-cloud-secret-manager is required for "
                              "the gcp secret manager") from exc
        return secretmanager.SecretManagerServiceClient()


# --- registry --------------------------------------------------------------

MANAGERS: dict[str, type[BaseSecretManager]] = {
    "env": EnvSecretManager,
    "environment": EnvSecretManager,
    "filesystem": FilesystemSecretManager,
    "fs": FilesystemSecretManager,
    "file": FilesystemSecretManager,
    "vault": VaultSecretManager,
    "hashicorp": VaultSecretManager,
    "hashicorp_vault": VaultSecretManager,
    "aws": AwsSecretManager,
    "aws_secrets_manager": AwsSecretManager,
    "gcp": GcpSecretManager,
    "gcp_secret_manager": GcpSecretManager,
}


def create_manager(manager_type: str | None,
                   secrets_dir: str = "/secrets",
                   config: dict[str, Any] | None = None) -> BaseSecretManager:
    """Registry dispatch (reference: secrets/__init__.py:58-89); unknown
    types fail at config time with the supported list."""
    normalized = (manager_type or "env").lower()
    cls = MANAGERS.get(normalized)
    if cls is None:
        raise ConfigError(
            f"unsupported secret manager '{manager_type}'; supported: "
            f"{sorted(set(MANAGERS))}")
    cfg = dict(config or {})
    if cls is FilesystemSecretManager:
        cfg.setdefault("secrets_dir", secrets_dir)
    return cls(**cfg)


def load_secrets(tenant_id: str, secrets_dir: str = "/secrets",
                 manager_type: str | None = None,
                 manager_config: dict[str, Any] | None = None,
                 ) -> dict[str, Any]:
    """Main entry point (reference: secrets/__init__.py:91-118)."""
    return create_manager(manager_type, secrets_dir,
                          manager_config).load(tenant_id)


# --- placeholder resolution ------------------------------------------------

_PLACEHOLDER_RE = re.compile(r"\$\{secret:([A-Za-z0-9_.\-]+)\}")


def _lookup(secrets: dict[str, Any], ref: str) -> Any:
    """Dotted-path lookup: ``name`` or ``name.key[.key...]``."""
    head, *rest = ref.split(".")
    if head not in secrets:
        raise ConfigError(f"unknown secret reference '{ref}'")
    value: Any = secrets[head]
    for key in rest:
        if not isinstance(value, dict) or key not in value:
            raise ConfigError(f"unknown secret reference '{ref}'")
        value = value[key]
    return value


def resolve_placeholders(value: Any, secrets: dict[str, Any]) -> Any:
    """Substitute ``${secret:name}`` / ``${secret:name.key}`` through a
    config tree. A string that is exactly one placeholder keeps the secret's
    native type (dict credentials stay dicts); embedded placeholders
    stringify. Unknown references raise at config time — before any data
    is touched, matching the reference's fail-at-startup posture."""
    if isinstance(value, dict):
        return {k: resolve_placeholders(v, secrets) for k, v in value.items()}
    if isinstance(value, list):
        return [resolve_placeholders(v, secrets) for v in value]
    if isinstance(value, str):
        m = _PLACEHOLDER_RE.fullmatch(value.strip())
        if m:
            return _lookup(secrets, m.group(1))
        return _PLACEHOLDER_RE.sub(
            lambda mm: str(_lookup(secrets, mm.group(1))), value)
    return value


# --- validation ------------------------------------------------------------

_FILE_TEMPLATE_RE = re.compile(r"/([^/]+)\.(json|env|txt|key)$")


def validate_for_connector(secrets: dict[str, Any], connector_type: str,
                           credentials_config: dict[str, Any]) -> bool:
    """Required-secret presence check per connector type (reference:
    secrets/validation.py:9-70). Raises ConfigError listing what's
    missing; ``type: none`` short-circuits."""
    if str(credentials_config.get("type", "none")) == "none":
        return True
    required: list[str] = []
    template = credentials_config.get("file_template")
    if template:
        m = _FILE_TEMPLATE_RE.search(str(template))
        if m:
            required.append(m.group(1))
    if connector_type in ("stripe", "hubspot"):
        if f"{connector_type}_api_key" not in secrets \
                and "api_key" not in secrets:
            required.append(f"{connector_type}_api_key")
    elif connector_type in ("postgres", "mysql"):
        if connector_type not in secrets:
            required.append(connector_type)
    elif connector_type == "iceberg":
        if "iceberg" not in secrets and "nessie" not in secrets \
                and not os.environ.get("NESSIE_URI"):
            required.append("iceberg or nessie or NESSIE_URI")
    missing = [
        name for name in required
        if not any(k == name or k.startswith(name) for k in secrets)
    ]
    if missing:
        raise ConfigError(
            f"missing required secrets for connector '{connector_type}': "
            + ", ".join(missing))
    return True


# --- log masking -----------------------------------------------------------


def _leaf_values(value: Any) -> list[str]:
    if isinstance(value, dict):
        return [s for v in value.values() for s in _leaf_values(v)]
    if isinstance(value, list):
        return [s for v in value for s in _leaf_values(v)]
    if isinstance(value, str) and len(value) >= 4:
        return [value]
    return []


class SecretRedactingFilter(logging.Filter):
    """Masks every loaded secret value in log output (reference:
    ``setup_logging(redact_secrets=True)``, cli.py:184). Values under 4
    chars are skipped — masking 'a' would shred unrelated text.

    Masks the rendered message AND the exception traceback: secret
    material that rides exception text (a JDBC URL in an OperationalError,
    say) doesn't match the key-pattern regex in obs.redact_text, so the
    exact-value pass here is the only thing standing between it and the
    log. The masked traceback is pre-rendered into ``record.exc_text``,
    which both stdlib Formatter and obs.StructuredJSONFormatter prefer
    over re-formatting ``exc_info``."""

    def __init__(self, secrets: dict[str, Any]):
        super().__init__()
        # longest-first so substring values don't leave residue
        self._values = sorted(set(_leaf_values(secrets)), key=len,
                              reverse=True)

    def mask(self, text: str) -> str:
        for v in self._values:
            if v in text:
                text = text.replace(v, "***")
        return text

    def filter(self, record: logging.LogRecord) -> bool:
        if self._values:
            record.msg, record.args = self.mask(record.getMessage()), ()
            if record.exc_info and record.exc_info[0] is not None:
                record.exc_text = self.mask(
                    record.exc_text
                    or logging.Formatter().formatException(record.exc_info))
        return True


def redactor(secrets: dict[str, Any],
             logger: logging.Logger | None = None) -> SecretRedactingFilter:
    """Attach (and return) a redaction filter for the loaded secrets.

    With no explicit ``logger`` the filter goes where it actually runs:
    onto the HANDLERS rendering engine records (obs.register_secret_filter).
    Logger-level filters only fire for records created on that exact
    logger — a root-logger filter never sees records propagated from
    ``dativo_ingest_spark.*`` module loggers, which is where credentials
    get logged. The root LOGGER also gets the filter for records emitted
    directly on it."""
    filt = SecretRedactingFilter(secrets)
    if logger is not None:
        logger.addFilter(filt)
    else:
        from dativo_ingest_spark import obs

        obs.register_secret_filter(filt)
        logging.getLogger().addFilter(filt)
    return filt
