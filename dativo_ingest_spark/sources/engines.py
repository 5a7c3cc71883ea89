"""Airbyte / Singer engine bridge: subprocess JSONL protocol → DataFrames.

The reference's SaaS path runs Airbyte connector containers and parses
their stdout (reference ``connectors/engine_framework.py:109-303``): config
JSON on stdin; JSONL messages out (``{"type": "RECORD", "record": {...}}``,
``{"type": "STATE", ...}``); RECORDs re-batched 1000/batch (``:134-146``);
STATE merged into the incremental state store as it streams (``:254-303``);
non-JSON lines (connector logs) skipped (``:263-265``); non-zero exit is a
hard failure (``:243-246``). Stripe and HubSpot are thin Airbyte subclasses
that only add metadata tags (``stripe_extractor.py:10-59``,
``hubspot_extractor.py:10-55``); Singer is declared but stubbed
(``engine_framework.py:350-391``) — implemented here from the public Singer
spec (``RECORD``/``STATE`` with ``stream``+``record``/``value`` keys).

Spark-first differences:

* **The driver never holds the corpus.** The reference ``communicate()``s —
  buffering the container's entire stdout in one string. Here RECORD
  payloads stream straight into per-stream JSONL spool part-files (one
  file per ``batch_size`` records), and ``spark.read.json`` parses the
  spool *distributed*, with an optional explicit schema. Driver memory is
  O(batch), compute is cluster-side.
* **Streams stay separate.** Records are routed by their ``stream`` name
  into per-stream spool dirs (the reference flattens all streams into one
  record iterator and loses the routing).
* **Command is injectable.** ``argv`` defaults to the reference's
  ``docker run --rm -i <image> read --config /dev/stdin`` but any argv is
  accepted — tests drive a local fake connector process; production can
  point at a podman/k8s shim without code changes.

State ordering note: STATE messages are applied via ``state_callback`` only
after every RECORD that *preceded* them on the wire has been flushed to the
spool — the Airbyte checkpoint contract. Callers keep commit-then-state by
passing a callback that stages values and persisting after the sink commit
(see ``StateStore.merge_engine_state``).
"""

from __future__ import annotations

import json
import os
import subprocess
from collections.abc import Callable
from dataclasses import dataclass, field as dc_field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from dativo_ingest_spark.config.registry import CONNECTORS, ConnectorSpec

DEFAULT_BATCH_SIZE = 1000  # reference engine_framework.py:134


class EngineProtocolError(RuntimeError):
    """Connector process failed (non-zero exit or broken stream)."""


def airbyte_message(msg: dict) -> tuple[str | None, Any]:
    """Classify one Airbyte JSONL message → ("record"|"state"|None, payload).
    RECORD payload = (stream, data dict); STATE payload = state dict."""
    t = msg.get("type")
    if t == "RECORD":
        rec = msg.get("record") or {}
        return "record", (rec.get("stream") or "_default", rec.get("data") or {})
    if t == "STATE":
        state = msg.get("state") or {}
        # modern protocol nests under stream/global/data; legacy is flat
        return "state", state.get("data", state)
    return None, None  # LOG / TRACE / SPEC / CATALOG: ignored


def singer_message(msg: dict) -> tuple[str | None, Any]:
    """Singer spec: RECORD carries stream+record, STATE carries value."""
    t = msg.get("type")
    if t == "RECORD":
        return "record", (msg.get("stream") or "_default",
                          msg.get("record") or {})
    if t == "STATE":
        return "state", msg.get("value") or {}
    return None, None  # SCHEMA / ACTIVATE_VERSION: ignored


@dataclass
class EngineResult:
    """Outcome of one protocol run: per-stream spool dirs + state."""

    spool_root: str
    streams: dict[str, str] = dc_field(default_factory=dict)
    states: list[dict] = dc_field(default_factory=list)
    n_records: int = 0

    def read(self, spark: SparkSession, stream: str,
             schema=None) -> DataFrame:
        """Distributed parse of one stream's spool (driver shuttled bytes
        only; the JSON decode happens executor-side)."""
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.json(self.streams[stream])


class _StreamSpool:
    """Append-only JSONL spool for one stream, rolled per batch."""

    def __init__(self, root: str, batch_size: int):
        self.root = root
        self.batch_size = batch_size
        self._buf: list[str] = []
        self._part = 0
        os.makedirs(root, exist_ok=True)

    def add(self, data: dict) -> None:
        self._buf.append(json.dumps(data))
        if len(self._buf) >= self.batch_size:
            self.flush()

    def flush(self) -> None:
        if not self._buf:
            return
        path = os.path.join(self.root, f"part-{self._part:05d}.jsonl")
        with open(path, "w") as fh:
            fh.write("\n".join(self._buf) + "\n")
        self._part += 1
        self._buf.clear()


def run_protocol(
    argv: list[str],
    config: dict,
    spool_root: str,
    parse: Callable[[dict], tuple[str | None, Any]] = airbyte_message,
    batch_size: int = DEFAULT_BATCH_SIZE,
    state_callback: Callable[[dict], None] | None = None,
) -> EngineResult:
    """Run one connector process and spool its RECORD stream.

    stdout is consumed line-by-line as the process produces it (bounded
    memory; the reference buffers everything). STATE messages flush all
    pending records first, then fire ``state_callback`` — a state is only
    surfaced once the records it checkpoints are durably spooled.
    """
    proc = subprocess.Popen(
        argv,
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )
    result = EngineResult(spool_root=spool_root)
    spools: dict[str, _StreamSpool] = {}
    try:
        assert proc.stdin is not None and proc.stdout is not None
        proc.stdin.write(json.dumps(config))
        proc.stdin.close()
        for line in proc.stdout:
            line = line.strip()
            if not line:
                continue
            try:
                msg = json.loads(line)
            except json.JSONDecodeError:
                continue  # connector log noise (reference :263-265)
            kind, payload = parse(msg)
            if kind == "record":
                stream, data = payload
                spool = spools.get(stream)
                if spool is None:
                    sdir = os.path.join(spool_root, stream)
                    spool = spools[stream] = _StreamSpool(sdir, batch_size)
                    result.streams[stream] = sdir
                spool.add(data)
                result.n_records += 1
            elif kind == "state":
                for s in spools.values():
                    s.flush()  # records preceding the checkpoint are durable
                result.states.append(payload)
                if state_callback is not None:
                    state_callback(payload)
    finally:
        for s in spools.values():
            s.flush()
        stderr = proc.stderr.read() if proc.stderr else ""
        rc = proc.wait()
    if rc != 0:
        raise EngineProtocolError(
            f"connector exited {rc}: {stderr.strip()[-2000:]}"
        )
    return result


def build_engine_config(
    spec: ConnectorSpec,
    options: dict[str, Any] | None = None,
    objects: list[str] | None = None,
    cursor_field: str | None = None,
    tenant_id: str | None = None,
    env: dict[str, str] | None = None,
) -> dict[str, Any]:
    """Connector config assembly (reference engine_config.py:56-97,150-193):
    credentials (api_key from env var / service-account file with {tenant}
    substitution), recipe start_date + default streams, job-level object
    override, cursor_field, then raw connection options merged last."""
    options = dict(options or {})
    env = os.environ if env is None else env
    config: dict[str, Any] = {}

    creds = options.pop("credentials", {}) or {}
    if creds.get("type") == "api_key":
        api_key = env.get(creds.get("from_env", ""), None)
        if api_key:
            config["api_key"] = api_key
    elif creds.get("type") == "service_account":
        template = creds.get("file_template", "")
        path = template.replace("{tenant}", tenant_id or "default")
        if path and os.path.exists(path):
            with open(path) as fh:
                config.update(json.load(fh))

    if options.get("start_date_default"):
        config["start_date"] = options.pop("start_date_default")
    streams = options.pop("streams_default", []) or []
    if objects:  # job-level override wins (reference :84-86)
        streams = list(objects)
    if streams:
        unsupported = set(streams) - set(spec.objects_supported or streams)
        if spec.objects_supported and unsupported:
            raise ValueError(
                f"objects {sorted(unsupported)} not supported by "
                f"'{spec.name}' (supported: {list(spec.objects_supported)})"
            )
        config["streams"] = streams
    if cursor_field:
        config["cursor_field"] = cursor_field
    config.update(options.pop("connection", {}) or {})
    return config


def docker_argv(image: str) -> list[str]:
    """The reference's container invocation (engine_framework.py:212-225)."""
    return ["docker", "run", "--rm", "-i", image, "read",
            "--config", "/dev/stdin"]


class AirbyteSource:
    """Airbyte-engine source: registry-gated, injectable process."""

    connector_type = "airbyte"
    category: str | None = None
    default_image: str | None = None

    def __init__(
        self,
        docker_image: str | None = None,
        options: dict[str, Any] | None = None,
        objects: list[str] | None = None,
        cursor_field: str | None = None,
        tenant_id: str | None = None,
        argv: list[str] | None = None,
        batch_size: int = DEFAULT_BATCH_SIZE,
    ):
        self.image = docker_image or self.default_image
        if argv is None and not self.image:
            raise ValueError(
                f"Airbyte connector '{self.connector_type}' requires a "
                "docker_image (reference engine_framework.py:94-99)"
            )
        self.argv = argv if argv is not None else docker_argv(self.image)
        self.spec = CONNECTORS.get(self.connector_type) or ConnectorSpec(
            self.connector_type, ("source",), default_engine="airbyte")
        self.options = dict(options or {})
        self.objects = objects
        self.cursor_field = cursor_field
        self.tenant_id = tenant_id
        self.batch_size = batch_size

    def extract(
        self,
        spool_root: str,
        state_callback: Callable[[dict], None] | None = None,
        env: dict[str, str] | None = None,
    ) -> EngineResult:
        config = build_engine_config(
            self.spec, self.options, self.objects, self.cursor_field,
            self.tenant_id, env,
        )
        return run_protocol(
            self.argv, config, spool_root,
            parse=airbyte_message, batch_size=self.batch_size,
            state_callback=state_callback,
        )

    def extract_metadata(self) -> dict[str, Any]:
        """Asset tags (reference engine_framework.py:62-74 + subclass
        overrides)."""
        tags = {"connector_type": self.connector_type,
                "engine_type": "airbyte"}
        if self.category:
            tags["connector"] = self.connector_type
            tags["category"] = self.category
        return {"tags": tags}


class StripeSource(AirbyteSource):
    """Stripe via Airbyte (reference stripe_extractor.py:10-59): the
    registry pins engine=airbyte, category=payments, objects
    charges/customers/invoices, cursor strategy 'created'."""

    connector_type = "stripe"
    category = "payments"
    default_image = "airbyte/source-stripe"


class HubSpotSource(AirbyteSource):
    """HubSpot via Airbyte (reference hubspot_extractor.py:10-55):
    category=crm, objects contacts/deals/companies, strategy
    'updated_after'."""

    connector_type = "hubspot"
    category = "crm"
    default_image = "airbyte/source-hubspot"


class SingerSource(AirbyteSource):
    """Singer tap runner — the reference declares this engine and stubs it
    (engine_framework.py:350-391 raises NotImplementedError); the JSONL
    protocol differs from Airbyte only in message shape, so the same spool
    machinery applies."""

    connector_type = "singer"

    def __init__(self, argv: list[str], **kw):
        super().__init__(docker_image=None, argv=argv, **kw)

    def extract(self, spool_root, state_callback=None, env=None):
        config = build_engine_config(
            self.spec, self.options, self.objects, self.cursor_field,
            self.tenant_id, env,
        )
        return run_protocol(
            self.argv, config, spool_root,
            parse=singer_message, batch_size=self.batch_size,
            state_callback=state_callback,
        )


class MeltanoSource(SingerSource):
    """Meltano tap runner — the reference's other stubbed engine
    (engine_framework.py:308-347: "running meltano invoke tap-<name>,
    parsing Singer-compatible output"). ``meltano invoke`` emits the Singer
    protocol on stdout, so this is the Singer parser over the meltano argv;
    ``project_dir`` maps to ``--cwd``."""

    connector_type = "meltano"

    def __init__(self, tap: str, project_dir: str | None = None,
                 argv: list[str] | None = None, **kw):
        if argv is None:
            argv = ["meltano"]
            if project_dir:
                argv += ["--cwd", project_dir]
            argv += ["invoke", tap]
        super().__init__(argv=argv, **kw)
        self.tap = tap
