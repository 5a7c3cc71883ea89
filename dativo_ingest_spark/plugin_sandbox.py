"""Sandboxed execution for custom Python reader plugins.

The reference isolates untrusted plugins in Docker containers with
resource limits, a seccomp profile, and disabled networking (reference:
src/dativo_ingest/sandbox.py:43-140 PluginSandbox,
sandboxed_plugin_wrapper.py:36-330 SandboxedReaderWrapper,
sandbox.py:1328-1363 should_sandbox_plugin gating). No Docker daemon
exists in this environment, so the isolation boundary here is a
**subprocess jail**: fresh interpreter, scrubbed environment (allowlist),
scratch working directory, POSIX rlimits (address space, CPU seconds,
file size, process count) applied pre-exec, and a hard wall-clock timeout
that kills the process group. The JSONL protocol between driver and jail
mirrors the Airbyte bridge (sources/engines.py): ``batch`` lines stream
extract results incrementally — an upgrade over the reference wrapper's
collect-all-then-return — and a single ``result``/``error`` line carries
scalar calls.

What a subprocess jail cannot enforce — network egress and syscall
filtering — is exactly the reference's Docker/seccomp value-add; swap
:class:`SubprocessSandbox` for a container runner there (the
``network_disabled``/``seccomp_profile`` options are accepted and recorded
so configs stay portable, and ``network_disabled`` logs a warning that it
is advisory here).

Same interface either way: :class:`SandboxedReader` is a drop-in
``BaseReader``, so ``reader_to_dataframe``/``partitioned_read`` and the
runner never know whether the plugin ran in-process, in a subprocess, or
in a container.
"""

from __future__ import annotations

import json
import logging
import os
import subprocess
import sys
import tempfile
from collections.abc import Iterator
from pathlib import Path
from typing import Any

from dativo_ingest_spark.plugins import (
    BaseReader,
    ConnectionTestResult,
    DiscoveryResult,
    PluginError,
)

log = logging.getLogger(__name__)

#: environment variables the jail inherits (interpreter + locale only —
#: credentials/secrets must flow through source_config explicitly)
DEFAULT_ENV_ALLOWLIST = ("PATH", "HOME", "LANG", "LC_ALL", "TMPDIR",
                         "PYTHONHASHSEED")


class SandboxError(PluginError):
    """Plugin execution failed inside the sandbox (crash, timeout,
    protocol violation, or resource-limit kill)."""


def should_sandbox_plugin(
    plugin_path: str,
    mode: str = "self_hosted",
    plugin_config: dict[str, Any] | None = None,
) -> bool:
    """Gating identical to the reference (sandbox.py:1328-1363): an
    explicit ``sandbox.enabled`` wins; otherwise cloud mode sandboxes
    Python/native plugins and self-hosted runs in-process."""
    if plugin_config and plugin_config.get("sandbox"):
        sandbox_config = plugin_config["sandbox"]
        if isinstance(sandbox_config, dict):
            enabled = sandbox_config.get("enabled")
            if enabled is not None:
                return bool(enabled)
    if mode == "cloud":
        file_path = plugin_path.split(":")[0]
        return Path(file_path).suffix in (".py", ".so", ".dylib", ".dll")
    return False


_BOOTSTRAP = r"""
import importlib.util, json, resource, sys

def _limit(res, value):
    if value is not None:
        try:
            resource.setrlimit(res, (value, value))
        except (ValueError, OSError):
            pass

def main():
    req = json.loads(sys.stdin.readline())
    # the plugin SDK (BaseReader) must be importable inside the jail —
    # the subprocess analog of the Docker image shipping the SDK
    if req.get("sdk_path") and req["sdk_path"] not in sys.path:
        sys.path.insert(0, req["sdk_path"])
    _limit(resource.RLIMIT_AS, req.get("memory_limit_bytes"))
    _limit(resource.RLIMIT_CPU, req.get("cpu_seconds"))
    _limit(resource.RLIMIT_FSIZE, req.get("file_size_bytes"))
    _limit(resource.RLIMIT_NPROC, req.get("max_processes"))
    spec = importlib.util.spec_from_file_location("_jailed", req["path"])
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    cls = getattr(module, req["cls"], None)
    if cls is None:
        raise RuntimeError("class %s not found in %s"
                           % (req["cls"], req["path"]))
    plugin = cls(req["source_config"])
    method = getattr(plugin, req["method"])
    out = sys.stdout
    if req["method"] == "extract":
        for batch in method(req.get("state")):
            out.write(json.dumps({"type": "batch",
                                  "records": batch}, default=str) + "\n")
            out.flush()
        out.write(json.dumps({"type": "done"}) + "\n")
    else:
        value = method()
        if hasattr(value, "__dict__"):
            value = dict(value.__dict__)
        out.write(json.dumps({"type": "result", "value": value},
                             default=str) + "\n")
    out.flush()

try:
    main()
except BaseException as exc:  # report, never hang the pipe
    import traceback
    sys.stdout.write(json.dumps({
        "type": "error", "message": "%s: %s" % (type(exc).__name__, exc),
        "traceback": traceback.format_exc()[-2000:]}) + "\n")
    sys.stdout.flush()
    sys.exit(1)
"""


class SubprocessSandbox:
    """One isolated plugin call per :meth:`execute` / :meth:`stream`.

    Limits are enforced pre-exec inside the child (rlimits) plus a driver
    wall-clock timeout; the environment is rebuilt from the allowlist and
    the working directory is a scratch tempdir, so plugin code never sees
    the driver's env/cwd. The Docker swap point: replace the Popen with a
    container run of the same bootstrap + JSONL contract."""

    def __init__(
        self,
        plugin_path: str,
        timeout: float = 300.0,
        # limit defaults mirror the reference (sandbox.py:49-72): none
        # unless configured. Note RLIMIT_AS bounds VIRTUAL address space —
        # a jailed interpreter importing pyspark/pyarrow reserves several
        # GB of VA, so meaningful values start ~4096 MB; RLIMIT_NPROC
        # counts the USER's total processes, not the jail's children.
        memory_limit_mb: int | None = None,
        cpu_seconds: int | None = None,
        file_size_mb: int | None = None,
        max_processes: int | None = None,
        network_disabled: bool = True,
        seccomp_profile: str | None = None,
        env_allowlist: tuple[str, ...] = DEFAULT_ENV_ALLOWLIST,
        python_executable: str | None = None,
    ):
        path, _, cls_name = plugin_path.rpartition(":")
        if not cls_name or not path:
            raise PluginError(
                f"plugin spec must be 'file.py:ClassName': {plugin_path}")
        if not os.path.exists(path):
            raise PluginError(f"plugin module not found: {path}")
        self.path, self.cls_name = path, cls_name
        self.timeout = timeout
        self.memory_limit_mb = memory_limit_mb
        self.cpu_seconds = cpu_seconds
        self.file_size_mb = file_size_mb
        self.max_processes = max_processes
        self.network_disabled = network_disabled
        self.seccomp_profile = seccomp_profile
        self.env_allowlist = env_allowlist
        self.python = python_executable or sys.executable
        if network_disabled:
            log.warning(
                "plugin sandbox: network_disabled is advisory in the "
                "subprocess jail (enforced only by the Docker runner)")

    def _request(self, method: str, source_config: dict[str, Any],
                 state: dict[str, Any] | None) -> dict[str, Any]:
        import dativo_ingest_spark as _pkg

        mb = 1024 * 1024
        return {
            "path": os.path.abspath(self.path),
            "sdk_path": os.path.dirname(os.path.dirname(
                os.path.abspath(_pkg.__file__))),
            "cls": self.cls_name,
            "method": method,
            "source_config": source_config,
            "state": state,
            "memory_limit_bytes": (self.memory_limit_mb * mb
                                   if self.memory_limit_mb else None),
            "cpu_seconds": self.cpu_seconds,
            "file_size_bytes": (self.file_size_mb * mb
                                if self.file_size_mb else None),
            "max_processes": self.max_processes,
        }

    def _spawn(self, scratch: str) -> subprocess.Popen:
        env = {k: os.environ[k] for k in self.env_allowlist
               if k in os.environ}
        # stderr goes to a scratch FILE, not a pipe: a chatty plugin would
        # fill a 64 KB stderr pipe we never drain mid-stream and stall
        # until the watchdog kills it
        stderr = open(os.path.join(scratch, "stderr.log"), "w")
        try:
            return subprocess.Popen(
                [self.python, "-c", _BOOTSTRAP],
                stdin=subprocess.PIPE, stdout=subprocess.PIPE,
                stderr=stderr, cwd=scratch, env=env, text=True,
                start_new_session=True,  # own group: timeout kills children
            )
        finally:
            stderr.close()  # the child holds its own fd

    def stream(self, method: str, source_config: dict[str, Any],
               state: dict[str, Any] | None = None
               ) -> Iterator[dict[str, Any]]:
        """Yield protocol lines from one jailed call; raises SandboxError
        on crash/timeout/protocol breach. ``extract`` yields ``batch``
        lines as the plugin produces them (incremental, bounded memory on
        the driver side). Thread-safe: the wall-clock deadline is a
        watchdog timer killing the process group, not a signal handler."""
        import signal
        import threading

        with tempfile.TemporaryDirectory(prefix="dativo_jail_") as scratch:
            proc = self._spawn(scratch)
            timed_out = threading.Event()

            def _kill():
                timed_out.set()
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except (ProcessLookupError, PermissionError):
                    proc.kill()

            watchdog = threading.Timer(self.timeout, _kill)
            watchdog.daemon = True
            watchdog.start()
            try:
                proc.stdin.write(
                    json.dumps(self._request(method, source_config, state))
                    + "\n")
                proc.stdin.flush()
                proc.stdin.close()
                for line in proc.stdout:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        doc = json.loads(line)
                    except json.JSONDecodeError as exc:
                        raise SandboxError(
                            f"plugin wrote non-protocol output: "
                            f"{line[:200]}") from exc
                    if doc.get("type") == "error":
                        raise SandboxError(
                            f"plugin failed in sandbox: "
                            f"{doc.get('message')}\n"
                            f"{doc.get('traceback', '')}")
                    yield doc
                rc = proc.wait(timeout=5)
                if timed_out.is_set():
                    raise SandboxError(
                        f"plugin exceeded sandbox timeout "
                        f"({self.timeout:g}s)")
                if rc != 0:
                    try:
                        with open(os.path.join(scratch,
                                               "stderr.log")) as fh:
                            err = fh.read()[-1000:]
                    except OSError:
                        err = ""
                    raise SandboxError(
                        f"plugin sandbox exited {rc}: {err}")
            finally:
                watchdog.cancel()
                if proc.poll() is None:
                    _kill()
                    proc.wait(timeout=5)

    def execute(self, method: str, source_config: dict[str, Any]) -> Any:
        """Scalar call (check_connection/discover/...): one result value."""
        for doc in self.stream(method, source_config):
            if doc.get("type") == "result":
                return doc.get("value")
        raise SandboxError(f"plugin returned no result for {method}")


class SandboxedReader(BaseReader):
    """Drop-in ``BaseReader`` whose every call runs in the subprocess jail
    (reference SandboxedReaderWrapper contract,
    sandboxed_plugin_wrapper.py:36-155). Feed it to
    ``plugins.reader_to_dataframe`` like any in-process reader."""

    def __init__(self, plugin_path: str, source_config: dict[str, Any],
                 sandbox_config: dict[str, Any] | None = None):
        super().__init__(source_config)
        cfg = {k: v for k, v in (sandbox_config or {}).items()
               if k != "enabled"}
        self.sandbox = SubprocessSandbox(plugin_path, **cfg)

    def check_connection(self) -> ConnectionTestResult:
        value = self.sandbox.execute("check_connection", self.source_config)
        if isinstance(value, dict):
            return ConnectionTestResult(
                success=bool(value.get("success", False)),
                message=str(value.get("message", "")),
            )
        return ConnectionTestResult(success=True, message=str(value))

    def discover(self) -> DiscoveryResult:
        value = self.sandbox.execute("discover", self.source_config)
        if isinstance(value, dict):
            return DiscoveryResult(
                objects=list(value.get("objects", [])),
                metadata=dict(value.get("metadata", {})),
            )
        return DiscoveryResult()

    def extract(self, state: dict[str, Any] | None = None
                ) -> Iterator[list[dict[str, Any]]]:
        for doc in self.sandbox.stream("extract", self.source_config,
                                       state):
            if doc.get("type") == "batch":
                yield list(doc.get("records", []))
            elif doc.get("type") == "done":
                return


def make_reader(plugin_path: str, source_config: dict[str, Any],
                mode: str = "self_hosted",
                plugin_config: dict[str, Any] | None = None) -> BaseReader:
    """Reader factory with the reference's sandbox gating: in-process by
    default, jailed when config or cloud mode demands it."""
    if should_sandbox_plugin(plugin_path, mode, plugin_config):
        sandbox_cfg = (plugin_config or {}).get("sandbox")
        sandbox_cfg = sandbox_cfg if isinstance(sandbox_cfg, dict) else {}
        return SandboxedReader(plugin_path, source_config, sandbox_cfg)
    from dativo_ingest_spark.plugins import load_reader

    return load_reader(plugin_path)(source_config)
