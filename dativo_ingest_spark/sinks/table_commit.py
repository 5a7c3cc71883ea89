"""Filesystem table-commit protocol: Iceberg-style snapshot commits without
an Iceberg runtime.

The reference commits parquet files to Iceberg via PyIceberg ``add_files``
(new snapshot per commit, Nessie branch refs, graceful catalog degradation —
``/root/reference/src/dativo_ingest/iceberg_committer.py:498-693``). No
Iceberg jar ships in this environment, so this module implements the same
transactional contract directly on a filesystem/object-store layout, modeled
on Iceberg's HadoopTableOperations versioning:

  {root}/data/{stage-uuid}/part-*.parquet   immutable data files
  {root}/metadata/v{N}.json                 snapshot manifest (O_EXCL create)
  {root}/metadata/refs/{branch}             branch pointer -> version

Guarantees (the ones that matter at 100 TB, where a commit races with
concurrent writers and any executor can die mid-write):

- **Atomic visibility**: data files are staged under an unreferenced uuid
  dir; they become visible only when a manifest referencing them is
  published. A crash before publish leaves invisible orphans, never a
  partial table.
- **Exactly-one-winner**: the manifest for version N is created with
  ``O_CREAT|O_EXCL`` — the filesystem arbitrates concurrent committers;
  losers get :class:`CommitConflict` and retry on the next version with the
  same staged files (Iceberg's optimistic concurrency).
- **Time travel**: every snapshot is immutable and readable by version.
- **Branches**: named refs (Nessie-branch analog) are one-line pointer
  files updated by atomic rename.

Readers plan from a manifest's explicit file list — a 1000-executor scan
never lists directories (object-store LIST is both slow and eventually
consistent); the driver hands Spark the exact paths.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(Exception):
    """Another writer published this version first; retry against the new
    current version (staged files remain valid)."""


@dataclass
class Snapshot:
    version: int
    operation: str
    files: list[dict[str, Any]]
    parent: int | None = None
    schema_json: str | None = None
    properties: dict[str, str] = field(default_factory=dict)

    def paths(self, root: str) -> list[str]:
        return [os.path.join(root, f["path"]) for f in self.files]


class FsTable:
    """A versioned parquet table rooted at ``root``."""

    def __init__(self, root: str):
        self.root = root
        self._meta = os.path.join(root, "metadata")
        self._refs = os.path.join(self._meta, "refs")

    # -- metadata primitives ------------------------------------------------

    @classmethod
    def create(cls, root: str, properties: dict[str, str] | None = None) -> "FsTable":
        t = cls(root)
        os.makedirs(t._refs, exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        if t.current_version("main") is None:
            t._publish(
                Snapshot(version=0, operation="create", files=[],
                         properties=dict(properties or {})),
            )
            t._set_ref("main", 0)
        return t

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._meta, f"v{version}.json")

    def current_version(self, branch: str = "main") -> int | None:
        try:
            with open(os.path.join(self._refs, branch)) as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return None

    def _next_version(self) -> int:
        versions = [
            int(n[1:-5])
            for n in os.listdir(self._meta)
            if n.startswith("v") and n.endswith(".json")
        ]
        return (max(versions) + 1) if versions else 0

    def snapshot(self, version: int) -> Snapshot:
        with open(self._manifest_path(version)) as fh:
            d = json.load(fh)
        return Snapshot(
            version=d["version"], operation=d["operation"], files=d["files"],
            parent=d.get("parent"), schema_json=d.get("schema_json"),
            properties=d.get("properties", {}),
        )

    def _publish(self, snap: Snapshot) -> None:
        """Exactly-one-winner manifest creation for ``snap.version``."""
        payload = json.dumps(
            {
                "version": snap.version, "parent": snap.parent,
                "operation": snap.operation, "files": snap.files,
                "schema_json": snap.schema_json, "properties": snap.properties,
            },
            indent=1,
        )
        path = self._manifest_path(snap.version)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
        except FileExistsError:
            raise CommitConflict(
                f"version {snap.version} already published"
            ) from None
        with os.fdopen(fd, "w") as fh:
            fh.write(payload)

    def _set_ref(self, branch: str, version: int) -> None:
        tmp = os.path.join(self._refs, f".{branch}.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.rename(tmp, os.path.join(self._refs, branch))  # atomic on POSIX

    def create_branch(self, name: str, at_version: int | None = None) -> None:
        v = self.current_version("main") if at_version is None else at_version
        assert v is not None, "branch from an uncreated table"
        self._set_ref(name, v)

    # -- commits ------------------------------------------------------------

    def add_files(
        self,
        staged: list[dict[str, Any]],
        operation: str = "append",
        branch: str = "main",
        schema_json: str | None = None,
        properties: dict[str, str] | None = None,
        max_retries: int = 5,
    ) -> Snapshot:
        """Commit staged files (dicts with ``path`` relative to root, plus
        any stats) as a new snapshot on ``branch``.

        ``append`` keeps the parent's file list; ``overwrite`` replaces it.
        Retries :class:`CommitConflict` by re-reading the branch head —
        staged files never change, only the base snapshot does.
        """
        for _ in range(max_retries):
            base_v = self.current_version(branch)
            assert base_v is not None, f"unknown branch {branch!r}"
            base = self.snapshot(base_v)
            files = staged if operation == "overwrite" else base.files + staged
            # version numbers are a single global sequence across branches
            # (lineage lives in the parent pointer, Nessie-style): claim the
            # next unpublished number, which may be > branch head + 1.
            snap = Snapshot(
                version=self._next_version(), parent=base_v,
                operation=operation, files=files,
                schema_json=schema_json or base.schema_json,
                properties={**base.properties, **(properties or {})},
            )
            try:
                self._publish(snap)
            except CommitConflict:
                continue
            self._set_ref(branch, snap.version)
            return snap
        raise CommitConflict(
            f"gave up after {max_retries} retries on branch {branch!r}"
        )

    def write_append(
        self,
        df: DataFrame,
        branch: str = "main",
        properties: dict[str, str] | None = None,
    ) -> Snapshot:
        """Stage ``df`` as parquet under an unreferenced uuid dir, then
        commit the written files. Crash between write and commit leaves
        invisible orphans only."""
        stage = f"data/{uuid.uuid4().hex}"
        out = os.path.join(self.root, stage)
        df.write.option("compression", "snappy").parquet(out)
        staged = [
            {"path": f"{stage}/{name}", "size_bytes": os.path.getsize(os.path.join(out, name))}
            for name in sorted(os.listdir(out))
            if name.endswith(".parquet")
        ]
        return self.add_files(
            staged, operation="append", branch=branch,
            schema_json=df.schema.json(), properties=properties,
        )

    # -- reads --------------------------------------------------------------

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        branch: str = "main",
    ) -> DataFrame:
        """Scan a snapshot (branch head by default) from its explicit file
        list — no directory listing anywhere in the plan."""
        v = self.current_version(branch) if version is None else version
        assert v is not None, f"unknown branch {branch!r}"
        snap = self.snapshot(v)
        paths = snap.paths(self.root)
        if not paths:
            from pyspark.sql.types import StructType

            schema = (
                StructType.fromJson(json.loads(snap.schema_json))
                if snap.schema_json
                else StructType([])
            )
            return spark.createDataFrame([], schema)
        return spark.read.parquet(*paths)
