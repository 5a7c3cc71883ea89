"""Python plugin SDK: custom readers/writers on Spark primitives.

Reference surface (``/root/reference/src/dativo_ingest/plugins.py:87-362``;
dynamic class loading ``:616-723``): ``BaseReader`` with
``extract() -> Iterator[List[dict]]`` + ``check_connection`` / ``discover``
/ ``get_total_records_estimate``; ``BaseWriter.write_batch``; plugin specs
``"module.py:ClassName"``. The Rust-FFI bridge and Docker sandboxing are
intentionally out of scope — Spark's vectorized scans remove the Rust
plugin's performance rationale (SURVEY §2.1) and cluster isolation replaces
the sandbox.

Two execution shapes:

* :func:`reader_to_dataframe` — driver-side drain of a single-stream
  reader into one DataFrame (batch-accurate parity with the reference's
  generator loop). Fine for API-ish sources whose throughput is bounded by
  the remote end anyway.
* :func:`partitioned_read` — the scale path: a *task list* (from
  ``discover()`` or caller-supplied) is parallelized across the cluster and
  each executor instantiates the reader for its task inside
  ``mapInPandas``. This is how a custom reader rides 1000 executors
  without a native DataSource implementation.
"""

from __future__ import annotations

import importlib.util
import os
import sys
from abc import ABC, abstractmethod
from collections.abc import Iterator
from dataclasses import dataclass, field as dc_field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from dativo_ingest_spark.operators.util import local_df

PLUGIN_SDK_VERSION = "1.0.0"


@dataclass
class ConnectionTestResult:
    success: bool
    message: str = ""
    error_code: str | None = None
    details: dict[str, Any] = dc_field(default_factory=dict)


@dataclass
class DiscoveryResult:
    objects: list[dict[str, Any]] = dc_field(default_factory=list)
    metadata: dict[str, Any] = dc_field(default_factory=dict)


class BaseReader(ABC):
    """Custom source: yield record batches (list of dicts)."""

    __version__ = PLUGIN_SDK_VERSION

    def __init__(self, source_config: dict[str, Any]):
        self.source_config = source_config

    def check_connection(self) -> ConnectionTestResult:
        return ConnectionTestResult(
            success=True, message="Connection test not implemented")

    def discover(self) -> DiscoveryResult:
        return DiscoveryResult()

    @abstractmethod
    def extract(self, state: dict[str, Any] | None = None
                ) -> Iterator[list[dict[str, Any]]]:
        ...

    def get_total_records_estimate(self) -> int | None:
        return None


class BaseWriter(ABC):
    """Custom sink: consume record batches, return file metadata dicts."""

    __version__ = PLUGIN_SDK_VERSION

    def __init__(self, target_config: dict[str, Any]):
        self.target_config = target_config

    @abstractmethod
    def write_batch(self, records: list[dict[str, Any]],
                    counter: int) -> list[dict[str, Any]]:
        ...

    def commit_files(self, files: list[dict[str, Any]]) -> None:
        return None


class PluginError(RuntimeError):
    pass


def load_plugin_class(spec: str, base: type) -> type:
    """Load ``/path/to/module.py:ClassName`` and verify it subclasses
    ``base`` (reference ``plugins.py:394-464`` semantics: explicit path, no
    package machinery, subclass enforced)."""
    if ":" not in spec:
        raise PluginError(f"plugin spec must be 'file.py:ClassName': {spec}")
    path, _, cls_name = spec.rpartition(":")
    if not os.path.exists(path):
        raise PluginError(f"plugin module not found: {path}")
    mod_name = f"_dativo_plugin_{os.path.basename(path).removesuffix('.py')}"
    spec_obj = importlib.util.spec_from_file_location(mod_name, path)
    module = importlib.util.module_from_spec(spec_obj)
    sys.modules[mod_name] = module
    spec_obj.loader.exec_module(module)
    cls = getattr(module, cls_name, None)
    if cls is None:
        raise PluginError(f"class {cls_name} not found in {path}")
    if not issubclass(cls, base):
        raise PluginError(f"{cls_name} must subclass {base.__name__}")
    return cls


def load_reader(spec: str) -> type[BaseReader]:
    return load_plugin_class(spec, BaseReader)


def load_writer(spec: str) -> type[BaseWriter]:
    return load_plugin_class(spec, BaseWriter)


def reader_to_dataframe(
    spark: SparkSession,
    reader: BaseReader,
    schema: T.StructType | str,
    state: dict[str, Any] | None = None,
) -> DataFrame:
    """Drain a reader's generator on the driver into one DataFrame.

    Batches become a single ``createDataFrame`` (schema declared, not
    inferred). Parity shape for single-stream readers; use
    :func:`partitioned_read` when the source can shard.
    """
    rows: list[dict[str, Any]] = []
    for batch in reader.extract(state):
        rows.extend(batch)
    return local_df(spark, rows, schema)


def partitioned_read(
    spark: SparkSession,
    plugin_path: str,
    class_name: str,
    tasks: list[dict[str, Any]],
    schema: T.StructType,
    source_config: dict[str, Any] | None = None,
) -> DataFrame:
    """Distribute a plugin reader: one reader instance per task, executed
    executor-side via ``mapInPandas`` over a parallelized task table.

    Each task dict is merged into the reader's ``source_config`` (e.g.
    ``{"shard": 3}`` or ``{"stream": "orders"}``). The plugin module is
    re-loaded inside each executor from ``plugin_path`` — ship it with
    ``spark.sparkContext.addPyFile`` on a real cluster.
    """
    import json

    base_config = dict(source_config or {})
    cols = [f.name for f in schema.fields]

    task_df = local_df(
        spark, [(json.dumps(t),) for t in tasks], "task_json string"
    ).repartition(max(len(tasks), 1))

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd
        cls = load_plugin_class(f"{plugin_path}:{class_name}", BaseReader)
        for pdf in batches:
            for tj in pdf["task_json"]:
                cfg = {**base_config, **json.loads(tj)}
                reader = cls(cfg)
                for batch in reader.extract(None):
                    yield pd.DataFrame(
                        [[r.get(c) for c in cols] for r in batch],
                        columns=cols,
                    )

    import pandas as pd  # noqa: F401  (executor import checked at driver too)
    return task_df.mapInPandas(run, schema)


def writer_sink(
    df: DataFrame,
    plugin_path: str,
    class_name: str,
    target_config: dict[str, Any] | None = None,
    batch_size: int = 10_000,
) -> list[dict[str, Any]]:
    """Feed a DataFrame through a plugin writer, partition-parallel:
    each partition instantiates the writer executor-side and streams
    ``write_batch`` calls; per-partition file metadata is collected back.
    """
    cfg = dict(target_config or {})
    cols = df.columns

    def run_partition(idx: int, rows: Iterator) -> Iterator[tuple[str]]:
        import json
        cls = load_plugin_class(f"{plugin_path}:{class_name}", BaseWriter)
        writer = cls(cfg)
        metas: list[dict[str, Any]] = []
        batch: list[dict[str, Any]] = []
        counter = idx * 1_000_000  # partition-disjoint file counters
        for row in rows:
            batch.append(dict(zip(cols, row)))
            if len(batch) >= batch_size:
                metas.extend(writer.write_batch(batch, counter) or [])
                counter += 1
                batch = []
        if batch:
            metas.extend(writer.write_batch(batch, counter) or [])
        yield (json.dumps(metas),)

    import json
    collected = (
        df.rdd.mapPartitionsWithIndex(run_partition).collect()
    )
    files: list[dict[str, Any]] = []
    for (metas_json,) in collected:
        files.extend(json.loads(metas_json))
    return files
