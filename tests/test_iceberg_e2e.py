"""Real-Iceberg end-to-end drive for sinks/iceberg_sink.py.

This environment ships no Iceberg runtime jar, so these tests are
SKIP-MARKED by default; they exist so that the FsTable <-> Iceberg swap —
the one load-bearing path otherwise proven only by recorder tests
(test_runner.py mocked-catalog selection) — gets a real
create/append/MERGE/branch/snapshot-property drive the moment a jar is
available.

To run: point ``DATIVO_ICEBERG_JAR`` at an
``iceberg-spark-runtime-3.5_2.13-*.jar`` (or any runtime jar matching the
installed Spark/Scala) and invoke this module in a FRESH interpreter so
the jar can load into the new JVM::

    DATIVO_ICEBERG_JAR=/path/to/iceberg-spark-runtime.jar \
        python -m pytest tests/test_iceberg_e2e.py -q

The drive covers exactly what the runner's ``commit: iceberg`` path uses
(sinks/iceberg_sink.py): first-write create, append, MERGE INTO upsert,
branch bootstrap + branch write, TBLPROPERTIES push, and the
snapshot-summary watermark read (``get_snapshot_property``) that the
streaming exactly-once sink depends on.
"""

from __future__ import annotations

import os

import pytest

_JAR = os.environ.get("DATIVO_ICEBERG_JAR", "")

pytestmark = pytest.mark.skipif(
    not (_JAR and os.path.exists(_JAR)),
    reason="no Iceberg runtime jar: set DATIVO_ICEBERG_JAR to run the "
           "real-Iceberg e2e drive (see module docstring)",
)


@pytest.fixture(scope="module")
def iceberg_spark(tmp_path_factory):
    from pyspark.sql import SparkSession

    if SparkSession.getActiveSession() is not None:
        pytest.skip(
            "an active SparkSession exists without the Iceberg jar on its "
            "classpath — run this module in a fresh interpreter "
            "(python -m pytest tests/test_iceberg_e2e.py)")
    warehouse = str(tmp_path_factory.mktemp("iceberg_wh"))
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("iceberg-e2e")
        .config("spark.jars", _JAR)
        .config("spark.sql.extensions",
                "org.apache.iceberg.spark.extensions."
                "IcebergSparkSessionExtensions")
        .config("spark.sql.catalog.local",
                "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.local.type", "hadoop")
        .config("spark.sql.catalog.local.warehouse", warehouse)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def test_create_append_merge_branch_roundtrip(iceberg_spark):
    spark = iceberg_spark
    from dativo_ingest_spark.sinks import iceberg_sink

    ident = "local.db.people"
    b1 = spark.createDataFrame(
        [(1, "alice"), (2, "bob")], "id long, name string")

    # first write creates the table through the catalog
    status = iceberg_sink.commit(spark, b1, ident, mode="append",
                                 properties={"classification": "internal"})
    assert status["mode"] == "append"
    assert spark.table(ident).count() == 2
    assert iceberg_sink.get_property(
        spark, ident, "classification") == "internal"

    # append accumulates
    iceberg_sink.commit(
        spark, spark.createDataFrame([(3, "carol")], "id long, name string"),
        ident, mode="append")
    assert spark.table(ident).count() == 3

    # MERGE INTO upserts (the idempotent >= cursor re-read direction)
    iceberg_sink.commit(
        spark,
        spark.createDataFrame(
            [(3, "carol-v2"), (4, "dave")], "id long, name string"),
        ident, mode="merge", merge_keys=["id"])
    got = {r.id: r.name for r in spark.table(ident).collect()}
    assert got == {1: "alice", 2: "bob", 3: "carol-v2", 4: "dave"}

    # branch bootstrap + branch-isolated write
    iceberg_sink.commit(
        spark,
        spark.createDataFrame([(9, "tenant-only")], "id long, name string"),
        ident, mode="append", branch="acme")
    assert spark.table(ident).count() == 4              # main untouched
    assert spark.read.option("BRANCH", "acme").table(ident).count() == 5


def test_snapshot_property_watermark(iceberg_spark):
    spark = iceberg_spark
    from dativo_ingest_spark.sinks import iceberg_sink

    ident = "local.db.epochs"
    df = spark.createDataFrame([(1, "x")], "id long, v string")
    iceberg_sink.commit(
        spark, df, ident, mode="append",
        snapshot_properties={"dativo.epoch.q1": "7"})
    # the watermark rides INSIDE the snapshot summary (atomic with data)
    assert iceberg_sink.get_snapshot_property(
        spark, ident, "dativo.epoch.q1") == "7"
    # an unrelated later commit must not hide it
    iceberg_sink.commit(spark, df, ident, mode="append")
    assert iceberg_sink.get_snapshot_property(
        spark, ident, "dativo.epoch.q1") == "7"
    # merge refuses snapshot properties instead of dropping atomicity
    from dativo_ingest_spark.config.contracts import ConfigError

    with pytest.raises(ConfigError):
        iceberg_sink.commit(spark, df, ident, mode="merge",
                            merge_keys=["id"],
                            snapshot_properties={"dativo.epoch.q1": "8"})
