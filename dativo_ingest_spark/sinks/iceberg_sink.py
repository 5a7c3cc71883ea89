"""Real-Iceberg commit path for jar-present deployments.

The reference commits through PyIceberg against a Nessie/REST catalog with
branch-per-tenant bootstrap (reference:
src/dativo_ingest/iceberg_committer.py:307-496 catalog/branch setup,
498-693 add_files commit). This environment ships no Iceberg runtime, so
the *default* table sink is ``FsTable`` (sinks/table_commit.py), which
reimplements the snapshot contract on the filesystem. This module is the
documented swap-in for a real lakehouse: when the job selects
``target.options.commit: iceberg`` AND the named catalog is registered in
the Spark conf (``spark.sql.catalog.<name> = org.apache.iceberg...``),
writes go through the native ``DataFrameWriterV2`` —
``df.writeTo(ident).append()`` — so Iceberg's own optimistic snapshot
commit provides the atomicity FsTable otherwise supplies.

Branch semantics ride Iceberg's branch identifiers
(``catalog.db.table.branch_<name>``); properties land as TBLPROPERTIES.
Everything here is driver-side plan wiring — the data movement is the
same distributed parquet write either way.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from dativo_ingest_spark.config.contracts import ConfigError


def catalog_configured(spark: SparkSession, catalog: str) -> bool:
    """True when ``spark.sql.catalog.<catalog>`` is set — the way an
    Iceberg (or any V2) catalog is registered with Spark."""
    try:
        return bool(spark.conf.get(f"spark.sql.catalog.{catalog}"))
    except Exception:
        return False


def require_available(spark: SparkSession, table_ident: str | None) -> str:
    """Config-time gate: a real-Iceberg job must name a
    ``catalog.db.table`` whose catalog is registered. Raises ConfigError
    (exit 2, before any data is touched) otherwise; returns the catalog
    name."""
    if not table_ident or len(table_ident.split(".")) < 3:
        raise ConfigError(
            "target.options.commit=iceberg needs target.table as "
            "'catalog.db.table'")
    catalog = table_ident.split(".")[0]
    if not catalog_configured(spark, catalog):
        raise ConfigError(
            f"commit=iceberg but no catalog registered: set "
            f"spark.sql.catalog.{catalog} (+ .type/.uri) to an Iceberg "
            f"catalog impl, or use the default FsTable sink "
            f"(target.options.commit=table)")
    return catalog


def branch_ident(table_ident: str, branch: str | None) -> str:
    """Iceberg branch addressing: ``db.tbl.branch_<name>`` (main is the
    bare identifier) — the branch-per-tenant analog of the reference's
    Nessie refs (iceberg_committer.py:307-401)."""
    if branch in (None, "main"):
        return table_ident
    return f"{table_ident}.branch_{branch}"


def ensure_branch(spark: SparkSession, table_ident: str,
                  branch: str | None) -> None:
    """``CREATE BRANCH IF NOT EXISTS`` at the current head — no-op for
    main or when the table doesn't exist yet (created by first write)."""
    if branch in (None, "main"):
        return
    try:
        spark.sql(f"ALTER TABLE {table_ident} "
                  f"CREATE BRANCH IF NOT EXISTS `{branch}`")
    except Exception:
        # table not created yet: the first write creates it and the branch
        # bootstrap re-runs on the next job (reference bootstraps lazily
        # too, iceberg_committer.py:307-345)
        pass


def set_properties(spark: SparkSession, table_ident: str,
                   properties: dict[str, str] | None) -> None:
    """TBLPROPERTIES push (reference writes the same governance dict into
    Iceberg table properties). Best-effort like the catalog push."""
    if not properties:
        return
    kv = ", ".join(
        f"'{k}' = '{str(v).replace(chr(39), chr(39) * 2)}'"
        for k, v in sorted(properties.items())
    )
    spark.sql(f"ALTER TABLE {table_ident} SET TBLPROPERTIES ({kv})")


def get_property(spark: SparkSession, table_ident: str,
                 key: str) -> str | None:
    """Read one TBLPROPERTIES value (None when absent / table missing)."""
    try:
        rows = spark.sql(f"SHOW TBLPROPERTIES {table_ident}").collect()
    except Exception:
        return None
    for r in rows:
        if r[0] == key:
            return str(r[1])
    return None


def get_snapshot_property(spark: SparkSession, table_ident: str,
                          key: str) -> str | None:
    """Latest snapshot-summary value for ``key`` across the table's
    snapshot history (None when absent / table missing) — the streaming
    epoch-dedup watermark lives here, NOT in TBLPROPERTIES: a summary
    property is written atomically inside the data commit, so there is no
    crash window between "data visible" and "epoch recorded". Scanning
    history (not just the head) keeps the watermark readable when an
    unrelated commit — compaction, another query's epoch — lands after
    ours; the key is query-scoped so the newest occurrence is ours."""
    safe = key.replace("'", "''")
    try:
        rows = spark.sql(
            f"SELECT summary['{safe}'] FROM {table_ident}.snapshots "
            f"WHERE summary['{safe}'] IS NOT NULL "
            f"ORDER BY committed_at DESC LIMIT 1").collect()
    except Exception:
        return None
    return str(rows[0][0]) if rows else None


def commit(
    spark: SparkSession,
    df: DataFrame,
    table_ident: str,
    mode: str = "append",
    branch: str | None = None,
    partition_by: list[str] | None = None,
    properties: dict[str, str] | None = None,
    merge_keys: list[str] | None = None,
    snapshot_properties: dict[str, str] | None = None,
) -> dict[str, Any]:
    """One atomic Iceberg commit via DataFrameWriterV2 / MERGE INTO.

    ``append``  -> ``writeTo().append()`` (``create()`` on first write),
    ``overwrite``-> ``createOrReplace()``,
    ``merge``   -> ``MERGE INTO`` keyed on ``merge_keys`` (the idempotent
    upsert for >= cursor re-reads, same semantics as
    ``FsTable.merge_upsert``).

    ``snapshot_properties`` ride INSIDE the snapshot commit via Iceberg's
    ``snapshot-property.<key>`` write option — atomic with the data, unlike
    ``properties`` (TBLPROPERTIES, a separate transaction after the write).
    Exactly-once markers (the streaming epoch watermark) must use
    snapshot_properties; governance metadata belongs in ``properties``.
    Only the writeTo paths accept them (Spark SQL MERGE has no
    per-statement snapshot-property hook), so ``merge`` raises rather than
    silently downgrading atomicity.

    Returns a small status dict for the job result/logs."""
    require_available(spark, table_ident)
    ensure_branch(spark, table_ident, branch)
    ident = branch_ident(table_ident, branch)

    if mode == "merge":
        if snapshot_properties:
            raise ConfigError(
                "snapshot_properties require the writeTo path "
                "(mode=append/overwrite); MERGE INTO cannot attach them "
                "atomically")
        if not merge_keys:
            raise ConfigError("target.options.mode=merge needs merge_keys")
        view = "dativo_merge_src"
        df.createOrReplaceTempView(view)
        on = " AND ".join(f"t.`{k}` = s.`{k}`" for k in merge_keys)
        spark.sql(
            f"MERGE INTO {ident} t USING {view} s ON {on} "
            f"WHEN MATCHED THEN UPDATE SET * "
            f"WHEN NOT MATCHED THEN INSERT *")
    else:
        writer = df.writeTo(ident).using("iceberg")
        for key, value in (snapshot_properties or {}).items():
            writer = writer.option(f"snapshot-property.{key}", str(value))
        for col in partition_by or []:
            writer = writer.partitionedBy(df[col])
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            try:
                writer.append()
            except Exception as exc:
                # first write creates the table (reference creates through
                # the catalog on first commit, iceberg_committer.py:403-455)
                if "TABLE_OR_VIEW_NOT_FOUND" in str(exc) or \
                        "NoSuchTableException" in type(exc).__name__:
                    writer.create()
                else:
                    raise
    set_properties(spark, table_ident, properties)
    return {"table": table_ident, "branch": branch or "main", "mode": mode}
