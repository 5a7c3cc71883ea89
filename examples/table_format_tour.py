#!/usr/bin/env python
"""Tour of the snapshot table format: every transactional capability of
``sinks/table_commit.py`` in one runnable script.

    python examples/table_format_tour.py [sf_dir] [out_dir]

Walks the full Iceberg-class surface on a real orders slice:

1.  append            atomic snapshot commit (invisible until published)
2.  time travel       read any committed version by number
3.  MERGE             copy-on-write upsert; file pruning via manifest stats
4.  change feed       row-level CDC between versions (changes())
5.  CDC rollup        maintain a materialized aggregate from the feed alone
6.  DELETE            row-level erasure; only files containing a match
                      rewrite
7.  schema evolution  append a batch with a new column; old files project
                      NULL, time travel keeps the old shape
8.  WAP               write-audit-publish: a failing batch never reaches
                      main
9.  branches          the audit branch holds the quarantined evidence
10. compact + vacuum  bin-pack the small-file tail, expire history
11. metadata tables   snapshots_df / files_df without touching data files

Each step prints what changed; the script asserts the invariants as it
goes, so it doubles as a smoke test of the whole surface.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def tour(spark, sf_dir: str, out_root: str) -> None:
    from dativo_ingest_spark.operators import rollup
    from dativo_ingest_spark.queries import load
    from dativo_ingest_spark.sinks.table_commit import FsTable

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
        .alias("cents"))

    # 1. append — atomic snapshot commit
    t = FsTable.create(out_root)
    base = orders.filter(F.col("o_orderkey") % 7 <= 4)
    t.write_append(base, stats_columns=["o_orderkey"])
    v1 = t.current_version()
    n1 = t.read(spark).count()
    print(f"1. appended base slice: version {v1}, {n1} rows")

    # 2+3. MERGE (upsert) then time travel back
    upd = (orders.filter((F.col("o_orderkey") % 7).isin(4, 5))
           .withColumn("cents", F.col("cents") + F.lit(100)))
    t.merge_upsert(spark, upd, keys=["o_orderkey"],
                   stats_columns=["o_orderkey"])
    v2 = t.current_version()
    assert t.read(spark, version=v1).count() == n1     # history immutable
    print(f"2. MERGE -> version {v2}; time travel to v{v1} still {n1} rows")

    # 4. change feed — only files the MERGE touched are scanned
    ch = t.changes(spark, v1, v2).cache()
    n_ins = ch.filter("_change_type = 'insert'").count()
    n_del = ch.filter("_change_type = 'delete'").count()
    print(f"3. change feed v{v1}->v{v2}: {n_ins} inserts, {n_del} delete "
          "preimages (updates = delete+insert pairs)")

    # 5. CDC-driven rollup maintenance — no history rescan
    measures = {"n": ("count", "cents"), "total": ("sum", "cents")}
    state = rollup.partial_state(base, ["o_orderpriority"], measures)
    state = rollup.maintain_rollup_from_changes(
        state, ch, ["o_orderpriority"], measures)
    maintained = {r.o_orderpriority: (r.n, r.total) for r in
                  rollup.finalize(state, ["o_orderpriority"],
                                  measures).collect()}
    truth = {r.o_orderpriority: (r.n, r.total) for r in
             t.read(spark).groupBy("o_orderpriority").agg(
                 F.count(F.lit(1)).alias("n"),
                 F.sum("cents").alias("total")).collect()}
    assert maintained == truth
    ch.unpersist()
    print("4. CDC-maintained rollup equals a full recompute "
          f"({len(truth)} groups)")

    # 6. row-level DELETE — erasure in one atomic snapshot
    before = t.read(spark).count()
    t.delete_where(spark, "o_orderkey % 11 = 0",
                   prune=[("o_orderkey", ">=", 0)])
    after = t.read(spark).count()
    print(f"5. DELETE o_orderkey%11=0: {before} -> {after} rows")

    # 7. schema evolution — new column, old files untouched
    t.write_append(
        orders.filter(F.col("o_orderkey") % 7 == 6)
        .withColumn("audit_tag", F.lit("late-batch")),
        stats_columns=["o_orderkey"])
    head = t.read(spark)
    assert "audit_tag" in head.columns
    n_null = head.filter(F.col("audit_tag").isNull()).count()
    assert t.read(spark, version=v1).columns == \
        ["o_orderkey", "o_orderpriority", "cents"]
    print(f"6. schema evolved: audit_tag NULL for {n_null} pre-existing "
          "rows; time travel keeps the old shape")

    # 8+9. WAP — a failing batch never reaches main
    exps = [{"name": "cents_nonneg", "type": "range",
             "column": "cents", "min": 0}]
    bad = base.limit(50).withColumn("cents", -F.col("cents"))
    v_before = t.current_version()
    ok, results, audit_ref = t.write_audit_publish(spark, bad, exps)
    assert not ok and t.current_version() == v_before
    print(f"7. WAP rejected the bad batch ({[r.name for r in results if not r.passed]}); "
          f"main untouched, evidence on branch {audit_ref!r}")

    # 10. compact + vacuum — maintenance, content unchanged
    total_before = t.read(spark).agg(F.sum("cents")).first()[0]
    t.compact(spark, target_file_size_mb=128)
    t.vacuum(keep_history=2, min_age_seconds=0.0)
    assert t.read(spark).agg(F.sum("cents")).first()[0] == total_before
    print("8. compact+vacuum: content bit-identical, history trimmed")

    # 11. metadata tables
    snaps = t.snapshots_df(spark)
    files = t.files_df(spark)
    print(f"9. metadata: {snaps.count()} live snapshots, "
          f"{files.count()} data files")


def main() -> None:
    from dativo_ingest_spark import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="table_tour_")
    spark = get_spark("table-format-tour")
    try:
        tour(spark, sf_dir, out)
        print("tour complete:", out)
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
