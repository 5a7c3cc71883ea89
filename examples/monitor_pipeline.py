#!/usr/bin/env python
"""Tour of the pipeline-monitoring stack: the operators a production
ingest runs over ITSELF to catch upstream regressions before they reach
training.

    python examples/monitor_pipeline.py [sf_dir]

Composes, over a real events/orders slice:

1. column profile      operators/profiling.py:profile_table — one
                       aggregate pass: counts/nulls/distincts/ranges
2. FD discovery        profiling.fd_violations — which columns
                       functionally determine which (contract hints)
3. PSI drift           profiling.psi_drift — reference week vs current
                       week value distributions, micro-nat exact
4. CUSUM changepoints  analytics.cusum_changepoints — daily volume
                       level shifts per event type (closed form, no
                       recursion)
5. key-skew report     skew.key_skew_report — the measured numbers that
                       pick broadcast/salting/AQE strategies
6. schema history      sinks/table_commit.py:schema_history — when did
                       a column appear/change type (manifests only)

Each step prints a compact JSON block; invariants are asserted along
the way so the script doubles as a smoke test of the monitoring
surface. At 100 TB every step is one scan + a keys-sized aggregate —
the monitoring cost rides the ingest it watches.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def monitor(spark, sf_dir: str) -> dict:
    from dativo_ingest_spark.operators import analytics, profiling, skew
    from dativo_ingest_spark.queries import load

    report: dict = {}
    events = load(spark, sf_dir, "events")

    # 1. one-pass column profile
    prof = profiling.profile_table(
        events, ["event_id", "user_id", "event_type"])
    report["profile"] = [r.asDict() for r in prof.collect()]
    assert all(p["n_rows"] > 0 for p in report["profile"])

    # 2. functional dependencies over a dimension-shaped slice
    orders = load(spark, sf_dir, "orders")
    fd = profiling.fd_violations(
        orders, [("o_orderkey", "o_orderstatus"),
                 ("o_orderpriority", "o_orderstatus")])
    report["fds"] = [r.asDict() for r in fd.collect()]
    # the primary key determines everything: zero violations
    pk = next(r for r in report["fds"]
              if r["determinant"] == "o_orderkey")
    assert pk["violations"] == 0 and pk["is_fd"]

    # 3. PSI drift: first-week values as the frozen reference vs the
    #    rest of the stream (in production the reference persists;
    #    runner.py target.options.drift_gate does exactly that)
    ev = events.select(
        "ts", F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")
        .alias("cents"))
    lo = ev.agg(F.expr(
        "min(unix_micros(CAST(ts AS TIMESTAMP)))").alias("lo")).first().lo
    week_us = 7 * 86_400_000_000
    ref = ev.filter(F.expr(
        f"unix_micros(CAST(ts AS TIMESTAMP)) < {lo + week_us}"))
    cur = ev.filter(F.expr(
        f"unix_micros(CAST(ts AS TIMESTAMP)) >= {lo + week_us}"))
    drift = profiling.psi_drift(ref.select("cents"), cur.select("cents"),
                                "cents", n_bins=4)
    rows = drift.collect()
    report["psi"] = {"total_milli": int(sum(r.psi_micro for r in rows)
                                        / 1000),
                     "bins": [r.asDict() for r in rows]}

    # 4. CUSUM level-shift detection on daily volumes per type
    cp = analytics.cusum_changepoints(events, "event_type", "ts", "value")
    flagged = cp.filter("flagged").count()
    report["cusum"] = {"series_rows": cp.count(), "flagged": flagged}

    # 5. key-skew report on the join key a fact-dim enrichment would use
    sk = skew.key_skew_report(events, "user_id")
    report["skew"] = sk.first().asDict()

    # 6. schema history of a snapshot table (simulated evolution)
    import shutil
    import tempfile

    from dativo_ingest_spark.sinks.table_commit import FsTable

    root = tempfile.mkdtemp(prefix="sg_mon_")
    try:
        t = FsTable.create(root)
        t.write_append(orders.select("o_orderkey", "o_totalprice"))
        t.write_append(orders.limit(10).select(
            "o_orderkey", "o_totalprice",
            F.lit("web").alias("channel")))
        report["schema_history"] = t.schema_history()
        assert any(e["added"] == ["channel"]
                   for e in report["schema_history"])
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return report


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from dativo_ingest_spark.session import get_spark

    spark = get_spark("monitor-tour")
    try:
        print(json.dumps(monitor(spark, sf_dir), indent=1, default=str))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
