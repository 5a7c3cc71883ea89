"""Local replica of the driver's correctness gate.

For every registered query: run the Spark plan and the DuckDB oracle SQL on
the same parquet tables, then compare row count + column names + the exact
multiset of values (columns sorted by name, floats compared bit-exact —
the same discipline as the driver's order-insensitive value hash).
"""

from __future__ import annotations

import datetime as _dt
import math
from collections import Counter

import duckdb
import pytest

from dativo_ingest_spark.queries import QUERIES, TABLES
from tests.conftest import SF_DIR


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _norm(v):
    """Normalize a cell to a hashable, engine-neutral value."""
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _spark_rows(df):
    cols = sorted(df.columns)
    data = df.select(*cols).collect()
    return cols, Counter(tuple(_norm(r[c]) for c in cols) for r in data)


def _duck_rows(con, sql):
    res = con.execute(sql)
    names = [d[0] for d in res.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    data = res.fetchall()
    return cols, Counter(tuple(_norm(row[i]) for i in order) for row in data)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_parity(spark, name):
    q = QUERIES[name]
    sdf = q.fn(spark, SF_DIR)
    s_cols, s_rows = _spark_rows(sdf)
    if q.oracle is None:
        assert sum(s_rows.values()) >= 0  # rows-only check (driver's weak path)
        return
    d_cols, d_rows = _duck_rows(_duck(), q.oracle)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert sum(s_rows.values()) == sum(d_rows.values()), (
        f"{name}: row count {sum(s_rows.values())} vs {sum(d_rows.values())}"
    )
    if s_rows != d_rows:
        only_s = list((s_rows - d_rows).items())[:5]
        only_d = list((d_rows - s_rows).items())[:5]
        pytest.fail(
            f"{name}: value mismatch\n  spark-only: {only_s}\n  duck-only:  {only_d}"
        )


# DuckDB result types the external driver's value hash cannot round-trip.
# HUGEINT (int128) is the repeat offender: DuckDB silently widens
# sum(BIGINT) -> HUGEINT (also via UNION ALL type unification), the local
# Python-int comparison above still passes, but the driver's hash path
# widens HUGEINT to float64 and renders `86753.0` vs `86753` — this exact
# class shipped red in r7 (gapfill_locf_event_value) and r8
# (random_projection_embeddings). The lint runs DuckDB's *planner* only
# (relation .types, no execution), so it is cheap enough to cover every
# registered oracle each CI run. Fix on trip: CAST(... AS BIGINT) in the
# oracle — and in EVERY branch of a UNION ALL, since type unification
# takes the widest branch.
_FORBIDDEN_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "UBIGINT")


@pytest.mark.parametrize(
    "name", sorted(n for n, q in QUERIES.items() if q.oracle is not None)
)
def test_oracle_result_types_driver_safe(name):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    rel = con.sql(QUERIES[name].oracle)
    offenders = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if any(f in str(t).upper() for f in _FORBIDDEN_DUCK_TYPES)
    ]
    assert not offenders, (
        f"{name}: oracle result schema contains driver-unsafe DuckDB "
        f"types {offenders} — the driver hash widens these to float64 "
        f"and mismatches Spark's exact integers. CAST the offending "
        f"expression (and every UNION ALL branch) to BIGINT."
    )
