"""Targeted oracle-parity check: driver_sim's compare loop over an
explicit query-name list (window membership not required — any
registered query with oracle SQL qualifies). Usage:

    python tools/parity_check.py name1 name2 ...

Prints PASS/FAIL per query and one JSON summary line; exit 1 on any
mismatch. Normalization mirrors tools/driver_sim.py exactly."""
import datetime as _dt, json, math, os, sys, time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb
from pyspark.sql import SparkSession

SF = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _norm(v):
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: parity_check.py <query> [...]", file=sys.stderr)
        sys.exit(2)
    spark = (SparkSession.builder.master("local[8]")
             .appName("parity-check").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e
    qs, osql = e.queries(), e.oracle_sql()
    bad = []
    for name in names:
        t0 = time.time()
        try:
            if name not in qs or name not in osql:
                raise KeyError(f"{name}: not a registered oracle query")
            sdf = qs[name](spark, SF)
            cols = sorted(sdf.columns)
            srows = Counter(tuple(_norm(r[c]) for c in cols)
                            for r in sdf.select(*cols).collect())
            con = duckdb.connect()
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
            res = con.execute(osql[name])
            dn = [d[0] for d in res.description]
            order = sorted(range(len(dn)), key=lambda i: dn[i])
            dcols = [dn[i] for i in order]
            drows = Counter(tuple(_norm(row[i]) for i in order)
                            for row in res.fetchall())
            ok = (srows == drows) and (cols == dcols)
            print(("PASS " if ok else "FAIL ") + name,
                  {"spark_rows": sum(srows.values()),
                   "oracle_rows": sum(drows.values()),
                   "hash_match": srows == drows, "schema_match": cols == dcols,
                   "s": round(time.time() - t0, 1)}, flush=True)
            if not ok:
                bad.append(name)
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name} err={type(ex).__name__}: {ex}"[:300],
                  flush=True)
            bad.append(name)
    print(json.dumps({"n": len(names), "bad": bad}))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
