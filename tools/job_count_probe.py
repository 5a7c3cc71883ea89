"""Job-count probe: how many Spark jobs one bench-style execution of a
query costs (build + noop sink), plus wall seconds. Job count is the
scale-proxy the r14/r15 logs optimize for (every job is at least one
cluster-wide pass/barrier at 100 TB); the counter is the DAGScheduler's
own nextJobId, so it sees every action including eager probes and
broadcast jobs. Usage:

    python tools/job_count_probe.py name1 [name2 ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dativo_ingest_spark import get_spark  # noqa: E402
from dativo_ingest_spark.queries import QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "r15-jobcount", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false",
                    "spark.driver.memory": "16g"})
    spark.sparkContext.setLogLevel("ERROR")

    def njobs() -> int:
        # py4j auto-unwraps the AtomicInteger via its int conversion on
        # some versions; handle both shapes
        v = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
        return v if isinstance(v, int) else v.get()

    out = {}
    for name in names:
        # warm once at sf0.001 so JIT/codegen noise doesn't ride the count
        try:
            QUERIES[name].fn(spark, "/root/testdata/sf0.001").write.format(
                "noop").mode("overwrite").save()
        except Exception as ex:  # noqa: BLE001
            print(f"WARM-FAIL {name}: {ex}", flush=True)
        spark.catalog.clearCache()
        j0, t0 = njobs(), time.perf_counter()
        df = QUERIES[name].fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        out[name] = {"jobs": njobs() - j0, "s": dt}
        print(f"JOBS {name}: {out[name]['jobs']} jobs, {dt}s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
