"""Time a SUBSET of registry queries with bench.py's exact methodology
(table-count + curated warm-up, then median of 3 back-to-back noop-sink
runs per query, build/exec split) — the same-window before/after
instrument for optimization rounds. Never writes the bench artifact.

Usage: python scripts/mini_bench.py <query> [query ...]
Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_RUNS
"""
from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CURATED_WARMUP  # noqa: E402
from comix_etl_spark.plans.queries import QUERIES  # noqa: E402
from comix_etl_spark.session import get_spark, load_tables  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    spark = get_spark("comix_mini_bench")
    spark.sparkContext.setLogLevel("ERROR")
    for df in load_tables(spark, sf_dir).values():
        df.count()
    for warm in CURATED_WARMUP:
        if warm in QUERIES:
            (QUERIES[warm].builder(spark, sf_dir)
             .write.format("noop").mode("overwrite").save())
    out = {}
    for name in names:
        q = QUERIES[name]
        times, builds, execs = [], [], []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            df = q.builder(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(round(t1 - t0, 4))
            execs.append(round(t2 - t1, 4))
            times.append(round(t2 - t0, 4))
            del df
            gc.collect()
        out[name] = {"median": round(statistics.median(times), 4),
                     "runs": times, "build": builds, "exec": execs}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": {k: v["median"] for k, v in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
