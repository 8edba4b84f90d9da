"""Isolate-profile a single registry query — the bench-outlier
adjudication protocol (r10 containment_pairs precedent): a FRESH
session, the bench's own warm-up, then N timed noop-sink runs of just
the one query, so neighborhood effects (registry order, checkpoint
blocks from earlier queries, Arrow-pool first-touch) are excluded.

Usage: python scripts/isolate_profile.py <query_name> [n_runs]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from comix_etl_spark.plans.queries import QUERIES  # noqa: E402
from comix_etl_spark.session import get_spark, load_tables  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    q = QUERIES[name]
    spark = get_spark(f"isolate_{name}")
    spark.sparkContext.setLogLevel("ERROR")
    for df in load_tables(spark, sf_dir).values():
        df.count()
    times = []
    for i in range(n_runs):
        t0 = time.perf_counter()
        df = q.builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
        del df
        import gc

        gc.collect()
    print(json.dumps({"query": name, "sf_dir": sf_dir, "runs": times}))
    spark.stop()


if __name__ == "__main__":
    main()
