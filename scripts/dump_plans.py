"""Dump .explain('formatted') for the named registry queries to
plans/<tag>/<query>_<suffix>.txt — the judge-auditable plan evidence
for optimization rounds.

Usage: python scripts/dump_plans.py <tag> <suffix> <query> [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from comix_etl_spark.plans.queries import QUERIES  # noqa: E402
from comix_etl_spark.session import get_spark, load_tables  # noqa: E402


def main() -> None:
    tag, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(f"dump_plans_{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)
    for name in names:
        df = QUERIES[name].builder(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print("wrote", path, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
