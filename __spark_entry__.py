"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full registry in
``comix_etl_spark.plans.queries`` — one entry per implemented operator
from SURVEY.md §2 (plus §7 scale extensions), each with a DuckDB oracle
unless genuinely non-SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from comix_etl_spark.plans.queries import QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (A1/J1/O3 top-k: top part brands by lineitem count)
    on /root/testdata/sf0.001; driver checks rows > 0."""
    return QUERIES["stats_topk"].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.builder for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query; omitted for non-SQL-expressible ops
    (driver then records a rows-only check)."""
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
