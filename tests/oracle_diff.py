"""Local replica of the driver's DuckDB-differential check.

Runs a registry Query's Spark plan and its DuckDB oracle over the same
parquet, then compares row count, column-name set, and an
order-insensitive canonicalized multiset of values. Strict: exact value
equality (floats compared by full repr) — if a query needs tolerance it
must be rewritten to be deterministic instead.
"""

from __future__ import annotations

import datetime as dt
import math
import os
from decimal import Decimal

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, Decimal):
        return f"f:{float(v)!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, dt.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, dt.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{bytes(v).hex()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return f"s:{v}"


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("|".join(_canon(row[i]) for i in order) for row in rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    import pandas as pd  # noqa: F401

    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns

    res = con.execute(sql)
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    assert len(s_rows) == len(d_rows), f"rowcount mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    # a 0-row hash match proves only that the empty set equals itself —
    # every oracle-checked query must exercise real rows (r2 verdict:
    # two registry predicates silently matched nothing on both engines)
    assert len(d_rows) > 0, "vacuous oracle check: both engines returned 0 rows"

    s_canon = canonical_rows(s_cols, s_rows)
    d_canon = canonical_rows(d_cols, d_rows)
    mismatches = [(a, b) for a, b in zip(s_canon, d_canon) if a != b]
    assert not mismatches, f"value mismatch ({len(mismatches)} rows), first: {mismatches[0]}"
