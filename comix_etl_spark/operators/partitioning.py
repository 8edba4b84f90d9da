"""Partition-shape guards shared by CPU-bound operators.

A single-file parquet table arrives as ONE input split, so any
CPU-bound stage planned directly over the scan (shingling, sketching,
Arrow-batched matmuls) serializes onto one core — measured on the
sf0.1 `documents` and `embeddings` tables, where every pandas-UDF
sketch stage ran `(0 + 1) / 1` while 31 cores idled. A 100 TB corpus
arrives in thousands of splits, so the guard is a no-op there — it
only pays an input-sized, one-time round-robin shuffle when the scan
would otherwise under-use the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_scan(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` when the plan would
    otherwise run in fewer splits than cores. Call on the slim projected
    scan (ids + the one column the downstream stage consumes), never on
    the full-width table."""
    par = df.sparkSession.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def zorder_key(x, y, *, bits: int = 8):
    """Morton (z-order) key: interleave the low ``bits`` of two integer
    dimension columns — bit i of x lands at position 2i, bit i of y at
    2i+1. Pure integer Column arithmetic (shift/and/add), scan-local.

    The multi-dimensional clustering primitive for physical layout:
    ``repartitionByRange(zorder_key(a, b))`` before a write yields
    files whose min/max stats are narrow in BOTH dimensions, so a
    predicate on EITHER column prunes most files — the standard
    data-skipping layout (z-ordering, public: Morton 1966; used by
    every lakehouse table format). Callers bucket/clamp dims into
    [0, 2^bits) first.
    """
    from pyspark.sql import functions as F

    xc = x if not isinstance(x, str) else F.col(x)
    yc = y if not isinstance(y, str) else F.col(y)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (z
             + F.shiftleft(F.shiftright(xc.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
             + F.shiftleft(F.shiftright(yc.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return z
