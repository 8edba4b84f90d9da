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
