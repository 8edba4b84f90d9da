"""Statistical profiling operators: grouped exact percentiles, pairwise
correlation, z-score outlier screens, and fixed-width histograms.

Beyond-reference extensions (SURVEY.md §7): the reference's analytics stop
at counts and top-k (comixcatalog_starter.zip!etl/etl.py:47-67); these
lift the same "describe the table" intent to the moments/quantiles a data
pipeline actually monitors.

Scale notes: every operator here is a single aggregation pass —
percentiles and correlations reduce to per-group sort/moment state inside
one shuffle; histograms are scan-local integer bucketing + one count
shuffle on the (bounded) bucket key; the z-score screen broadcasts a tiny
per-group moment table back onto the scan, so the fact side never
shuffles. Nothing here collects to the driver.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_percentiles(df: DataFrame, group_col: str, value_col: str, *,
                        probs: Sequence[float] = (0.25, 0.5, 0.75, 0.95),
                        ndigits: int = 6) -> DataFrame:
    """Exact interpolated percentiles per group, one column per prob.

    Uses ``F.percentile`` (exact, linear interpolation at index
    ``(n-1)*p`` — the same definition as ANSI ``percentile_cont`` /
    DuckDB ``quantile_cont``, so results are engine-portable). Exact
    percentiles sort each group inside the aggregate: per-group state is
    the group's values. That is the right tool up to groups of ~1e8
    values; for truly unbounded groups switch to
    ``F.percentile_approx`` (bounded t-digest state) — same plan shape.
    """
    aggs = [F.round(F.percentile(value_col, float(p)), ndigits)
             .alias(f"p{int(p * 100):02d}")
            for p in probs]
    aggs.append(F.count(F.lit(1)).cast("long").alias("n_rows"))
    return df.groupBy(group_col).agg(*aggs)


def corr_matrix(df: DataFrame, cols: Sequence[str], *,
                ndigits: int = 4) -> DataFrame:
    """Pairwise Pearson correlations, long form: (col_a, col_b, corr).

    All C(k,2) coefficients come out of ONE aggregation job (each
    ``F.corr`` is an independent agg expression sharing the scan), then
    unpivot driver-side-free via stack. Emitted rounded: corr folds
    sums of products, whose float accumulation order is partition-
    dependent — at ``ndigits`` well above the ~1e-12 relative noise the
    value is stable across engines and partitionings.
    """
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    agg = df.agg(*[F.round(F.corr(a, b), ndigits).alias(f"{a}__{b}")
                   for a, b in pairs])
    stack_args = ", ".join(f"'{a}', '{b}', `{a}__{b}`" for a, b in pairs)
    return agg.select(F.expr(
        f"stack({len(pairs)}, {stack_args}) AS (col_a, col_b, corr)"))


def zscore_outliers(df: DataFrame, group_col: str, value_col: str, *,
                    z_threshold: float = 2.0, ndigits: int = 4) -> DataFrame:
    """Rows whose ``value_col`` deviates more than ``z_threshold``
    population standard deviations from their group mean.

    Plan: per-group (avg, stddev_pop) is a tiny aggregate (one row per
    group) broadcast back onto the scan — the fact side is filtered
    in place without shuffling. ``stddev_pop`` (not sample) on both
    engines so the oracle SQL is unambiguous.
    """
    stats = df.groupBy(group_col).agg(
        F.avg(value_col).alias("_mu"),
        F.stddev_pop(value_col).alias("_sigma"))
    z = (F.col(value_col) - F.col("_mu")) / F.col("_sigma")
    return (df.join(F.broadcast(stats), group_col)
            .filter(F.col("_sigma") > 0)
            .withColumn("zscore", F.round(z, ndigits))
            .filter(F.abs(F.col("zscore")) > z_threshold)
            .drop("_mu", "_sigma"))


def fixed_histogram(df: DataFrame, value_col: str, *, width: float,
                    origin: float = 0.0) -> DataFrame:
    """Fixed-width histogram: integer bucket ids, counts, and ppm share.

    Fixed bounds (not data-driven min/max) keep the bucketing a pure
    scan-local expression — no extra pass to find the range, and bucket
    ids are stable as data grows. The share denominator re-aggregates
    the (bounded-cardinality) bucket frame, never a second fact scan.
    """
    bucket = F.floor((F.col(value_col) - F.lit(origin)) / F.lit(width))
    counts = (df.select(bucket.cast("long").alias("bucket"))
              .groupBy("bucket")
              .agg(F.count(F.lit(1)).cast("long").alias("n_rows")))
    total = counts.agg(F.sum("n_rows").alias("_total"))
    return (counts.crossJoin(F.broadcast(total))
            .select("bucket",
                    (F.col("bucket") * width + origin).alias("lo"),
                    ((F.col("bucket") + 1) * width + origin).alias("hi"),
                    "n_rows",
                    F.expr("n_rows * 1000000L div _total").alias("share_e6")))
