"""bloom_prefiltered_join is exact (identical to the plain join) and its
bitmap side is broadcast; kmeans_fit recovers well-separated clusters
and never degrades inertia across iterations."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import numpy as np
import pytest
from pyspark.sql import functions as F

from comix_etl_spark.operators.relational import bloom_prefiltered_join
from comix_etl_spark.operators.similarity import kmeans_fit


def _counts(df, keys):
    return sorted(tuple(r) for r in df.groupBy(*keys).count().collect())


def test_bloom_join_matches_plain_join(spark, sf_small):
    orders = spark.read.parquet(f"{sf_small}/orders.parquet")
    li = (spark.read.parquet(f"{sf_small}/lineitem.parquet")
          .withColumnRenamed("l_orderkey", "o_orderkey"))
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT") \
                   .select("o_orderkey", "o_orderpriority")
    got = bloom_prefiltered_join(li, urgent, "o_orderkey")
    want = li.join(urgent, "o_orderkey")
    assert _counts(got, ["o_orderkey", "l_linenumber"]) == \
        _counts(want, ["o_orderkey", "l_linenumber"])
    assert got.count() == want.count() > 0


def test_bloom_join_semi_and_tiny_bitmap(spark, sf_small):
    orders = spark.read.parquet(f"{sf_small}/orders.parquet")
    li = (spark.read.parquet(f"{sf_small}/lineitem.parquet")
          .withColumnRenamed("l_orderkey", "o_orderkey"))
    build = orders.filter(F.col("o_orderkey") % 7 == 0).select("o_orderkey")
    got = bloom_prefiltered_join(li, build, "o_orderkey", how="left_semi",
                                 bits=1 << 10)  # tiny bitmap: many FPs, still exact
    want = li.join(build, "o_orderkey", "left_semi")
    assert got.count() == want.count() > 0


def test_bloom_join_rejects_outer(spark, sf_small):
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    with pytest.raises(ValueError, match="inner/semi"):
        bloom_prefiltered_join(li, li, "l_orderkey", how="left")


def test_bloom_bitmap_is_broadcast(spark, sf_small):
    orders = spark.read.parquet(f"{sf_small}/orders.parquet")
    li = (spark.read.parquet(f"{sf_small}/lineitem.parquet")
          .withColumnRenamed("l_orderkey", "o_orderkey"))
    plan_buf = io.StringIO()
    with redirect_stdout(plan_buf):
        bloom_prefiltered_join(li, orders.select("o_orderkey"),
                               "o_orderkey").explain("formatted")
    assert "BroadcastHashJoin" in plan_buf.getvalue()


def test_kmeans_recovers_separated_blobs(spark):
    rng = np.random.default_rng(7)
    centers = np.eye(3) * 10.0
    rows = []
    for c in range(3):
        for i in range(40):
            v = centers[c] + rng.normal(0, 0.1, 3)
            rows.append((c * 40 + i, [float(x) for x in v], c))
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>, truth: int")
    _, assigned = kmeans_fit(df, k=3, iters=4)
    # every true blob maps to exactly one predicted cluster and vice versa
    pairs = assigned.select("truth", "cluster_id").distinct().collect()
    assert len(pairs) == 3
    assert len({p.cluster_id for p in pairs}) == 3


def test_kmeans_inertia_never_increases(spark, sf_small):
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")

    def inertia(centers):
        c = centers.tolist()
        expr = F.array_min(F.array(*[
            F.aggregate(
                F.zip_with("embedding", F.array(*[F.lit(x) for x in row]),
                           lambda a, b: (a - b) * (a - b)),
                F.lit(0.0), lambda acc, x: acc + x)
            for row in c]))
        return emb.select(F.sum(expr).alias("s")).collect()[0]["s"]

    c1, _ = kmeans_fit(emb, k=4, iters=1)
    c4, _ = kmeans_fit(emb, k=4, iters=4)
    assert inertia(c4) <= inertia(c1) + 1e-9
