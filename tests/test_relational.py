"""Relational-operator tests not already covered by oracle parity."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from comix_etl_spark.operators.relational import global_rank, multi_field_search


def test_global_rank_matches_global_window(spark):
    """Range-partitioned rank must equal row_number() OVER (ORDER BY k)
    exactly, across many partitions and an awkward row count."""
    df = spark.range(0, 1003).select(
        F.concat(F.lit("k"), F.lpad(F.col("id").cast("string"), 6, "0")).alias("k"))
    got = {r.k: r.rank for r in global_rank(df, "k", num_partitions=7).collect()}
    want = {r.k: r.rn for r in df.withColumn(
        "rn", F.row_number().over(Window.orderBy("k"))).collect()}
    assert got == want


def test_global_rank_single_partition_and_empty(spark):
    one = spark.createDataFrame([("z",)], "k string")
    assert global_rank(one, "k").collect()[0].rank == 1
    empty = spark.createDataFrame([], "k string")
    assert global_rank(empty, "k").count() == 0


def test_multi_field_search_or_semantics(spark):
    df = spark.createDataFrame(
        [(1, "Uncanny Tales", "great gambit intro"),
         (2, "Plain Series", "nothing here"),
         (3, "gambit solo", None)],
        "id int, title string, notes string")
    out = multi_field_search(df, "gambit", ["title", "notes"])
    assert {r.id for r in out.collect()} == {1, 3}
