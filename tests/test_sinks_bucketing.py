"""Bucketed-table join elision: the scale claim ("bucketing pays the
shuffle once at write") asserted against the PHYSICAL PLAN, not prose —
a join of two co-bucketed tables must contain no Exchange."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from comix_etl_spark.sinks.writers import save_bucketed_table


def _plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark):
    facts = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v"))
    dims = spark.range(0, 1_000).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name"))
    save_bucketed_table(facts, "bt_facts", ["k"], 8, sort_cols=["k"])
    save_bucketed_table(dims, "bt_dims", ["k"], 8, sort_cols=["k"])
    try:
        # broadcast would hide the point — force the shuffle-join path
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bt_facts").join(spark.table("bt_dims"), "k")
        plan = _plan_of(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == 1_000
        # aggregation on the bucket key also reuses the layout: no Exchange
        agg = spark.table("bt_facts").groupBy("k").agg(F.sum("v").alias("s"))
        assert "Exchange" not in _plan_of(agg)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS bt_facts")
        spark.sql("DROP TABLE IF EXISTS bt_dims")
