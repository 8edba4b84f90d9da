"""Profile the stream_outer_join micro-batch structure (r15 — r14
verdict #3): replicate the registry query with the streaming query
handle kept, record per-batch durationMs / stateOperators metrics, and
time the surrounding pieces.

Usage: python scripts/profile_stream_r15.py [runs]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from comix_etl_spark.session import (events_stream_source, get_spark,  # noqa: E402
                                     load_tables)
from comix_etl_spark.streaming.joins import stream_interval_join  # noqa: E402
from comix_etl_spark.streaming.windowed import stream_shuffle_partitions  # noqa: E402


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_stream_r15")
    spark.sparkContext.setLogLevel("ERROR")
    for df in load_tables(spark, sf_dir).values():
        df.count()
    raw_schema, ts_fix = events_stream_source(spark, sf_dir)

    for i in range(runs):
        t0 = time.perf_counter()

        def read_events():
            raw = (spark.readStream.schema(raw_schema)
                   .option("pathGlobFilter", "events.parquet").parquet(sf_dir))
            return ts_fix(raw)

        views = (read_events().filter(F.col("event_type") == "view")
                 .select("user_id", F.col("ts").alias("ts_v")))
        purchases = (read_events().filter(F.col("event_type") == "purchase")
                     .select("user_id", F.col("ts").alias("ts_p")))
        joined = stream_interval_join(views, purchases, key="user_id",
                                      left_ts="ts_v", right_ts="ts_p",
                                      within="1 hour", watermark="2 hours",
                                      how="left_outer")
        t1 = time.perf_counter()
        with stream_shuffle_partitions(spark, 8):
            q = (joined.writeStream.outputMode("append")
                 .format("memory").queryName(f"prof_soj_{i}")
                 .trigger(availableNow=True).start())
            q.awaitTermination()
        t2 = time.perf_counter()
        prog = [json.loads(p.json) for p in q.recentProgress]
        batches = [{
            "batchId": p.get("batchId"),
            "durationMs": p.get("durationMs"),
            "numInputRows": p.get("numInputRows"),
            "state": [{k: so.get(k) for k in
                       ("numRowsTotal", "numRowsUpdated", "numRowsRemoved",
                        "commitTimeMs", "numShufflePartitions")}
                      for so in p.get("stateOperators", [])],
        } for p in prog]
        t3 = time.perf_counter()
        n = spark.table(f"prof_soj_{i}").count()
        t4 = time.perf_counter()
        print(json.dumps({"run": i, "build": round(t1 - t0, 3),
                          "stream": round(t2 - t1, 3),
                          "sink_rows": n, "readback": round(t4 - t3, 3),
                          "n_batches": len(batches),
                          "batches": batches}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
