"""SparkSession factory.

Local test boxes run ``local[$SPARK_GRAFT_CPUS]``; production is a real
cluster — every knob here is chosen to be correct for both:

- AQE on: runtime coalescing + skew-join splitting replace hand-tuned
  partition counts when data volume is 1000× the test scale.
- ``spark.sql.shuffle.partitions`` defaults to the local core count; on a
  cluster AQE's coalescing makes the initial number a ceiling, not a target.
- Session timezone pinned to UTC so timestamp semantics are deterministic
  (and match the DuckDB oracle, whose timestamps are UTC-naive).
- Arrow enabled: every pandas_udf / toPandas hop is vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "comix_etl_spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    cores = default_parallelism()
    shuffle = shuffle_partitions or cores
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Managed tables (S13 saveAsTable) land in /tmp, not the repo cwd.
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/comix_etl_spark_warehouse"))
        # Parquet TIMESTAMP(NANOS) (events.ts) is unreadable by Spark's
        # vectorized reader; read as long nanos and convert at load.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None):
    """Read the driver's parquet tables and register them as temp views.

    Returns {name: DataFrame}. Reading is lazy; registering the views lets
    operators be written in either DataFrame or SQL form over the same scan.
    """
    all_names = (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    )
    # Columns stored as parquet TIMESTAMP(NANOS): Spark's reader throws
    # PARQUET_TYPE_ILLEGAL on them unless the read supplies an explicit
    # schema typing the column as LongType (the legacy nanosAsLong conf
    # would also work, but only on sessions WE build — callers may hand us
    # any SparkSession, so the explicit schema is the robust path). The
    # long nanos are converted to microsecond timestamps by integer
    # division — the same truncation DuckDB applies reading ns parquet.
    from comix_etl_spark.schemas import EVENTS_RAW

    raw_schemas = {"events": EVENTS_RAW}
    nanos_columns = {"events": ("ts",)}
    out = {}
    for name in names or all_names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if name in raw_schemas:
            df = spark.read.schema(raw_schemas[name]).parquet(path)
        else:
            df = spark.read.parquet(path)
        for c in nanos_columns.get(name, ()):
            if dict(df.dtypes).get(c) == "bigint":
                # integer `div` (not double /): ns epoch values exceed
                # double's 53-bit mantissa and would round incorrectly
                df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
