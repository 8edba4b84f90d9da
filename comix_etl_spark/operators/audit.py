"""A4 — etl_run audit lifecycle (SURVEY.md §2.4).

The reference opens an EtlRun row (status=STARTED), accumulates
records_read/records_loaded, and closes with SUCCESS/FAILED + notes
(comixcatalog_starter.zip!etl/etl.py:20-45; sql/schema.sql:42-51).

Here the audit table is an append-only parquet directory: each run
appends exactly one immutable row at close (append-only keeps the write
atomic per run — no read-modify-write races between concurrent runs).
"""

from __future__ import annotations

import datetime as dt
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from comix_etl_spark.schemas import ETL_RUN


@dataclass
class EtlRun:
    source_system: str
    # >> 64 keeps 64 random bits (the schema field is a Long): 32 bits
    # would hit ~50% collision odds near 77k runs — real at fleet scale
    run_id: int = field(default_factory=lambda: (uuid.uuid4().int >> 64)
                        - (1 << 63))
    started_at: dt.datetime = field(default_factory=lambda: dt.datetime.now(dt.timezone.utc))
    records_read: int = 0
    records_loaded: int = 0
    status: str = "STARTED"
    notes: str | None = None

    def finish(self, status: str = "SUCCESS", notes: str | None = None) -> "EtlRun":
        self.status = status
        self.notes = notes
        self.finished_at = dt.datetime.now(dt.timezone.utc)
        return self

    def to_df(self, spark: SparkSession) -> DataFrame:
        finished = getattr(self, "finished_at", None)
        row = (
            self.run_id, self.source_system,
            self.started_at.replace(tzinfo=None),
            finished.replace(tzinfo=None) if finished else None,
            self.records_read, self.records_loaded, self.status, self.notes,
        )
        return spark.createDataFrame([row], schema=ETL_RUN)

    def append_to(self, spark: SparkSession, path: str) -> None:
        self.to_df(spark).write.mode("append").parquet(path)


def read_audit(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(ETL_RUN).parquet(path)
