"""Sinks (SURVEY.md §2.1 S8–S12): parquet/csv/json writers + audit append."""

from comix_etl_spark.sinks.writers import (  # noqa: F401
    write_csv_report,
    write_json_records,
    write_table,
)
