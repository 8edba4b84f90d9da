"""Sources (SURVEY.md §2.1 S1–S7, S13): parquet, CSV-with-rejects,
nested-JSON, REST-paginated (pluggable fetcher), and literal readers."""
