"""comix_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the ``tanktoptony/comix-etl`` reference.

The reference is a comics-catalog ETL + query stack (Marvel REST extract →
normalize → Postgres upsert → quality checks → Flask serving). This package
re-expresses every operator in its inventory (SURVEY.md §2) as idiomatic
Spark DataFrame / SQL plans, designed for 100 TB scale:

- declarative plans → Catalyst does pushdown / pruning / join selection
- dims broadcast, facts shuffle on their natural keys
- merges are set-based (anti-join / full-outer coalesce), never row probes
- Python only at the edges, vectorized via Arrow when unavoidable

Layout:
    session.py    SparkSession factory (AQE, shuffle sizing, UTC)
    schemas.py    explicit StructTypes for the comix model + ingest payloads
    functions/    scalar/text/vector column-expression libraries (F1–F15 …)
    operators/    relational / merge / quality / dedup / similarity ops
    sources/      csv / json / rest / literal readers (S1–S7)
    sinks/        parquet / csv / json / audit writers (S8–S13)
    plans/        the query registry driving __spark_entry__.py
    streaming/    structured-streaming variants of the ingest DAG
"""

__version__ = "0.1.0"
