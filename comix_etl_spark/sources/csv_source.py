"""S6 — CSV seed source with first-class rejects handling.

The reference reads seed CSVs with DictReader and no validation
(seed_from_csv.py:48-67); its real data contains a duplicated header row
mid-file (seeds/static_issues.csv:5) that leaked into the DB as a bogus
issue ('issue_number' as an issue_number). This reader makes that class
of defect visible instead of silent:

- PERMISSIVE mode + ``columnNameOfCorruptRecord`` captures malformed
  rows (wrong arity, quote breakage) in ``_corrupt_record``;
- ``split_rejects`` additionally quarantines structurally-valid rows
  that are semantically corrupt (the duplicated-header case: a row
  whose cells equal the header names).

At scale: schema is explicit (never inferSchema — that's a full extra
pass over 100 TB), reads parallelize per file split, and the reject
filter is a codegen predicate on the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv_with_rejects(spark: SparkSession, path: str, schema: T.StructType,
                          header: bool = True) -> DataFrame:
    """Read CSV in PERMISSIVE mode; malformed rows land in
    ``_corrupt_record`` (the schema must contain that StringType field)."""
    return (
        spark.read.option("header", header)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(schema)
        .csv(path)
    )


def split_rejects(df: DataFrame, header_names: list[str],
                  semantic_invalid=None) -> tuple[DataFrame, DataFrame]:
    """(good, rejects): rejects are parse-corrupt rows, embedded
    duplicated-header rows (every cell == its column name), and rows
    matching the optional ``semantic_invalid`` Column predicate.

    The predicate matters because CSV parsers (Spark PERMISSIVE and
    DuckDB alike) silently tolerate EXTRA fields by shifting/truncating —
    an unquoted comma doesn't produce a corrupt record, it produces a
    structurally-valid wrong row. Only a semantic check (e.g. "cover_path
    must look like a path") catches it, which is exactly the defect class
    the reference shipped (seeds/static_issues.csv)."""
    dup_header = None
    for name in header_names:
        # eqNullSafe: a row with SOME header-named cells and a NULL
        # elsewhere must evaluate false, not NULL — a NULL predicate would
        # drop the row from good AND rejects, breaking good ∪ rejects = all
        term = F.col(name).eqNullSafe(F.lit(name))
        dup_header = term if dup_header is None else (dup_header & term)
    is_reject = F.col("_corrupt_record").isNotNull() | dup_header
    if semantic_invalid is not None:
        is_reject = is_reject | semantic_invalid
    is_reject = F.coalesce(is_reject, F.lit(False))
    good = df.filter(~is_reject).drop("_corrupt_record")
    rejects = df.filter(is_reject)
    return good, rejects
