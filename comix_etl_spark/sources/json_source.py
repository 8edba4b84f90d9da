"""Nested-JSON document ingest (the Marvel payload shape) + normalize.

Replaces the reference's hand-rolled dict walking
(etl/seed/seed_from_marvel.py:181-269; starter etl/transform.py:31-45)
with a declared nested schema read + Column-expression flattening. The
whole normalize stage is one codegen'd projection over the scan — no
shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from comix_etl_spark.functions import scalar
from comix_etl_spark.schemas import RAW_MARVEL_COMIC


def read_marvel_comics(spark: SparkSession, path: str) -> DataFrame:
    """Read newline-delimited Marvel comic payloads with the declared
    nested schema (no inference — a schema drift fails loudly)."""
    return spark.read.schema(RAW_MARVEL_COMIC).json(path)


def normalize_comics(raw: DataFrame) -> DataFrame:
    """Raw nested payload → flat issue rows (the reference's transform:
    F1 issue numbers, F2 cents, F4 typed dates, F5 typed prices,
    F6 thumbnails, F7 variant flag)."""
    return raw.select(
        F.col("id").alias("marvel_comic_id"),
        F.col("title"),
        scalar.normalize_issue_number("issueNumber").alias("issue_number"),
        scalar.pick_typed_date("dates", "onsaleDate").alias("onsale_date"),
        scalar.cents_from_price(scalar.pick_typed_price("prices", "printPrice")).alias("price_cents"),
        scalar.clean_text("isbn").alias("isbn"),
        scalar.clean_text("upc").alias("upc"),
        scalar.clean_text("description").alias("description"),
        scalar.normalize_thumb("thumbnail").alias("cover_url"),
        scalar.is_variant("title", "variantDescription").alias("is_variant"),
    )


def explode_credits(raw: DataFrame) -> DataFrame:
    """Raw payload → (marvel_comic_id, creator_name, role) bridge rows
    (the reference's creators.items[] walk, transform.py:41-44)."""
    return (
        raw.select(F.col("id").alias("marvel_comic_id"),
                   F.explode(F.col("creators.items")).alias("c"))
        .select(
            "marvel_comic_id",
            # case-insensitive creator identity (README_TALKING_POINTS.md:8):
            # lowercase is the canonical form
            F.lower(F.trim(F.col("c.name"))).alias("creator_name"),
            F.lower(F.trim(F.col("c.role"))).alias("role"),
        )
    )
