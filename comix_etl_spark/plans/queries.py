"""The query registry: every implemented operator from SURVEY.md §2 (and
the §7 scale extensions) as a (spark, sf_dir) -> DataFrame builder plus an
equivalent ANSI-SQL oracle for DuckDB.

Contract notes (driver compares row count + schema + order-insensitive
value hash at sf=0.01):
- every computed column is aliased identically in Spark and SQL;
- every top-k has a deterministic total order (unique tie-break key);
- double aggregations go through DECIMAL(18,4) so the sum is exact and
  associative (same value regardless of partitioning / row order), then
  cast back to double so the output type matches on both engines;
- counts are cast to BIGINT in SQL (DuckDB SUM(int) yields HUGEINT).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from comix_etl_spark.functions import scalar, text, vector
from comix_etl_spark.operators import relational as R
from comix_etl_spark.session import load_tables


@dataclass(frozen=True)
class Query:
    """One registry entry: a Spark plan builder + its DuckDB oracle."""

    builder: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""
    tables: tuple[str, ...] = field(default=())


def _t(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir, names)


# ---------------------------------------------------------------------------
# §2.4/§2.3/§2.6 — flagship: top-k dims by fact count (A1/J1/O3)
# ---------------------------------------------------------------------------

def q_stats_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 10 part brands by lineitem count — the reference's `stats` query
    ("top series by issue count", comixcatalog_starter.zip!etl/etl.py:56-67)
    over the driver's star schema (part≈series, lineitem≈issue).
    """
    t = _t(spark, sf_dir, "lineitem", "part")
    return (
        R.group_count_topk(t["lineitem"], t["part"].withColumnRenamed("p_partkey", "l_partkey"),
                           "l_partkey", "p_brand", 10)
    )


ORACLE_STATS_TOPK = """
SELECT p_brand, count(*) AS issue_count
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY issue_count DESC, p_brand
LIMIT 10
"""


# ---------------------------------------------------------------------------
# §2.2/§2.6 — substring search, ordered, capped (P3/O1/O2)
# ---------------------------------------------------------------------------

def q_search_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`title ilike '%q%' ORDER BY title LIMIT 50` (reference app.py:182)
    over part.p_name; p_partkey tie-break for a deterministic result set.
    """
    t = _t(spark, sf_dir, "part")
    return R.search_substring(
        t["part"].select("p_partkey", "p_name", "p_brand"),
        "p_name", "green", order_by=("p_name", "p_partkey"), limit=50,
    )


ORACLE_SEARCH_SUBSTRING = """
SELECT p_partkey, p_name, p_brand
FROM part
WHERE lower(p_name) LIKE '%green%'
ORDER BY p_name, p_partkey
LIMIT 50
"""


# ---------------------------------------------------------------------------
# §2.2 — keyed ordered scan (P2/O1; the /series/<id>/issues shape)
# ---------------------------------------------------------------------------

def q_keyed_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All lineitems of the smallest orderkey, in line order (reference
    app/api.py:117-154). The 1-row key side broadcasts — a point lookup
    stays a point lookup at any scale.
    """
    t = _t(spark, sf_dir, "lineitem", "orders")
    min_key = t["orders"].agg(F.min("o_orderkey").alias("_k"))
    return (
        t["lineitem"]
        .join(F.broadcast(min_key), F.col("l_orderkey") == F.col("_k"))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice")
        .orderBy("l_linenumber")
    )


ORACLE_KEYED_SCAN = """
SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
FROM lineitem
WHERE l_orderkey = (SELECT min(o_orderkey) FROM orders)
ORDER BY l_linenumber
"""


# ---------------------------------------------------------------------------
# §2.3/§2.4 — anti-join quality count (J2/A3)
# ---------------------------------------------------------------------------

def q_orphan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders — the reference's orphan-issue check
    (comixcatalog_starter.zip!etl/etl.py:52) as a left-anti aggregate."""
    t = _t(spark, sf_dir, "customer", "orders")
    orphans = R.orphan_rows(
        t["customer"], t["orders"].select(F.col("o_custkey").alias("c_custkey")), "c_custkey"
    )
    return orphans.agg(F.count(F.lit(1)).alias("orphan_count"))


ORACLE_ORPHAN_COUNT = """
SELECT count(*) AS orphan_count
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


# ---------------------------------------------------------------------------
# §2.4 — conditional-count quality metrics (A2/P4)
# ---------------------------------------------------------------------------

def q_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-rate / sentinel-rate probes (reference `quality` subcommand,
    comixcatalog_starter.zip!etl/etl.py:47-54): one scan, several
    conditional counts — map-side aggregation, no per-metric rescan."""
    t = _t(spark, sf_dir, "lineitem")
    li = t["lineitem"]
    return li.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.sum(F.when(F.col("l_shipdate").isNull(), 1).otherwise(0)).cast("long").alias("null_shipdate"),
        F.sum(F.when(F.col("l_discount") == 0.0, 1).otherwise(0)).cast("long").alias("zero_discount"),
        F.sum(F.when(F.col("l_tax") > 0.05, 1).otherwise(0)).cast("long").alias("high_tax"),
    )


ORACLE_QUALITY_METRICS = """
SELECT count(*) AS total_rows,
       CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_shipdate,
       CAST(sum(CASE WHEN l_discount = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_discount,
       CAST(sum(CASE WHEN l_tax > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS high_tax
FROM lineitem
"""


# ---------------------------------------------------------------------------
# §2.5 — top-1 per group (W2/A7)
# ---------------------------------------------------------------------------

def q_top_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best row per group with deterministic tie-break (reference best-match
    top-1, etl/seed/seed_from_marvel.py:126-141)."""
    t = _t(spark, sf_dir, "customer")
    best = R.top1_per_group(
        t["customer"].select("c_nationkey", "c_custkey", "c_name", "c_acctbal"),
        part_by=("c_nationkey",),
        order_by=(F.desc("c_acctbal"), F.col("c_custkey")),
    )
    return best.select("c_nationkey", "c_custkey", "c_name", "c_acctbal")


ORACLE_TOP_CUSTOMER_PER_NATION = """
SELECT c_nationkey, c_custkey, c_name, c_acctbal FROM (
  SELECT c_nationkey, c_custkey, c_name, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# §2.5 — sequence within group (W1, issue_order semantics)
# ---------------------------------------------------------------------------

def q_order_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """issue_order: running 1..n per parent in date order (reference
    etl/seed/seed_from_marvel.py:243-245), orders per customer."""
    t = _t(spark, sf_dir, "orders")
    seq = R.sequence_within_group(
        t["orders"].select("o_custkey", "o_orderkey", "o_orderdate"),
        part_by=("o_custkey",),
        order_by=(F.col("o_orderdate"), F.col("o_orderkey")),
        out_col="issue_order",
    )
    return seq.select("o_custkey", "o_orderkey", F.col("issue_order").cast("int").alias("issue_order"))


ORACLE_ORDER_SEQUENCE = """
SELECT o_custkey, o_orderkey,
       CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT) AS issue_order
FROM orders
"""


# ---------------------------------------------------------------------------
# §2.4 — cart-style SUM/COUNT aggregation (A5)
# ---------------------------------------------------------------------------

def q_segment_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Σ price + count per group (reference cart subtotal,
    app/static/js/cart.js:45-58), per market segment via a broadcast dim
    join. Decimal accumulation → exact, order-independent sum."""
    t = _t(spark, sf_dir, "orders", "customer")
    cust = t["customer"].select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    return (
        t["orders"]
        .join(F.broadcast(cust), "o_custkey")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("total_price"),
        )
    )


ORACLE_SEGMENT_TOTALS = """
SELECT c_mktsegment,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# §2.2/§2.8 — multi-field weighted relevance search (P6/F10/O4)
# ---------------------------------------------------------------------------

def q_relevance_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted substring relevance (+3 brand, +2 name, +1 type — the JS
    scorer at app/templates/search.html:177-187), filtered, top-50."""
    t = _t(spark, sf_dir, "part")
    q = "re"
    scored = t["part"].withColumn(
        "relevance",
        scalar.relevance_score(q, [("p_brand", 3), ("p_name", 2), ("p_type", 1)]),
    )
    return (
        scored.filter(F.col("relevance") > 0)
        .select("p_partkey", "p_name", "p_brand", "p_type", "relevance")
        .orderBy(F.desc("relevance"), "p_partkey")
        .limit(50)
    )


ORACLE_RELEVANCE_SEARCH = """
SELECT p_partkey, p_name, p_brand, p_type,
       (CASE WHEN lower(coalesce(p_brand,'')) LIKE '%re%' THEN 3 ELSE 0 END
      + CASE WHEN lower(coalesce(p_name,'')) LIKE '%re%' THEN 2 ELSE 0 END
      + CASE WHEN lower(coalesce(p_type,'')) LIKE '%re%' THEN 1 ELSE 0 END) AS relevance
FROM part
WHERE (CASE WHEN lower(coalesce(p_brand,'')) LIKE '%re%' THEN 3 ELSE 0 END
     + CASE WHEN lower(coalesce(p_name,'')) LIKE '%re%' THEN 2 ELSE 0 END
     + CASE WHEN lower(coalesce(p_type,'')) LIKE '%re%' THEN 1 ELSE 0 END) > 0
ORDER BY relevance DESC, p_partkey
LIMIT 50
"""


# ---------------------------------------------------------------------------
# §2.1/§2.6 — prefix-crawl union + dedup (S3/O7/A6)
# ---------------------------------------------------------------------------

def q_prefix_crawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A–Z prefix crawl as parallel scan branches + hash dedup (reference
    etl/sources/marvel_extract.py:89-130). Overlapping prefixes prove the
    dedup; aggregate summary keeps the contract value-dense."""
    t = _t(spark, sf_dir, "part")
    crawled = R.union_prefix_crawl(
        t["part"].select("p_partkey", "p_name"),
        "p_name", prefixes=("a", "b", "c", "bl", "co"), dedup_key="p_partkey",
    )
    return crawled.agg(
        F.count(F.lit(1)).alias("n_unique"),
        F.min("p_partkey").alias("min_key"),
        F.max("p_partkey").alias("max_key"),
    )


ORACLE_PREFIX_CRAWL = """
WITH crawled AS (
  SELECT p_partkey, p_name FROM part WHERE lower(p_name) LIKE 'a%'
  UNION ALL SELECT p_partkey, p_name FROM part WHERE lower(p_name) LIKE 'b%'
  UNION ALL SELECT p_partkey, p_name FROM part WHERE lower(p_name) LIKE 'c%'
  UNION ALL SELECT p_partkey, p_name FROM part WHERE lower(p_name) LIKE 'bl%'
  UNION ALL SELECT p_partkey, p_name FROM part WHERE lower(p_name) LIKE 'co%'
)
SELECT count(*) AS n_unique, min(p_partkey) AS min_key, max(p_partkey) AS max_key
FROM (SELECT DISTINCT p_partkey FROM crawled)
"""


QUERIES: dict[str, Query] = {
    "stats_topk": Query(q_stats_topk, ORACLE_STATS_TOPK,
                        "A1/J1/O3 top-k dims by fact count", ("lineitem", "part")),
    "search_substring": Query(q_search_substring, ORACLE_SEARCH_SUBSTRING,
                              "P3/O1/O2 ilike search ordered+capped", ("part",)),
    "keyed_scan": Query(q_keyed_scan, ORACLE_KEYED_SCAN,
                        "P2/O1 point-key ordered scan", ("lineitem", "orders")),
    "orphan_count": Query(q_orphan_count, ORACLE_ORPHAN_COUNT,
                          "J2/A3 anti-join quality count", ("customer", "orders")),
    "quality_metrics": Query(q_quality_metrics, ORACLE_QUALITY_METRICS,
                             "A2/P4 conditional-count quality probes", ("lineitem",)),
    "top_customer_per_nation": Query(q_top_customer_per_nation, ORACLE_TOP_CUSTOMER_PER_NATION,
                                     "W2/A7 top-1 per group", ("customer",)),
    "order_sequence": Query(q_order_sequence, ORACLE_ORDER_SEQUENCE,
                            "W1 row_number sequence within group", ("orders",)),
    "segment_totals": Query(q_segment_totals, ORACLE_SEGMENT_TOTALS,
                            "A5/J3 broadcast-join group totals", ("orders", "customer")),
    "relevance_search": Query(q_relevance_search, ORACLE_RELEVANCE_SEARCH,
                              "P6/F10/O4 weighted relevance search", ("part",)),
    "prefix_crawl": Query(q_prefix_crawl, ORACLE_PREFIX_CRAWL,
                          "S3/O7/A6 prefix-union crawl + dedup", ("part",)),
}
