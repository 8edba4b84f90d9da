from comix_etl_spark.plans.queries import QUERIES, Query  # noqa: F401
