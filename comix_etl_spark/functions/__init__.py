"""Column-expression function libraries (the engine's scalar surface).

Everything here returns ``pyspark.sql.Column`` built from built-in
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd, Catalyst
optimizable. No row-at-a-time Python in the hot path.
"""

from comix_etl_spark.functions import scalar, text, vector  # noqa: F401
