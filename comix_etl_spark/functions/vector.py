"""Vector column functions (embedding similarity) — JVM-side, no UDFs.

For `array<float>` embedding columns. At 100 TB scale the hot path
(dot products inside a top-k or LSH-bucketed join) must stay in codegen:
``F.zip_with`` + ``F.aggregate`` compile to Catalyst higher-order
functions over the array, no Python round-trip, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ a_i * b_i in double precision, sequential over the array order."""
    prods = F.zip_with(_col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    """L2 norm in double precision."""
    return F.sqrt(F.aggregate(_col(a), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either norm is zero."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))


def random_hyperplane_bits(a: Column | str, planes: list[list[float]]) -> Column:
    """SimHash-style signature: sign bits of dot products with fixed planes.

    ``planes`` is a deterministic list of hyperplanes (generated from a
    seeded RNG by the caller). Returns a bigint whose k-th bit is
    sign(a · planes[k]) — the LSH bucket key for approximate cosine search.
    """
    bits = F.lit(0).cast("long")
    for k, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(a, p) > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bits = bits + (bit * F.lit(2**k).cast("long"))
    return bits
