"""Vector expression helpers over ``array<float/double>`` columns.

All pure Column expressions (``zip_with`` / ``aggregate`` / ``transform``)
— the dot products run JVM-side inside codegen, which is what makes
brute-force similarity viable as a baseline at scale.  DuckDB-SQL
twins are provided for the differential oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def cosine_sql(a: str, b: str) -> str:
    """DuckDB twin.  Explicit double-precision dot/norms (not
    list_cosine_similarity) so both engines do the same arithmetic."""
    d = f"list_sum(list_transform(list_zip({a}, {b}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    na = f"sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    nb = f"sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    return f"({d} / nullif({na} * {nb}, 0.0))"


def srp_signature(a: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection LSH signature: one bit per hyperplane,
    packed into a BIGINT bucket id.  ``planes`` is a small fixed list of
    random unit vectors (broadcast as literals into the plan), so the
    bucketing is a pure per-row expression — no shuffle, no UDF."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(a, plane) >= 0, F.lit(1)).otherwise(F.lit(0))
        bits.append(bit * F.lit(2 ** i))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("bigint")
