"""Skew mitigation: salting for hot keys.

Two places skew kills a 100 TB job:

- **Aggregation** over a key where a few values dominate.  Map-side
  partial aggregation (automatic for our FoldReduce) already collapses
  per-partition duplicates, but a single reducer still owns each hot
  key's final merge.  :func:`salted_aggregate` splits each key into
  ``salts`` sub-keys for the first (heavy) pass and re-merges the small
  partials in a second pass — two shuffles of sharply decreasing size.

- **Joins** on a skewed key.  AQE's skew-join splitting
  (``spark.sql.adaptive.skewJoin``, on by default in our session) handles
  sort-merge joins at runtime; :func:`salted_join` is the explicit
  fallback for when the skewed side must hash-join: the big side gets a
  random-ish (deterministic) salt, the small side is replicated
  ``salts``× so every salted partition finds its match.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from frames_map_reduce_spark.schema import require_columns

# (partial expr builder, final expr builder) per re-aggregable fold kind
_DECOMP = {
    "sum":   (lambda c: F.sum(c),          lambda p: F.sum(p)),
    "count": (lambda c: F.count(c),        lambda p: F.sum(p)),
    "min":   (lambda c: F.min(c),          lambda p: F.min(p)),
    "max":   (lambda c: F.max(c),          lambda p: F.max(p)),
}


def salted_aggregate(df: DataFrame, keys: Sequence[str],
                     spec: dict[str, tuple[str, str]],
                     salts: int = 16) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``spec``: out_name → (kind, column) with kind in sum/count/min/max/
    mean/count_star.  mean decomposes into sum+count internally; anything
    non-decomposable doesn't belong here (use a plain FoldReduce — the
    hot key then costs what it costs).

    The salt is deterministic (hash of the whole row mod ``salts``) so
    re-runs produce identical partials."""
    require_columns(df, keys)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salts))

    partials, finals = [], []
    for out, (kind, col) in spec.items():
        if kind == "mean":
            partials += [F.sum(col).alias(f"_s_{out}"), F.count(col).alias(f"_c_{out}")]
            finals.append(F.try_divide(F.sum(f"_s_{out}"), F.sum(f"_c_{out}")).alias(out))
        elif kind == "count_star":
            partials.append(F.count(F.lit(1)).alias(f"_p_{out}"))
            finals.append(F.sum(f"_p_{out}").alias(out))
        elif kind in _DECOMP:
            part, fin = _DECOMP[kind]
            partials.append(part(F.col(col)).alias(f"_p_{out}"))
            finals.append(fin(F.col(f"_p_{out}")).alias(out))
        else:
            raise ValueError(f"non-decomposable fold kind {kind!r} for {out!r}")

    stage1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partials)
    return stage1.groupBy(*keys).agg(*finals)


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salts: int = 8, how: str = "inner") -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side.

    Row multiplication is ``salts``× of the SMALL side only — bounded and
    chosen by the caller.  Use when the big side's join key is hot enough
    that one task would own a partition-sized key (and a broadcast of
    ``small`` is too large — otherwise just broadcast).

    Only ``inner`` and ``left`` joins are supported: under right/full an
    unmatched small-side row would surface once per replica (``salts``
    duplicate null-extended rows), which is silently wrong."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            f"outer variants would emit each unmatched small-side row "
            f"once per salt replica")
    require_columns(big, [key])
    require_columns(small, [key])
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salts)))
    small_rep = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1))))
    out = big_salted.join(small_rep, on=[key, "_salt"], how=how)
    return out.drop("_salt")
