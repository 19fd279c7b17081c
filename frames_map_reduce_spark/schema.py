"""Runtime schema validation — the stand-in for the reference's type-level
schema arithmetic.

The reference checks schema compatibility at *compile time* via type-level
lists: subset ``ks ⊆ rs`` (reference src/Frames/MapReduce.hs:130), append
``ks ++ cs`` (:156), set difference ``RDeleteAll ks rs`` (:138), and
disjointness ``Disjoint a b ~ 'True`` (src/Frames/Aggregation.hs:65).
Python cannot do that, so this module reproduces the "fail before running"
property with eager checks at plan-build time: every operator validates its
column arguments against the DataFrame schema before any job is launched.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import types as T

NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


class SchemaError(ValueError):
    """Raised at plan-build time when column arguments don't fit the schema."""


def require_columns(df: DataFrame, cols: Sequence[str], what: str = "column") -> None:
    """``ks ⊆ rs`` — every name in ``cols`` must exist in ``df``."""
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise SchemaError(
            f"{what}(s) {missing} not in schema {df.columns}"
        )


def require_disjoint(a: Sequence[str], b: Sequence[str], what: str = "column sets") -> None:
    """``Disjoint a b`` (reference src/Frames/Aggregation.hs:65)."""
    overlap = sorted(set(a) & set(b))
    if overlap:
        raise SchemaError(f"{what} must be disjoint but share {overlap}")


def complement(df: DataFrame, cols: Sequence[str]) -> list[str]:
    """``RDeleteAll ks rs`` — schema order preserved (reference
    src/Frames/MapReduce.hs:138)."""
    require_columns(df, cols)
    drop = set(cols)
    return [c for c in df.columns if c not in drop]


def numeric_columns(df: DataFrame, among: Sequence[str] | None = None) -> list[str]:
    """Columns whose Spark type is numeric — the runtime analog of the
    ``@Num`` constraint in ``foldAllConstrained @Num`` (reference
    src/Frames/Folds.hs:219-225)."""
    names = list(among) if among is not None else df.columns
    require_columns(df, names)
    by_name = {f.name: f.dataType for f in df.schema.fields}
    return [c for c in names if isinstance(by_name[c], NUMERIC_TYPES)]


def require_numeric(df: DataFrame, cols: Sequence[str]) -> None:
    """Dtype check standing in for the constraint-satisfaction the reference
    gets from GHC: raise if any of ``cols`` is non-numeric."""
    numeric = set(numeric_columns(df, cols))
    bad = [c for c in cols if c not in numeric]
    if bad:
        by_name = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        raise SchemaError(
            f"columns {bad} are not numeric: " + str({c: by_name[c] for c in bad})
        )
