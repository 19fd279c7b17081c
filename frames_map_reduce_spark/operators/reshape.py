"""Reshape operators: pivot (long→wide) and unpivot (wide→long).

Beyond the reference's surface (SURVEY §2.8) but table stakes for an
analytics engine.  Scale notes: pivot with EXPLICIT values compiles to
conditional aggregates in ONE pass (no second job to discover the value
set — always pass ``values`` at 100 TB); unpivot is a pure per-row
``stack``, no shuffle at all.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frames_map_reduce_spark.folds import Fold
from frames_map_reduce_spark.schema import require_columns


def pivot_fold(df: DataFrame, keys: Sequence[str], pivot_col: str,
               values: Sequence[str], fold: Fold) -> DataFrame:
    """Group by ``keys``, spread ``pivot_col``'s (explicit) ``values``
    into columns, aggregate with the fold.  Output columns are
    ``<value>_<fold output>`` (or just ``<value>`` for single-output
    folds), deterministic order = values × fold outputs."""
    require_columns(df, [*keys, pivot_col])
    if not values:
        raise ValueError("pivot requires explicit values at scale "
                         "(a discovery pass over 100 TB is a full extra job)")
    return (df.groupBy(*keys)
              .pivot(pivot_col, list(values))
              .agg(*fold.columns()))


def unpivot(df: DataFrame, ids: Sequence[str], value_cols: Sequence[str],
            var_name: str = "variable", value_name: str = "value") -> DataFrame:
    """Wide→long: one output row per (row, value column).  Pure per-row
    expression (``stack``), no shuffle."""
    require_columns(df, [*ids, *value_cols])
    n = len(value_cols)
    stack_args = ", ".join(f"'{c}', `{c}`" for c in value_cols)
    return df.select(
        *ids,
        F.expr(f"stack({n}, {stack_args}) AS ({var_name}, {value_name})"))
