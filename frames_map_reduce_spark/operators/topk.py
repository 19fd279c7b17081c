"""Top-k per group — the scale-path counterpart to the grouped-map reduce.

``make_recs_with_key`` (reference makeRecsWithKey) can express top-k, but
it ships every group to Python.  When the per-group function IS a top-k,
this native form stays entirely in the JVM: window ``row_number`` with
map-side partial aggregation of nothing — Spark's sort-based window only
shuffles (key, order-cols, payload) once and never materializes a group
in memory.  Use the grouped-map form only for logic a window can't say.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from frames_map_reduce_spark.schema import require_columns


def top_k_per_group(df: DataFrame, keys: Sequence[str],
                    order_by: Sequence[Column], k: int,
                    payload: Sequence[str] | None = None,
                    rank_col: str | None = None) -> DataFrame:
    """Deterministic top-k rows per key group.

    ``order_by`` must totally order rows (include id tiebreaks) or the
    result is nondeterministic across runs — same convention as the
    oracle comparisons."""
    require_columns(df, keys)
    w = Window.partitionBy(*keys).orderBy(*order_by)
    out_cols = list(keys) + [c for c in (payload or df.columns) if c not in keys]
    ranked = df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    if rank_col:
        ranked = ranked.withColumn(rank_col, F.col("_rn").cast("bigint"))
        out_cols.append(rank_col)
    return ranked.select(*out_cols)
