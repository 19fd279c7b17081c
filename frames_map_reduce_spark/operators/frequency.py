"""Approximate heavy hitters: a mergeable Misra-Gries / Space-Saving
sketch over a column, Spark-shaped.

Exact frequency counting (``groupBy(col).count()``) shuffles one row per
DISTINCT value — fine for token tables, ruinous when the value domain is
huge (URLs, n-grams, join keys under skew diagnosis).  The classic
answer is a bounded-memory frequency sketch per partition merged into a
global summary (Misra-Gries 1982; the merge analysis is Agarwal et al.,
"Mergeable Summaries", PODS'12): memory is ``capacity`` counters per
partition and the shuffle carries ≤ partitions × capacity rows,
independent of the number of distinct values.

Guarantee (the accountability contract the driver query pins): with
``err_p`` the total count pruned in partition p, for EVERY value
``est ≤ true ≤ est + Σ_p err_p`` — estimates never overcount, and the
undercount is bounded by the published ``total_err``.  Per partition
``err_p ≤ N_p / capacity``, so the bound tightens linearly with
capacity.

Spark shape: one ``mapInPandas`` pass builds the per-partition summary
(pandas ``value_counts`` per Arrow batch, dict merge, batch prune — no
per-row Python), a JVM ``groupBy(sum)`` merges summaries, and the
global top-k lowers to ``TakeOrderedAndProject``.  The reference engine
has no sketch surface (SURVEY §2.8); this completes the sketch-fold
family next to HLL cardinality (folds.approx_count_distinct) and GK
quantiles (folds.approx_quantiles): cardinality / quantiles / frequency.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frames_map_reduce_spark.schema import require_columns

__all__ = ["heavy_hitters_approx"]

#: marker row per partition carrying its pruned-mass total; NULL value
#: rows cannot collide with data because NULL values are dropped first.
_ERR_MARKER = None


def _mg_partition(col: str, capacity: int):
    """Per-partition Misra-Gries summary as a mapInPandas function.

    Batch-pruning form: merge exact per-batch counts into a dict; when
    the dict exceeds ``capacity``, subtract the (size-capacity)-th
    smallest count from everyone and drop the non-positive — one vector
    op per overflow, amortized O(batch) instead of the textbook
    decrement-per-arrival loop.  The subtracted total is the
    partition's pruned mass ``err``.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        err = 0
        for pdf in batches:
            vc = pdf[col].dropna().value_counts()
            for v, c in vc.items():
                counts[v] = counts.get(v, 0) + int(c)
            if len(counts) > capacity:
                ser = pd.Series(counts)
                cut = int(ser.nsmallest(len(counts) - capacity).iloc[-1])
                ser = ser - cut
                # pruned mass = Σ_v min(orig_v, cut) = cut·|ser| + Σ s≤0
                err += cut * len(ser) + int(ser[ser <= 0].sum())
                counts = ser[ser > 0].astype(int).to_dict()
        out = pd.DataFrame(
            {col: list(counts) + [_ERR_MARKER],
             "est": list(counts.values()) + [0],
             "err": [0] * len(counts) + [err]})
        yield out.astype({"est": "int64", "err": "int64"})

    return fn


def heavy_hitters_approx(df: DataFrame, col: str, k: int,
                         capacity: int = 1024) -> DataFrame:
    """Top-``k`` values of ``col`` by approximate count.

    Returns ``(col, est, lower, upper)`` — ``est`` never exceeds the
    true count and ``upper = est + total pruned mass`` never undercuts
    it, so ``true ∈ [est, upper]`` deterministically (not just with
    high probability; the Misra-Gries bound is worst-case).  ``lower``
    is ``est`` spelled out for self-describing output.

    Memory: ``capacity`` counters per partition; shuffle:
    ≤ partitions × capacity + partitions rows.  Undercount bound is
    ``Σ_p N_p / capacity`` — size ``capacity`` to the error you can
    tolerate relative to the counts you care about, and remember the
    bound is over PARTITIONS: fewer, larger partitions tighten it.
    """
    require_columns(df, [col])
    if k <= 0 or capacity <= 0:
        raise ValueError("k and capacity must be positive")
    dtype = df.schema[col].dataType.simpleString()
    # any ATOMIC type works: the sketch only needs hashable values with a
    # total order for the deterministic tie-break (string, integers,
    # floats, boolean, date, timestamp, ... — cast-free).  Complex types
    # have no meaningful frequency identity here and pandas can't hash
    # them — reject loudly.
    if dtype.startswith(("array<", "map<", "struct<")):
        raise ValueError(
            f"heavy_hitters_approx needs an atomic column; {col} is "
            f"{dtype} — project a scalar key first")
    from pyspark.sql import types as T
    # nullable copy of the value field: the per-partition pruned-mass
    # marker row carries NULL in the value slot even for non-null inputs
    out_schema = T.StructType([
        T.StructField(col, df.schema[col].dataType, True),
        T.StructField("est", T.LongType()),
        T.StructField("err", T.LongType())])
    summaries = df.select(col).mapInPandas(
        _mg_partition(col, capacity), schema=out_schema)
    merged = (summaries.groupBy(col)
                       .agg(F.sum("est").alias("est"),
                            F.sum("err").alias("err")))
    total_err = (merged.filter(F.col(col).isNull())
                       .select(F.sum("err").alias("_total_err")))
    top = (merged.filter(F.col(col).isNotNull())
                 .crossJoin(F.broadcast(total_err))
                 .select(col, "est",
                         F.col("est").alias("lower"),
                         (F.col("est") + F.coalesce("_total_err", F.lit(0)))
                         .alias("upper"))
                 .orderBy(F.col("est").desc(), col)
                 .limit(k))
    return top


# ---------------------------------------------------------------------------
# Count-Min Sketch (Cormode & Muthukrishnan 2005): bounded-memory point
# FREQUENCY estimation, the structure next to Misra-Gries above (MG
# answers "who is heavy", CMS answers "how often is THIS value" for any
# value, with est >= true always and est <= true + eps·N w.h.p.).  The
# d×w counter matrix is a MONOID (element-wise sum), so sketches of
# corpus shards/days union by appending counter rows and summing at
# read time — the same append-only lifecycle as the Bloom word table.
# Hash spec shared with the DuckDB twin via sampling.hash_unit: one
# salted md5 per (value, row), col = h % w — all integer, engine-exact.
# ---------------------------------------------------------------------------

CMS_DEFAULT_W = 1 << 12
CMS_DEFAULT_D = 4


def _cms_check(w: int, d: int) -> None:
    if w < 2 or d < 1 or d > 16:
        raise ValueError(f"need w >= 2 and 1 <= d <= 16, got w={w} d={d}")


def _cms_cols(value, w: int, d: int) -> "F.Column":
    """array of the d column indices of ``value`` (row r uses salt
    'cms{r}')."""
    from frames_map_reduce_spark.operators.sampling import hash_unit
    return F.array(*[hash_unit(value, f"cms{r}") % w for r in range(d)])


def cms_build(df: DataFrame, col: str, w: int = CMS_DEFAULT_W,
              d: int = CMS_DEFAULT_D) -> DataFrame:
    """Count-Min sketch of ``df[col]`` (NULLs dropped) as counter rows
    ``(_row, _col, _count)`` — ≤ d·w rows REGARDLESS of the distinct
    count (the point of the sketch: a trillion-distinct token stream
    summarizes into d·w counters).  One posexplode + one 2-phase
    groupBy; map-side combine does the heavy counting.  Shard sketches
    union-all into one frame; :func:`cms_estimate` sums generations at
    read time (monoid)."""
    _cms_check(w, d)
    require_columns(df, [col])
    pos = df.filter(F.col(col).isNotNull()).select(
        F.posexplode(_cms_cols(F.col(col), w, d)).alias("_row", "_col"))
    return (pos.groupBy("_row", "_col")
               .agg(F.count(F.lit(1)).cast("bigint").alias("_count")))


def cms_estimate(sketch: DataFrame, queries: DataFrame, col: str,
                 w: int = CMS_DEFAULT_W, d: int = CMS_DEFAULT_D) -> DataFrame:
    """Point-frequency estimates for ``queries[col]``: est = min over
    the d counters each value hashes to (0 if any counter row is
    absent).  ``est >= true`` always; the overcount is the usual CMS
    collision mass.  The sketch side is ≤ d·w rows — broadcastable at
    any corpus scale (AQE picks broadcast; the QUERY side never
    shuffles more than d rows per probe value)."""
    _cms_check(w, d)
    require_columns(queries, [col])
    probe = queries.select(
        F.col(col),
        F.posexplode(_cms_cols(F.col(col), w, d)).alias("_row", "_col"))
    merged = sketch.groupBy("_row", "_col") \
                   .agg(F.sum("_count").alias("_count"))
    return (probe.join(merged, ["_row", "_col"], "left")
                 .groupBy(col)
                 .agg(F.min(F.coalesce(F.col("_count"), F.lit(0)))
                       .cast("bigint").alias("est_count")))


def cms_estimate_sql(corpus_from: str, query_from: str, col: str,
                     w: int = CMS_DEFAULT_W, d: int = CMS_DEFAULT_D) -> str:
    """DuckDB twin of build→estimate in one statement — same salted-md5
    column indices (hash_unit_sql), same min-over-counters, so
    estimates INCLUDING collision overcounts reproduce bit-for-bit."""
    from frames_map_reduce_spark.operators.sampling import hash_unit_sql
    _cms_check(w, d)

    def rc_sql(value: str) -> str:
        # DuckDB has no WITH ORDINALITY: carry the row index inside a
        # struct list and unnest recursively
        parts = ", ".join(
            f"{{'r': {r}, 'c': {hash_unit_sql(value, f'cms{r}')} % {w}}}"
            for r in range(d))
        return f"unnest([{parts}], recursive := true)"

    return f"""
        WITH _cms AS (
            SELECT r AS _row, c AS _col, count(*)::BIGINT AS _count
            FROM (SELECT {rc_sql(col)} FROM {corpus_from}
                  WHERE {col} IS NOT NULL)
            GROUP BY 1, 2),
        _probe AS (
            SELECT {col}, r AS _row, c AS _col
            FROM (SELECT {col}, {rc_sql(col)} FROM {query_from}))
        SELECT p.{col},
               min(coalesce(s._count, 0))::BIGINT AS est_count
        FROM _probe p
        LEFT JOIN _cms s ON s._row = p._row AND s._col = p._col
        GROUP BY p.{col}"""
