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

__all__ = [
    "heavy_hitters_approx",
    "cms_build", "cms_estimate", "cms_estimate_sql",
    "kmv_sketch", "kmv_overlap_cols", "kmv_sketch_sql", "kmv_overlap_sql",
]

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
    # NULLs dropped like cms_build: Spark's concat-NULL hash would miss
    # every counter (est 0) while DuckDB's concat SKIPS NULL args and
    # hashes the bare salt to real cells — neither is a frequency of
    # anything, so NULL probes are out of the contract on both sides
    probe = queries.filter(F.col(col).isNotNull()).select(
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
            FROM (SELECT {col}, {rc_sql(col)} FROM {query_from}
                  WHERE {col} IS NOT NULL))
        SELECT p.{col},
               min(coalesce(s._count, 0))::BIGINT AS est_count
        FROM _probe p
        LEFT JOIN _cms s ON s._row = p._row AND s._col = p._col
        GROUP BY p.{col}"""


# ---------------------------------------------------------------------------
# KMV (K-Minimum-Values) set sketch (Bar-Yossef et al. 2002; the
# Jaccard/union estimators are Beyer et al. SIGMOD'07): a set's k
# smallest hash values summarize it for CARDINALITY and OVERLAP
# estimation — the triage tool for "how much do these corpus
# shards/sources/snapshots overlap" WITHOUT the exact distinct join.
# k·8 bytes per set regardless of set size; sketches of unions are
# merge-then-truncate (a monoid, like every summary in this family).
# Hash spec shared with the DuckDB twin via sampling.hash_unit.
# ---------------------------------------------------------------------------

KMV_DEFAULT_K = 64


def kmv_sketch(df: DataFrame, keys: list[str], value_col: str,
               k: int = KMV_DEFAULT_K, salt: str = "kmv") -> DataFrame:
    """Per-``keys``-group KMV sketch of the DISTINCT ``value_col``
    values (NULLs dropped): one sorted ``array<bigint>`` of ≤k minimum
    32-bit hashes per group.  Shape: distinct → per-group rank ≤ k →
    one tiny collect per group (bounded at k elements by construction —
    never an unbounded collect_set).  The rank's per-group sort spills
    and truncates streaming; pre-aggregating per-partition minima first
    is the wide-group optimization, not needed until a group's distinct
    count dwarfs a partition."""
    from pyspark.sql import Window

    from frames_map_reduce_spark.operators.sampling import hash_unit

    if k < 2:
        raise ValueError(f"need k >= 2, got {k}")
    require_columns(df, [*keys, value_col])
    h = hash_unit(F.col(value_col), salt)
    d = (df.filter(F.col(value_col).isNotNull())
           .select(*keys, h.alias("_h")).distinct())
    part = [F.col(c) for c in keys] if keys else [F.lit(1)]
    w = Window.partitionBy(*part).orderBy("_h")
    ranked = d.withColumn("_rn", F.row_number().over(w)) \
              .filter(F.col("_rn") <= k)
    gb = ranked.groupBy(*keys) if keys else ranked.groupBy()
    return gb.agg(F.sort_array(F.collect_list("_h")).alias("kmv"))


def kmv_overlap_cols(a, b, k: int = KMV_DEFAULT_K) -> dict:
    """Overlap estimators for two joined KMV arrays ``a``/``b``: the
    combined k-min trick — take the k smallest of the union; the share
    of those present in BOTH sketches estimates Jaccard.  All array
    ops over ≤2k elements, pure expressions.

    Empty-sketch guard (r7 ADVICE): both sketches empty → the union has
    0 elements and the estimate is NULL (not an ANSI division-by-zero
    error).  NOTE the cross-engine asymmetry when building that case:
    ``kmv_sketch`` over an EMPTY group on Spark returns ``[]``
    (``collect_list``), while DuckDB's ``list()`` aggregate returns
    NULL — a twin replaying an empty reference set must
    ``coalesce(kmv, [])`` before these expressions."""
    merged = F.slice(F.array_sort(F.array_union(a, b)), 1, k)
    matches = F.size(F.filter(
        merged, lambda x: F.array_contains(a, x) & F.array_contains(b, x)))
    kk = F.size(merged)
    return {
        "kmv_matches": matches.cast("bigint"),
        "kmv_k": kk.cast("bigint"),
        "est_jaccard": F.when(kk > 0, F.round(matches / kk, 6)),
    }


def kmv_sketch_sql(from_body: str, keys: list[str], value_col: str,
                   k: int = KMV_DEFAULT_K, salt: str = "kmv") -> str:
    """DuckDB twin of :func:`kmv_sketch` (same salted hash, same
    distinct→rank→sorted-list staging).  ``keys=[]`` yields one row."""
    from frames_map_reduce_spark.operators.sampling import hash_unit_sql
    key_sel = (", ".join(keys) + ",") if keys else ""
    key_grp = f"GROUP BY {', '.join(keys)}" if keys else ""
    part = f"PARTITION BY {', '.join(keys)}" if keys else ""
    return f"""(
        SELECT {key_sel} list_sort(list(_h)) AS kmv
        FROM (
            SELECT {key_sel} _h,
                   row_number() OVER ({part} ORDER BY _h) AS _rn
            FROM (SELECT DISTINCT {key_sel}
                         {hash_unit_sql(value_col, salt)} AS _h
                  FROM {from_body}
                  WHERE {value_col} IS NOT NULL))
        WHERE _rn <= {k} {key_grp})"""


def kmv_overlap_sql(a: str, b: str, k: int = KMV_DEFAULT_K) -> dict:
    """DuckDB twins of :func:`kmv_overlap_cols` over joined list
    columns ``a``/``b``.  Same empty-union guard (explicit CASE, not
    DuckDB's silent NULL-on-division-by-zero); see the empty-sketch
    NULL-vs-[] note on :func:`kmv_overlap_cols` — replaying an empty
    reference set needs ``coalesce({a}, [])`` upstream of these."""
    merged = f"list_slice(list_sort(list_distinct(list_concat({a}, {b}))), 1, {k})"
    matches = (f"len(list_filter({merged}, "
               f"x -> list_contains({a}, x) AND list_contains({b}, x)))")
    kk = f"len({merged})"
    return {
        "kmv_matches": f"{matches}::BIGINT",
        "kmv_k": f"{kk}::BIGINT",
        "est_jaccard": (f"CASE WHEN {kk} > 0 THEN "
                        f"round({matches} * 1.0 / {kk}, 6) END"),
    }
