"""Temporal joins Spark lacks natively: as-of join and range (interval)
join, expressed Spark-first as compositions of existing DataFrame ops —
no Python in the hot path, no theta-join.

These are the canonical "custom operator the engine doesn't ship"
examples for a time-series/training-data pipeline (the reference library
is a fold engine with no joins at all — SURVEY §2.8 extension surface).

Scale design:

- ``as_of_join`` is the union-marker/window rendering: both sides union
  into one frame, ONE shuffle on the ``by`` keys, and a running
  ``last(..., ignorenulls)`` window carries the most recent right-side
  row forward onto each left row.  No per-key driver loops, no range
  self-join; cost is a sort within each key partition — the same shape
  Spark uses for any window, so AQE/skew handling apply as usual.
- ``range_join`` buckets time so the pair generation is a key-EQUALITY
  join: each interval explodes into the fixed-width buckets it covers,
  each point lands in exactly one bucket, so every qualifying
  (point, interval) pair meets exactly once (no distinct needed) and the
  residual ``BETWEEN`` filter runs post-join.  Quadratic blow-up is
  impossible unless many intervals overlap the same bucket, which
  ``max_span_buckets`` + bucket sizing control.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from frames_map_reduce_spark.schema import require_columns


def _interval_us(spec: str) -> str:
    """SQL expression for the length of ``INTERVAL <spec>`` in
    microseconds (Spark cannot ``extract(epoch ...)`` from day-time
    intervals; adding to the epoch and taking unix_micros is
    timezone-independent)."""
    return (f"unix_micros(cast('1970-01-01 00:00:00Z' AS TIMESTAMP)"
            f" + INTERVAL {spec})")


def as_of_join(left: DataFrame, right: DataFrame, ts_col: str,
               by_cols: Sequence[str], value_cols: Sequence[str],
               tolerance: str | None = None,
               suffix: str = "_right",
               direction: str = "backward",
               time_slice: str | None = None) -> DataFrame:
    """As-of join: each left row picks up ``value_cols`` from the
    nearest right row with the same ``by_cols`` — the most recent with
    right.ts ≤ left.ts (``direction="backward"``, the default;
    inclusive, DuckDB/pandas ``merge_asof`` semantics) or the next with
    right.ts ≥ left.ts (``direction="forward"``, pandas
    ``merge_asof(direction='forward')`` / DuckDB ``ASOF ... ON l.ts <=
    r.ts``).  Forward is the same single-shuffle union-marker plan with
    the scan order reversed.

    Left rows keep ALL their columns; matched right values arrive as
    ``<name><suffix>`` plus ``<ts_col><suffix>`` (the matched right
    timestamp, NULL when no match).  ``tolerance`` (e.g. ``"1 hour"``)
    nulls out matches older than the interval, like pandas
    ``merge_asof(tolerance=...)``.

    Ties: among right rows sharing an exact (by, ts) the carried row is
    the last in sort order — deduplicate the right side first if that
    matters (the driver query does).

    Implementation: union-marker + running ``last(struct, ignorenulls)``
    window.  Right values are packed into ONE struct before the window so
    a legitimately-NULL right value column cannot make ``ignorenulls``
    skip back to an older row.

    Skew: the default window funnels each ``by`` key through ONE task —
    fine for high-cardinality keys, a straggler when a few keys carry
    most rows (market data with one hot symbol).  ``time_slice`` (e.g.
    ``"1 day"``) re-partitions the window by ``(by, coarse time bucket)``
    so a hot key parallelizes across its time range: the in-slice window
    matches right rows within the bucket, and cross-bucket carryover
    comes from a SKINNY per-(key, slice) boundary frame (one row per
    populated slice, running-carried with a strictly-before-this-slice
    window over slices, not rows).  Semantics are identical to the
    unsliced path wherever the right side has unique ``(by, ts)`` rows
    (fuzz-pinned); among exact duplicates the carried row is arbitrary on
    both paths.
    """
    require_columns(left, [ts_col, *by_cols])
    require_columns(right, [ts_col, *by_cols, *value_cols])
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be 'backward' or 'forward', got {direction!r}")

    rv = F.struct(F.col(ts_col).alias("_rts"),
                  *[F.col(c) for c in value_cols])
    rhs = right.select(*by_cols, ts_col, rv.alias("_rv"),
                       F.lit(0).alias("_side"))
    lhs = left.withColumn("_side", F.lit(1)) \
              .withColumn("_rv", F.lit(None).cast(rhs.schema["_rv"].dataType))
    both = lhs.unionByName(rhs, allowMissingColumns=True)

    # right rows (_side=0) sort BEFORE left rows at the same timestamp, so
    # an equal-ts right row is visible to the left row (inclusive match);
    # forward scans time reversed, carrying the NEXT right row backward
    ts_order = F.col(ts_col).asc() if direction == "backward" \
        else F.col(ts_col).desc()

    if time_slice is None:
        w = (Window.partitionBy(*by_cols)
                   .orderBy(ts_order, F.col("_side").asc())
                   .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        carried = both.withColumn(
            "_m", F.last("_rv", ignorenulls=True).over(w)) \
            .filter(F.col("_side") == 1)
    else:
        # integer bucket id: monotone in ts, identical on both sides —
        # where the cut lands is irrelevant, only consistency matters
        slice_expr = F.expr(
            f"unix_micros(`{ts_col}`) div ({_interval_us(time_slice)})")
        both = both.withColumn("_slice", slice_expr)
        w = (Window.partitionBy(*by_cols, "_slice")
                   .orderBy(ts_order, F.col("_side").asc())
                   .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        in_slice = both.withColumn(
            "_m", F.last("_rv", ignorenulls=True).over(w)) \
            .filter(F.col("_side") == 1)
        # boundary value entering each slice: per populated (by, slice)
        # the extreme right row, then a running carry over SLICES
        # (strictly before the current one — in-slice rows are already
        # handled above).  The frame is one row per (key, populated
        # slice): windowing it per key is cheap regardless of data skew.
        if direction == "backward":
            per_slice = (both.filter(F.col("_side") == 0)
                             .groupBy(*by_cols, "_slice")
                             .agg(F.max_by("_rv", F.col(ts_col))
                                   .alias("_rv_edge")))
            slice_order = F.col("_slice").asc()
        else:
            per_slice = (both.filter(F.col("_side") == 0)
                             .groupBy(*by_cols, "_slice")
                             .agg(F.min_by("_rv", F.col(ts_col))
                                   .alias("_rv_edge")))
            slice_order = F.col("_slice").desc()
        spine = (both.select(*by_cols, "_slice").distinct()
                     .join(per_slice, [*by_cols, "_slice"], "left"))
        wb = (Window.partitionBy(*by_cols).orderBy(slice_order)
                    .rowsBetween(Window.unboundedPreceding, -1))
        bounds = spine.withColumn(
            "_b", F.last("_rv_edge", ignorenulls=True).over(wb)) \
            .select(*by_cols, "_slice", "_b")
        carried = (in_slice.join(bounds, [*by_cols, "_slice"], "left")
                           .withColumn("_m", F.coalesce("_m", "_b")))

    if tolerance is not None:
        tol_us = F.expr(_interval_us(tolerance))
        age = (F.unix_micros(F.col(ts_col))
               - F.unix_micros(F.col("_m._rts")))
        in_tol = (age <= tol_us) if direction == "backward" \
            else (-age <= tol_us)
        carried = carried.withColumn(
            "_m", F.when(in_tol, F.col("_m")))

    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col(f"_m._rts").alias(f"{ts_col}{suffix}"))
    out_cols.extend(F.col(f"_m.{c}").alias(f"{c}{suffix}")
                    for c in value_cols)
    return carried.select(*out_cols)


def range_join(points: DataFrame, intervals: DataFrame, point_ts: str,
               start_col: str, end_col: str, by_cols: Sequence[str] = (),
               bucket: str = "1 hour",
               max_span_buckets: int = 1000) -> DataFrame:
    """Inner join of point rows onto every interval row containing them:
    ``start ≤ ts ≤ end`` (and equal ``by_cols``), WITHOUT a theta-join.

    Buckets of width ``bucket`` turn containment into key equality: an
    interval registers under each bucket it covers, a point under exactly
    one, so the equi-join meets each qualifying pair exactly once and the
    exact BETWEEN predicate filters residuals.  Intervals spanning more
    than ``max_span_buckets`` buckets raise (size the bucket to your data
    instead of silently exploding); conflicting column names on the
    interval side must be resolved by the caller (checked).

    Returns points' columns + intervals' columns.
    """
    require_columns(points, [point_ts, *by_cols])
    require_columns(intervals, [start_col, end_col, *by_cols])
    overlap = (set(points.columns) & set(intervals.columns)) - set(by_cols)
    if overlap:
        raise ValueError(
            f"points/intervals share non-key columns {sorted(overlap)}; "
            "rename one side before range_join")

    step = f"({_interval_us(bucket)})"
    p_bkt = F.expr(f"unix_micros({point_ts}) div {step}")
    i_first = F.expr(f"unix_micros({start_col}) div {step}")
    i_last = F.expr(f"unix_micros({end_col}) div {step}")

    p = points.withColumn("_bkt", p_bkt)
    span_guard = F.when(
        i_last - i_first >= max_span_buckets,
        F.raise_error(F.lit(
            f"range_join: an interval spans >= {max_span_buckets} buckets "
            f"of {bucket}; use a coarser bucket or split the interval"))
    ).otherwise(i_last)
    i = intervals.withColumn(
        "_bkt", F.explode(F.sequence(i_first, span_guard)))

    joined = p.join(i, [*by_cols, "_bkt"]).filter(
        F.col(point_ts).between(F.col(start_col), F.col(end_col)))
    return joined.drop("_bkt")


# ---------------------------------------------------------------------------
# Rolling z-score anomaly detection (exact integer windowed moments)
# ---------------------------------------------------------------------------

#: fixed-point scale for rolling z-scores: values quantize to MILLI-units
#: before the windowed sums, so every windowed aggregate is a BIGINT —
#: order-independent and bit-identical cross-engine.  Milli (not micro)
#: keeps the sum-of-squares far from BIGINT overflow: |v| ≤ 1e6 milli
#: (a raw value of 1000) gives v² ≤ 1e12, and a 20-row window's
#: n·Σv² − (Σv)² stays ≤ ~1e15 ≪ 2^63, and ≪ 2^53 so the final cast to
#: DOUBLE is exact.
_Z_SCALE = 1_000


def rolling_zscore(df: DataFrame, value_col: str, ts_col: str,
                   key_cols: Sequence[str], tiebreak_col: str,
                   window: int = 20, min_periods: int = 8) -> DataFrame:
    """Trailing-window anomaly score: each row's value against the mean
    and standard deviation of the PREVIOUS ``window`` rows with the same
    keys (the row itself excluded, so a spike cannot dilute its own
    baseline) — the classic streaming/telemetry outlier gate.

    ``z = (x·n − s) / sqrt(n·ss − s²)`` over the milli-quantized trailing
    window (``n`` rows, ``s = Σv``, ``ss = Σv²``) — the algebraic
    expansion of ``(x − μ)/σ_pop`` that keeps every windowed aggregate a
    BIGINT sum.  The only float ops are the final ``sqrt`` and division,
    both IEEE correctly-rounded on exactly-representable integer inputs,
    so ``z`` is bit-identical under any partitioning and any engine and
    even DISCRETE decisions (``|z| ≥ cut``) are engine-stable — no
    windowed float accumulation (whose association order differs between
    Spark's sliding accumulator and DuckDB's segment tree) anywhere.

    Rows with fewer than ``min_periods`` trailing rows, or zero trailing
    variance, emit NULL ``z`` (insufficient baseline ≠ anomalous).

    Range contract (GUARDED at runtime): the widest intermediate is
    ``n·Σv² ≤ window²·v_milli²``, so the milli-quantized magnitude must
    satisfy ``|v_milli| ≤ isqrt(2⁶³−1) / window`` — at the default
    window 20 that is ~1.5·10⁸ milli ≈ raw |value| ~1.5·10⁵.  Any row
    beyond the bound raises a descriptive error from inside the plan
    (cheap codegen comparison, no extra pass) rather than relying on
    ANSI overflow — and NEVER silently wraps even on a non-ANSI
    session.  The DuckDB twin does NOT error in the overflow band (its
    ``sum(BIGINT)`` promotes to HUGEINT), which is exactly why the
    guard lives here: out-of-range input must fail loudly in Spark
    instead of silently disagreeing with (or outliving) the twin.
    Rescale such columns upstream; telemetry magnitudes live far inside
    the bound.

    Output: ``key_cols``..., ``ts_col``, ``tiebreak_col``, ``value_col``,
    ``n_window`` (BIGINT trailing-row count), ``z`` (DOUBLE).

    Scale shape: ONE shuffle on ``key_cols`` + a sort within each key
    partition — the standard Spark window shape, AQE/skew handling apply
    as usual.  The window frame is row-bounded, so state per key is
    O(window), never O(history).
    """
    require_columns(df, [value_col, ts_col, tiebreak_col, *key_cols])
    if window < 1 or min_periods < 2:
        raise ValueError("need window >= 1 and min_periods >= 2 "
                         f"(got {window}, {min_periods})")
    w = (Window.partitionBy(*key_cols)
               .orderBy(ts_col, tiebreak_col)
               .rowsBetween(-window, -1))
    # widest intermediate is n·Σv² ≤ window²·v²: guard the quantized
    # magnitude per row so overflow is a named error, not an ANSI trap
    # (and not a silent wrap on a non-ANSI session) — see Range contract.
    # The guard compares in DOUBLE space BEFORE the bigint cast: a raw
    # |value| beyond ~9.2e15 would otherwise hit the ANSI double→bigint
    # CAST_OVERFLOW inside the cast itself, bypassing the named message
    # (the extreme band was loud but anonymous); CaseWhen branches are
    # evaluated lazily, so the cast never sees an out-of-range (or NaN)
    # value.  double→double multiply overflow saturates to ±inf, which
    # the > comparison catches, so the named error covers the FULL
    # out-of-range band including magnitudes past double's own range.
    v_limit = math.isqrt(2**63 - 1) // window
    raw_limit = v_limit / _Z_SCALE
    dval = F.round(F.col(value_col).cast("double") * _Z_SCALE, 0)
    guarded = F.when(
        (F.abs(dval) > F.lit(float(v_limit))) | F.isnan(dval),
        F.raise_error(F.lit(
            f"rolling_zscore: |{value_col}| exceeds the overflow-safe "
            f"bound ~{raw_limit:.6g} at window={window} "
            f"(quantized limit {v_limit}), or is NaN; rescale the "
            f"column upstream or shrink the window"))
    ).otherwise(dval.cast("bigint"))
    base = df.select(*key_cols, ts_col, tiebreak_col, value_col,
                     guarded.alias("_v"))
    stats = base.select(
        *key_cols, ts_col, tiebreak_col, value_col, "_v",
        F.count("_v").over(w).alias("_n"),
        F.coalesce(F.sum("_v").over(w), F.lit(0)).alias("_s"),
        F.coalesce(F.sum(F.col("_v") * F.col("_v")).over(w), F.lit(0))
         .alias("_ss"))
    rad = F.col("_n") * F.col("_ss") - F.col("_s") * F.col("_s")
    z = F.when(
        (F.col("_n") >= min_periods) & (rad > 0),
        (F.col("_v") * F.col("_n") - F.col("_s")).cast("double")
        / F.sqrt(rad.cast("double")))
    return stats.select(*key_cols, ts_col, tiebreak_col, value_col,
                        F.col("_n").cast("bigint").alias("n_window"),
                        z.alias("z"))


def rolling_zscore_sql(table: str, value_col: str, ts_col: str,
                       key_cols: Sequence[str], tiebreak_col: str,
                       window: int = 20, min_periods: int = 8) -> str:
    """DuckDB twin of :func:`rolling_zscore` (differential oracle): the
    same milli-quantize → BIGINT windowed moments → one sqrt + one
    division staging, verbatim."""
    ks = ", ".join(key_cols)
    return f"""
        SELECT {ks}, {ts_col}, {tiebreak_col}, {value_col},
               _n::BIGINT AS n_window,
               CASE WHEN _n >= {min_periods}
                         AND _n * _ss - _s * _s > 0
                    THEN (_v * _n - _s)::DOUBLE
                         / sqrt((_n * _ss - _s * _s)::DOUBLE)
               END AS z
        FROM (SELECT {ks}, {ts_col}, {tiebreak_col}, {value_col}, _v,
                     count(_v) OVER w AS _n,
                     coalesce(sum(_v) OVER w, 0) AS _s,
                     coalesce(sum(_v * _v) OVER w, 0) AS _ss
              FROM (SELECT {ks}, {ts_col}, {tiebreak_col}, {value_col},
                           CAST(round({value_col} * {_Z_SCALE}, 0) AS BIGINT)
                               AS _v
                    FROM {table})
              WINDOW w AS (PARTITION BY {ks}
                           ORDER BY {ts_col}, {tiebreak_col}
                           ROWS BETWEEN {window} PRECEDING
                                    AND 1 PRECEDING))"""
