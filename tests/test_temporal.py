"""As-of join and range join: semantics pinned against hand-computed
expectations and pandas.merge_asof, plan shape pinned to one shuffle /
key-equality join (no theta-join)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from frames_map_reduce_spark.operators.temporal import as_of_join, range_join


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [("A", _ts(9, 30), 1.0), ("A", _ts(10, 30), 2.0),
            ("A", _ts(12, 0), 3.0), ("B", _ts(9, 0), 10.0)]
    return spark.createDataFrame(rows, "sym string, ts timestamp, px double")


@pytest.fixture(scope="module")
def trades(spark):
    rows = [("A", _ts(10, 0), 5), ("A", _ts(10, 30), 6), ("A", _ts(11, 0), 7),
            ("B", _ts(8, 0), 8), ("C", _ts(10, 0), 9)]
    return spark.createDataFrame(rows, "sym string, ts timestamp, qty long")


def test_as_of_join_backward_inclusive(trades, quotes):
    out = {(r["sym"], r["qty"]): (r["ts_right"], r["px_right"])
           for r in as_of_join(trades, quotes, "ts", ["sym"], ["px"]).collect()}
    assert out[("A", 5)] == (_ts(9, 30), 1.0)     # strictly before
    assert out[("A", 6)] == (_ts(10, 30), 2.0)    # equal ts matches
    assert out[("A", 7)] == (_ts(10, 30), 2.0)
    assert out[("B", 8)] == (None, None)          # no quote yet
    assert out[("C", 9)] == (None, None)          # key absent from right


def test_as_of_join_tolerance(trades, quotes):
    out = {(r["sym"], r["qty"]): r["px_right"]
           for r in as_of_join(trades, quotes, "ts", ["sym"], ["px"],
                               tolerance="10 minutes").collect()}
    assert out[("A", 5)] is None                  # 30 min old > tolerance
    assert out[("A", 6)] == 2.0                   # 0 min
    assert out[("A", 7)] is None                  # 30 min


def test_as_of_join_null_value_is_carried(spark):
    """A right row whose VALUE is NULL must still win over an older
    non-null row (struct packing prevents ignorenulls skip-back)."""
    left = spark.createDataFrame([("A", _ts(11))], "k string, ts timestamp")
    right = spark.createDataFrame([("A", _ts(9), 1.0), ("A", _ts(10), None)],
                                  "k string, ts timestamp, v double")
    row = as_of_join(left, right, "ts", ["k"], ["v"]).collect()[0]
    assert row["ts_right"] == _ts(10) and row["v_right"] is None


def test_as_of_join_matches_pandas(spark, lineitem):
    """Differential check vs pandas.merge_asof on real data: orders of one
    day matched to the latest earlier lineitem per (suppkey is too wide) —
    use synthetic medium data derived from lineitem for variety."""
    df = lineitem.select(
        (F.col("l_suppkey") % 7).alias("k"),
        F.to_timestamp(F.col("l_shipdate")).alias("ts"),
        F.col("l_quantity").cast("double").alias("v"),
        F.monotonically_increasing_id().alias("rid")).limit(500).cache()
    # right side must be unique per (k, ts) for deterministic comparison
    right = df.groupBy("k", "ts").agg(F.max("v").alias("rv"))
    out = as_of_join(df.select("k", "ts", "rid"), right, "ts", ["k"], ["rv"]) \
        .toPandas().sort_values("rid").reset_index(drop=True)
    lp = df.select("k", "ts", "rid").toPandas().sort_values(["ts", "rid"])
    rp = right.toPandas().sort_values(["ts", "k"])
    exp = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward") \
        .sort_values("rid").reset_index(drop=True)
    assert (out["rv_right"].fillna(-1) == exp["rv"].fillna(-1)).all()


def test_range_join_basic(spark):
    points = spark.createDataFrame(
        [(1, _ts(10, 15)), (2, _ts(10, 59, 59)), (3, _ts(12, 30)),
         (4, _ts(9, 59, 59))],
        "pid long, ts timestamp")
    intervals = spark.createDataFrame(
        [(100, _ts(10), _ts(11)), (200, _ts(10, 30), _ts(13))],
        "iid long, t0 timestamp, t1 timestamp")
    got = {(r["pid"], r["iid"])
           for r in range_join(points, intervals, "ts", "t0", "t1",
                               bucket="1 hour").collect()}
    # containment is inclusive on both ends; each pair appears ONCE even
    # when the interval spans several buckets
    assert got == {(1, 100), (2, 100), (2, 200), (3, 200)}


def test_range_join_with_keys_and_bucket_edges(spark):
    points = spark.createDataFrame(
        [("u", 1, _ts(10)), ("v", 2, _ts(10))], "k string, pid long, ts timestamp")
    intervals = spark.createDataFrame(
        [("u", 100, _ts(10), _ts(10))], "k string, iid long, t0 timestamp, t1 timestamp")
    got = {(r["pid"], r["iid"])
           for r in range_join(points, intervals, "ts", "t0", "t1",
                               by_cols=["k"], bucket="15 minutes").collect()}
    assert got == {(1, 100)}  # key match + zero-length interval, exact ts


def test_range_join_span_guard(spark):
    points = spark.createDataFrame([(1, _ts(10))], "pid long, ts timestamp")
    intervals = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), dt.datetime(2025, 1, 1))],
        "iid long, t0 timestamp, t1 timestamp")
    with pytest.raises(Exception, match="span"):
        range_join(points, intervals, "ts", "t0", "t1",
                   bucket="1 minute", max_span_buckets=100).collect()


def test_as_of_join_plan_single_exchange(trades, quotes):
    """The whole as-of join is ONE shuffle (the window partitionBy) —
    the property that makes it survive 100 TB."""
    from frames_map_reduce_spark.plans import count_exchanges
    out = as_of_join(trades, quotes, "ts", ["sym"], ["px"])
    assert count_exchanges(out) == 1


def test_range_join_plan_is_equi_join(spark):
    """Bucketization must yield a hash-partitioned/broadcast EQUI-join —
    never BroadcastNestedLoopJoin/CartesianProduct (the theta-join shapes
    that die at scale)."""
    from frames_map_reduce_spark.plans import explain_formatted
    points = spark.createDataFrame([(1, _ts(10))], "pid long, ts timestamp")
    intervals = spark.createDataFrame(
        [(100, _ts(9), _ts(11))], "iid long, t0 timestamp, t1 timestamp")
    plan = explain_formatted(
        range_join(points, intervals, "ts", "t0", "t1", bucket="1 hour"))
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_as_of_forward_known_answer(spark):
    """Forward as-of: each left row takes the NEXT right row (ts >=,
    inclusive), with forward tolerance bounding how far ahead."""
    import datetime as dt
    from frames_map_reduce_spark.operators.temporal import as_of_join

    t = lambda s: dt.datetime(2024, 6, 1, 0, 0, s)
    left = spark.createDataFrame(
        [("a", t(10), 1.0), ("a", t(20), 2.0), ("a", t(31), 3.0),
         ("b", t(5), 4.0)],
        "k string, ts timestamp, lv double")
    right = spark.createDataFrame(
        [("a", t(12), 100.0), ("a", t(20), 200.0), ("a", t(30), 300.0)],
        "k string, ts timestamp, rv double")
    out = {(r["k"], r["ts"].second): r["rv_right"]
           for r in as_of_join(left, right, "ts", ["k"], ["rv"],
                               direction="forward").collect()}
    assert out == {("a", 10): 100.0,   # next at 12
                   ("a", 20): 200.0,   # inclusive equal-ts match
                   ("a", 31): None,    # nothing later
                   ("b", 5): None}     # no right rows for b
    tol = {(r["k"], r["ts"].second): r["rv_right"]
           for r in as_of_join(left, right, "ts", ["k"], ["rv"],
                               direction="forward",
                               tolerance="1 second").collect()}
    assert tol[("a", 10)] is None      # 12 is 2s ahead, beyond 1s
    assert tol[("a", 20)] == 200.0
    with pytest.raises(ValueError, match="direction"):
        as_of_join(left, right, "ts", ["k"], ["rv"], direction="nearest")


def _rand_frames(spark, seed):
    """Random (left, right) with unique (k, ts) right rows — the regime
    where sliced and unsliced paths must agree exactly."""
    import random

    rng = random.Random(seed)
    keys = ["a", "b", "c"]
    right_rows, seen = [], set()
    for _ in range(60):
        k = rng.choice(keys)
        t = _ts(rng.randint(0, 23), rng.randint(0, 59), rng.randint(0, 59))
        if (k, t) in seen:
            continue
        seen.add((k, t))
        right_rows.append((k, t, float(rng.randint(1, 999))))
    left_rows = [(rng.choice(keys + ["z"]),
                  _ts(rng.randint(0, 23), rng.randint(0, 59),
                      rng.randint(0, 59)),
                  i)
                 for i in range(80)]
    left = spark.createDataFrame(left_rows, "k string, ts timestamp, i long")
    right = spark.createDataFrame(right_rows, "k string, ts timestamp, v double")
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("tolerance", [None, "37 minutes"])
def test_as_of_join_time_slice_parity(spark, direction, tolerance):
    """r4 verdict #6: the time-sliced rendering must agree with the
    single-window path row for row — slices cut mid-stream (17-minute
    buckets over second-resolution data), both directions, with and
    without tolerance."""
    for seed in (1, 2, 3):
        left, right = _rand_frames(spark, seed)
        base = as_of_join(left, right, "ts", ["k"], ["v"],
                          direction=direction, tolerance=tolerance)
        sliced = as_of_join(left, right, "ts", ["k"], ["v"],
                            direction=direction, tolerance=tolerance,
                            time_slice="17 minutes")
        a = sorted(map(tuple, base.collect()))
        b = sorted(map(tuple, sliced.collect()))
        assert a == b, f"seed={seed}: sliced path diverged"


def test_as_of_join_time_slice_plan_partitions_by_slice(trades, quotes):
    """The sliced window must shuffle on (by, slice) — more than one task
    per hot key — while the boundary frame stays per-key but skinny."""
    from frames_map_reduce_spark.plans import explain_formatted

    out = as_of_join(trades, quotes, "ts", ["sym"], ["px"],
                     time_slice="30 minutes")
    plan = explain_formatted(out)
    assert "_slice" in plan
    # the main data window's exchange carries the slice column
    import re
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any("sym" in p and "_slice" in p for p in parts), parts
