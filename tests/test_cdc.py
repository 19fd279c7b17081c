"""Changelog compaction (operators/cdc.py compact_latest)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frames_map_reduce_spark.operators.cdc import (
    compact_latest,
    merge_upsert,
    scd2_intervals,
)
from frames_map_reduce_spark.plans import executed_plan


@pytest.fixture(scope="module")
def log(spark):
    # (key, version, seq, op, val) — seq breaks version ties.
    rows = [
        ("a", 1, 1, "upsert", 10.0),
        ("a", 2, 2, "upsert", 20.0),
        ("b", 1, 3, "upsert", 30.0),
        ("b", 2, 4, "delete", None),        # latest is a tombstone
        ("c", 1, 5, "delete", None),
        ("c", 2, 6, "upsert", 60.0),        # delete superseded by upsert
        ("d", 5, 7, "upsert", 70.0),
        ("d", 5, 8, "upsert", 71.0),        # tie on version → seq decides
    ]
    return spark.createDataFrame(
        rows, "k string, v long, seq long, op string, val double")


def test_latest_wins(log):
    out = compact_latest(log, ["k"], ["v", "seq"])
    got = {r["k"]: (r["v"], r["seq"], r["op"], r["val"]) for r in out.collect()}
    assert got == {
        "a": (2, 2, "upsert", 20.0),
        "b": (2, 4, "delete", None),
        "c": (2, 6, "upsert", 60.0),
        "d": (5, 8, "upsert", 71.0),
    }


def test_tombstone_drops_only_latest_deletes(log):
    out = compact_latest(log, ["k"], ["v", "seq"],
                         tombstone=F.col("op") == "delete")
    got = {r["k"]: r["val"] for r in out.collect()}
    # b's latest record is a delete → gone; c's delete was superseded.
    assert got == {"a": 20.0, "c": 60.0, "d": 71.0}


def test_payload_projection(log):
    out = compact_latest(log, ["k"], ["v", "seq"], payload=["val"])
    assert out.columns == ["k", "val"]


def test_missing_column_raises(log):
    with pytest.raises(ValueError):
        compact_latest(log, ["nope"], ["v"])


def test_scd2_intervals(spark):
    rows = [
        ("a", 10, "upsert", 1.0),
        ("a", 20, "upsert", 2.0),
        ("a", 30, "delete", None),   # closes the 20-interval, emits none
        ("b", 10, "upsert", 3.0),
    ]
    df = spark.createDataFrame(rows, "k string, t long, op string, val double")
    out = scd2_intervals(df, ["k"], "t", order=["t"],
                         tombstone=F.col("op") == "delete")
    got = sorted((r["k"], r["valid_from"], r["valid_to"], r["is_current"])
                 for r in out.collect())
    assert got == [
        ("a", 10, 20, False),
        ("a", 20, 30, False),   # closed by the tombstone, not current
        ("b", 10, None, True),
    ]


def test_scd2_latest_delete_means_no_current(spark):
    df = spark.createDataFrame([("a", 1, "upsert"), ("a", 2, "delete")],
                               "k string, t long, op string")
    out = scd2_intervals(df, ["k"], "t",
                         tombstone=F.col("op") == "delete")
    rows = out.collect()
    assert len(rows) == 1 and not rows[0]["is_current"]


def test_merge_upsert_semantics(spark, log):
    """Insert, replace, delete, and in-batch supersession in one MERGE."""
    target = spark.createDataFrame(
        [("a", "upsert", 5.0), ("b", "upsert", 6.0), ("z", "upsert", 9.0)],
        "k string, op string, val double")
    out = merge_upsert(target, log, ["k"], ["v", "seq"],
                       tombstone=F.col("op") == "delete")
    assert out.columns == target.columns
    got = {r["k"]: r["val"] for r in out.collect()}
    # a replaced (20.0), b deleted, c inserted (delete superseded in-batch),
    # d inserted (version tie broken by seq), z untouched.
    assert got == {"a": 20.0, "c": 60.0, "d": 71.0, "z": 9.0}


def test_merge_incremental_equals_batch_recompute(spark):
    """The maintenance contract: merging a suffix changelog into the
    compacted prefix equals compacting the full log — at EVERY cutoff."""
    rows = [("k%d" % (i % 7), i, "delete" if i % 5 == 4 else "upsert",
             float(i)) for i in range(40)]
    logf = spark.createDataFrame(rows, "k string, v long, op string, val double")
    tomb = F.col("op") == "delete"
    full = compact_latest(logf, ["k"], ["v"], tombstone=tomb)
    for cutoff in (0, 13, 39, 40):
        snap = compact_latest(logf.filter(F.col("v") < cutoff), ["k"], ["v"],
                              tombstone=tomb)
        merged = merge_upsert(snap, logf.filter(F.col("v") >= cutoff),
                              ["k"], ["v"], tombstone=tomb)
        assert sorted(map(tuple, merged.collect())) \
            == sorted(map(tuple, full.collect())), f"cutoff={cutoff}"


def test_merge_only_newer_guards_out_of_order_delta(spark):
    """A replayed/late delta carrying OLDER versions must not regress
    the snapshot when only_newer=True (and must without it, proving the
    guard is doing the work)."""
    target = spark.createDataFrame(
        [("a", 5, 50.0), ("b", 5, 60.0)], "k string, v long, val double")
    stale = spark.createDataFrame(
        [("a", 3, 30.0), ("c", 1, 10.0)], "k string, v long, val double")
    guarded = merge_upsert(target, stale, ["k"], ["v"], only_newer=True)
    assert {r["k"]: (r["v"], r["val"]) for r in guarded.collect()} \
        == {"a": (5, 50.0), "b": (5, 60.0), "c": (1, 10.0)}
    unguarded = merge_upsert(target, stale, ["k"], ["v"])
    assert {r["k"]: r["v"] for r in unguarded.collect()}["a"] == 3
    # equal versions: the delta wins (>= comparison — idempotent replay)
    replay = spark.createDataFrame([("a", 5, 55.0)],
                                   "k string, v long, val double")
    again = merge_upsert(target, replay, ["k"], ["v"], only_newer=True)
    assert {r["k"]: r["val"] for r in again.collect()}["a"] == 55.0
    with pytest.raises(ValueError, match="version columns in the target"):
        merge_upsert(target.drop("v"), stale, ["k"], ["v"],
                     only_newer=True)


def test_merge_missing_payload_column_raises(spark, log):
    target = spark.createDataFrame([("a", 1.0)], "k string, extra double")
    with pytest.raises(ValueError, match="missing target columns"):
        merge_upsert(target, log, ["k"], ["v"])


def test_merge_plan_broadcasts_delta_keys(spark):
    """The 100 TB contract: the big target is scanned, never shuffled —
    the compacted delta's key set broadcasts into the left_anti (AQE
    resolves it at runtime, so assert on the executed plan)."""
    target = spark.range(20000).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("val"))
    changes = spark.range(50).select(
        F.col("id").alias("k"), F.lit(1).alias("v"),
        (F.col("id") * 3.0).alias("val"))
    out = merge_upsert(target, changes, ["k"], ["v"])
    out.collect()
    plan = executed_plan(out)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan[:2000]


def test_plan_is_two_phase_agg_no_window(log):
    """The scale contract: compaction is a partial-aggregated max_by
    (one shuffle carrying ≤ |keys| rows per task), NOT a window sort
    over every log row."""
    out = compact_latest(log, ["k"], ["v", "seq"])
    plan = executed_plan(out)
    assert "Window" not in plan
    # Struct-buffered max_by lowers to SortAggregate, but still with a
    # map-side partial before the exchange — that's the scale property.
    assert "partial_max_by" in plan


def test_merge_upsert_reserved_column_clash(spark):
    """A target carrying a column named _is_delete would be silently
    overwritten by the internal tombstone flag — merge_upsert must
    refuse loudly instead (r4 ADVICE)."""

    target = spark.createDataFrame(
        [(1, 1, False)], "k long, v long, _is_delete boolean")
    changes = spark.createDataFrame(
        [(1, 2, False)], "k long, v long, _is_delete boolean")
    with pytest.raises(ValueError, match="reserved"):
        merge_upsert(target, changes, ["k"], ["v"])


def test_snapshot_diff_statuses(spark):
    """All four statuses, plus the NULL contracts: NULL==NULL value is
    unchanged (null-safe equality), NULL vs value is changed, and
    presence comes from markers, never from value nullability."""
    import duckdb

    from frames_map_reduce_spark.operators.cdc import (
        snapshot_diff, snapshot_diff_sql)

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, None), (5, "gone")],
        "id long, v string")
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, None), (4, "now-set"), (6, "fresh")],
        "id long, v string")
    got = {r["id"]: r["status"]
           for r in snapshot_diff(old, new, ["id"], "v").collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "unchanged",
                   4: "changed", 5: "removed", 6: "added"}

    con = duckdb.connect()
    con.execute("CREATE TABLE o (id BIGINT, v VARCHAR)")
    con.executemany("INSERT INTO o VALUES (?, ?)",
                    [(r["id"], r["v"]) for r in old.collect()])
    con.execute("CREATE TABLE n (id BIGINT, v VARCHAR)")
    con.executemany("INSERT INTO n VALUES (?, ?)",
                    [(r["id"], r["v"]) for r in new.collect()])
    want = {r[0]: r[3] for r in con.execute(
        snapshot_diff_sql("o", "n", ["id"], "v")).fetchall()}
    assert got == want


def test_snapshot_diff_null_keys(spark):
    """NULL keys must match null-safely (IS NOT DISTINCT FROM), exactly
    like the SQL twin — a name-list join would split one NULL-keyed row
    into a phantom removed+added pair."""
    from frames_map_reduce_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame([(None, "a"), (1, "x")], "id long, v string")
    new = spark.createDataFrame([(None, "a"), (1, "y")], "id long, v string")
    got = {r["id"]: r["status"]
           for r in snapshot_diff(old, new, ["id"], "v").collect()}
    assert got == {None: "unchanged", 1: "changed"}
