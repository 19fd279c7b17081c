"""Key-coarsening aggregation tests — the F3 voter-turnout fixture
(FIXTURES.md; reference src/Frames/Aggregation.hs:102-108 docstring)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frames_map_reduce_spark import folds
from frames_map_reduce_spark.aggregation import (
    aggregate_all_fold,
    aggregate_fold,
    combine_key_aggregations,
    identity_key_map,
    key_map,
    key_map_from_table,
    merge_data_folds,
)
from frames_map_reduce_spark.schema import SchemaError


@pytest.fixture(scope="module")
def turnout(spark):
    rows = [
        ("CA", 25, 100, 0.5), ("CA", 45, 200, 0.7),
        ("CA", 30, 50, 0.6), ("TX", 25, 80, 0.4),
        ("TX", 60, 120, 0.8),
    ]
    return spark.createDataFrame(rows, "state string, age int, votes long, turnout_pct double")


AGE_BAND = lambda c: F.when(c < 40, "Under40").otherwise("Over40")  # noqa: E731


def test_aggregate_fold_voter_turnout(turnout):
    """Votes summed and votes-weighted turnout under the coarser age key,
    states held fixed (hand-computed expectations)."""
    out = aggregate_fold(
        turnout, key_map("age", "age_band", AGE_BAND),
        merge_data_folds(folds.sum_("votes"),
                         folds.weighted_mean("turnout_pct", "votes")),
        constant_keys=["state"])
    got = {(r["state"], r["age_band"]): (r["votes"], r["turnout_pct"])
           for r in out.collect()}
    assert got[("CA", "Under40")] == (150, pytest.approx((0.5 * 100 + 0.6 * 50) / 150))
    assert got[("CA", "Over40")] == (200, pytest.approx(0.7))
    assert got[("TX", "Under40")] == (80, pytest.approx(0.4))
    assert got[("TX", "Over40")] == (120, pytest.approx(0.8))


def test_aggregate_all_fold_drops_fine_key(turnout):
    out = aggregate_all_fold(
        turnout.select("age", "votes"),
        key_map("age", "age_band", AGE_BAND),
        folds.sum_("votes"))
    assert out.columns == ["age_band", "votes"]
    got = {r["age_band"]: r["votes"] for r in out.collect()}
    assert got == {"Under40": 230, "Over40": 320}


def test_combined_key_maps_product(turnout):
    km = combine_key_aggregations(
        key_map("state", "region",
                lambda c: F.when(c == "CA", "West").otherwise("South")),
        key_map("age", "age_band", AGE_BAND))
    out = aggregate_all_fold(turnout, km, folds.sum_("votes"))
    got = {(r["region"], r["age_band"]): r["votes"] for r in out.collect()}
    assert got == {("West", "Under40"): 150, ("West", "Over40"): 200,
                   ("South", "Under40"): 80, ("South", "Over40"): 120}


def test_identity_key_map_roundtrip(turnout):
    km = combine_key_aggregations(identity_key_map(["state"]),
                                  key_map("age", "age_band", AGE_BAND))
    assert km.out_cols == ["state", "age_band"]


def test_key_map_overlap_rejected(turnout):
    with pytest.raises(SchemaError):
        combine_key_aggregations(key_map("age", "a", AGE_BAND),
                                 key_map("age", "b", AGE_BAND))
    with pytest.raises(SchemaError):
        combine_key_aggregations(key_map("state", "x", lambda c: c),
                                 key_map("age", "x", AGE_BAND))


def test_key_map_from_table_broadcast(spark, turnout):
    mapping = spark.createDataFrame(
        [("CA", "West"), ("TX", "South")], "state string, region string")
    out = key_map_from_table(turnout, mapping, "state", "region")
    assert "region" in out.columns
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan  # the mapping side must broadcast, not shuffle
    got = out.groupBy("region").agg(F.sum("votes").alias("v")).collect()
    assert {r["region"]: r["v"] for r in got} == {"West": 350, "South": 200}


def test_key_map_from_table_default(spark, turnout):
    mapping = spark.createDataFrame([("CA", "West")], "state string, region string")
    out = key_map_from_table(turnout, mapping, "state", "region",
                             default=F.lit("Other"))
    got = {r["state"]: r["region"] for r in out.select("state", "region").distinct().collect()}
    assert got == {"CA": "West", "TX": "Other"}


def test_rollup_fold_all_levels(turnout):
    from frames_map_reduce_spark.aggregation import rollup_fold
    out = rollup_fold(turnout, ["state", "age"], folds.sum_("votes", "v"))
    # one shuffle: a single Expand feeding one partial/final agg pair —
    # counted pre-execution (a finalized AQE plan prints initial+final
    # sections and would double-count)
    from frames_map_reduce_spark.plans import count_exchanges
    assert count_exchanges(out) == 1
    rows = {(r["state"], r["age"], r["grouping_level"]): r["v"]
            for r in out.collect()}
    # finest level (grouping 0)
    assert rows[("CA", 25, 0)] == 100 and rows[("TX", 60, 0)] == 120
    # per-state rollup (grouping 1: age rolled up)
    assert rows[("CA", None, 1)] == 350 and rows[("TX", None, 1)] == 200
    # grand total (grouping 3)
    assert rows[(None, None, 3)] == 550


def test_cube_fold_includes_cross_slice(turnout):
    from frames_map_reduce_spark.aggregation import cube_fold
    out = cube_fold(turnout, ["state", "age"], folds.sum_("votes", "v"))
    rows = {(r["state"], r["age"], r["grouping_level"]): r["v"]
            for r in out.collect()}
    # the slice rollup_fold cannot produce: per-age across states (grouping 2)
    assert rows[(None, 25, 2)] == 180
    assert rows[(None, None, 3)] == 550


def test_rollup_fold_null_key_vs_rolled_up(spark):
    """grouping_level disambiguates a NULL data key from a rolled-up key."""
    from frames_map_reduce_spark.aggregation import rollup_fold
    df = spark.createDataFrame([(None, 1), ("a", 2)], "k string, x long")
    out = rollup_fold(df, ["k"], folds.sum_("x", "sx"))
    rows = {(r["k"], r["grouping_level"]): r["sx"] for r in out.collect()}
    assert rows[(None, 0)] == 1    # genuine NULL key group
    assert rows[(None, 1)] == 3    # grand total
    assert rows[("a", 0)] == 2
