"""Pivot / unpivot reshape operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frames_map_reduce_spark import folds
from frames_map_reduce_spark.operators.reshape import pivot_fold, unpivot


@pytest.fixture(scope="module")
def long_df(spark):
    rows = [("x", "a", 1.0), ("x", "b", 2.0), ("y", "a", 3.0),
            ("y", "a", 4.0), ("y", "c", 5.0)]
    return spark.createDataFrame(rows, "k string, cat string, v double")


def test_pivot_explicit_values(long_df):
    out = pivot_fold(long_df, ["k"], "cat", ["a", "b", "c"],
                     folds.of(F.sum("v"), "s"))
    got = {r["k"]: (r["a"], r["b"], r["c"]) for r in out.collect()}
    assert got == {"x": (1.0, 2.0, None), "y": (7.0, None, 5.0)}


def test_pivot_requires_values(long_df):
    with pytest.raises(ValueError):
        pivot_fold(long_df, ["k"], "cat", [], folds.of(F.sum("v"), "s"))


def test_unpivot_roundtrip(spark):
    wide = spark.createDataFrame([(1, 10.0, 20.0), (2, 30.0, 40.0)],
                                 "id long, a double, b double")
    long = unpivot(wide, ["id"], ["a", "b"], "col", "val")
    assert long.columns == ["id", "col", "val"]
    assert long.count() == 4
    back = pivot_fold(long, ["id"], "col", ["a", "b"],
                      folds.of(F.first("val"), "v"))
    assert sorted(tuple(r) for r in back.collect()) == [(1, 10.0, 20.0), (2, 30.0, 40.0)]


def test_unpivot_is_shuffle_free(spark):
    from frames_map_reduce_spark.plans import count_exchanges
    wide = spark.createDataFrame([(1, 10.0, 20.0)], "id long, a double, b double")
    assert count_exchanges(unpivot(wide, ["id"], ["a", "b"])) == 0
