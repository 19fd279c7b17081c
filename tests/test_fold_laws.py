"""Property tests for the fold algebra laws (SURVEY §7.2 M5).

The reference's folds are lawful Applicative values; our compiled form
must preserve the observable laws:

1. product law: merged folds ≡ running each fold separately (one pass
   must not change results);
2. premap fusion: folding a derived column ≡ deriving then folding;
3. rename is a pure relabeling.
"""

from __future__ import annotations

import hypothesis.strategies as st
import pytest
from hypothesis import HealthCheck, given, settings
from pyspark.sql import functions as F

from frames_map_reduce_spark import folds
from frames_map_reduce_spark.mapreduce import (
    fold_and_add_key,
    map_reduce,
    split_on_keys,
    unpack_no_op,
)

ROWS = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]),
              st.integers(min_value=-1000, max_value=1000),
              st.integers(min_value=1, max_value=100)),
    min_size=1, max_size=30)

SLOW = settings(max_examples=15, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(rows=ROWS)
@SLOW
def test_product_law(spark, rows):
    df = spark.createDataFrame(rows, "k string, x long, w long")
    merged = map_reduce(df, unpack_no_op(), split_on_keys(["k"]),
                        fold_and_add_key(folds.sum_("x") & folds.max_("w")))
    sep_x = map_reduce(df, unpack_no_op(), split_on_keys(["k"]),
                       fold_and_add_key(folds.sum_("x")))
    sep_w = map_reduce(df, unpack_no_op(), split_on_keys(["k"]),
                       fold_and_add_key(folds.max_("w")))
    got = {r["k"]: (r["x"], r["w"]) for r in merged.collect()}
    want = {r["k"]: r["x"] for r in sep_x.collect()}
    want_w = {r["k"]: r["w"] for r in sep_w.collect()}
    assert got == {k: (want[k], want_w[k]) for k in want}


@given(rows=ROWS)
@SLOW
def test_premap_fusion(spark, rows):
    df = spark.createDataFrame(rows, "k string, x long, w long")
    fused = map_reduce(df, unpack_no_op(), split_on_keys(["k"]),
                       fold_and_add_key(folds.sum_(F.col("x") * F.col("w"), out="xw")))
    derived = df.withColumn("xw", F.col("x") * F.col("w"))
    staged = map_reduce(derived.select("k", "xw"), unpack_no_op(),
                        split_on_keys(["k"]), fold_and_add_key(folds.sum_("xw")))
    assert ({r["k"]: r["xw"] for r in fused.collect()}
            == {r["k"]: r["xw"] for r in staged.collect()})


def test_rename_pure_relabel(spark):
    df = spark.createDataFrame([("a", 1), ("a", 2)], "k string, x long")
    f = (folds.sum_("x") & folds.count_star("n")).rename({"x": "total"})
    out = map_reduce(df, unpack_no_op(), split_on_keys(["k"]), fold_and_add_key(f))
    assert out.columns == ["k", "total", "n"]
    assert out.first()["total"] == 3


def test_weighted_mean_identity(spark):
    """weighted_mean with unit weights ≡ plain mean."""
    df = spark.createDataFrame([("a", 1.0, 1.0), ("a", 5.0, 1.0), ("b", 2.0, 1.0)],
                               "k string, x double, w double")
    wm = map_reduce(df, unpack_no_op(), split_on_keys(["k"]),
                    fold_and_add_key(folds.weighted_mean("x", "w")))
    m = map_reduce(df, unpack_no_op(), split_on_keys(["k"]),
                   fold_and_add_key(folds.mean_("x")))
    assert ({r["k"]: r["x"] for r in wm.collect()}
            == pytest.approx({r["k"]: r["x"] for r in m.collect()}))


def test_null_propagating_equals_skipping_without_nulls(spark):
    df = spark.createDataFrame([("a", 1.0), ("a", 2.0), ("b", 3.0)],
                               "k string, x double")
    prop = map_reduce(df, unpack_no_op(), split_on_keys(["k"]),
                      fold_and_add_key(folds.null_propagating(F.sum, "x")))
    skip = map_reduce(df, unpack_no_op(), split_on_keys(["k"]),
                      fold_and_add_key(folds.sum_("x")))
    assert ({r["k"]: r["x"] for r in prop.collect()}
            == {r["k"]: r["x"] for r in skip.collect()})
