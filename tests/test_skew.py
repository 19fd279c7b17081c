"""Skew utilities: salted aggregation/join must be result-identical to
their unsalted forms (the whole point — same answer, redistributed work)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frames_map_reduce_spark import folds
from frames_map_reduce_spark.skew import salted_aggregate, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share one key — the classic hot-key shape
    rows = [("hot" if i % 10 else f"k{i}", float(i % 7), i) for i in range(1000)]
    return spark.createDataFrame(rows, "k string, v double, n long")


def test_salted_aggregate_matches_plain(skewed):
    salted = salted_aggregate(
        skewed, ["k"],
        {"total": ("sum", "v"), "cnt": ("count_star", ""),
         "avg_v": ("mean", "v"), "max_n": ("max", "n")},
        salts=8)
    plain = skewed.groupBy("k").agg(
        F.sum("v").alias("total"), F.count(F.lit(1)).alias("cnt"),
        F.avg("v").alias("avg_v"), F.max("n").alias("max_n"))
    s = {r["k"]: (r["total"], r["cnt"], r["avg_v"], r["max_n"]) for r in salted.collect()}
    p = {r["k"]: (r["total"], r["cnt"], r["avg_v"], r["max_n"]) for r in plain.collect()}
    assert set(s) == set(p)
    for k in p:
        assert s[k] == pytest.approx(p[k])


def test_salted_aggregate_rejects_non_decomposable(skewed):
    with pytest.raises(ValueError):
        salted_aggregate(skewed, ["k"], {"m": ("median", "v")})


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("k1", "ONE"), ("k21", "TWENTYONE")],
        "k string, label string")
    salted = salted_join(skewed, dim, "k", salts=4)
    plain = skewed.join(dim, on="k")
    assert salted.count() == plain.count()
    s = salted.groupBy("k", "label").agg(F.sum("n").alias("sn")).collect()
    p = plain.groupBy("k", "label").agg(F.sum("n").alias("sn")).collect()
    assert sorted(map(tuple, s)) == sorted(map(tuple, p))


def test_salted_join_left_preserves_unmatched(spark, skewed):
    dim = spark.createDataFrame([("hot", "HOT")], "k string, label string")
    out = salted_join(skewed, dim, "k", salts=4, how="left")
    assert out.count() == skewed.count()
    assert out.filter(F.col("label").isNull()).count() == skewed.filter("k != 'hot'").count()


def test_approx_folds(spark, skewed):
    from frames_map_reduce_spark.mapreduce import (
        fold_and_add_key, map_reduce, split_on_keys, unpack_no_op)
    out = map_reduce(
        skewed, unpack_no_op(), split_on_keys(["k"]),
        fold_and_add_key(folds.approx_count_distinct("v", out="nv")
                         & folds.approx_quantiles("v", [0.5], out="med")))
    hot = {r["k"]: (r["nv"], r["med"]) for r in out.collect()}["hot"]
    assert hot[0] == 7  # 7 distinct v values; HLL exact at tiny cardinality
    assert hot[1][0] in (2.0, 3.0, 4.0)
