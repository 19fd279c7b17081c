"""Randomized differential testing: arbitrary filter→group→fold pipelines
built through the engine API, checked value-for-value against DuckDB on
identical data.  Complements the fixed oracle corpus with generated
shapes (random keys, fold sets, predicates, null patterns)."""

from __future__ import annotations

import duckdb
import hypothesis.strategies as st
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from pyspark.sql import functions as F

from frames_map_reduce_spark import folds
from frames_map_reduce_spark.mapreduce import (
    fold_and_add_key,
    map_reduce,
    split_on_keys,
    unpack_filter_row,
)

FOLD_KINDS = {
    "sum": (folds.sum_, "sum({c})"),
    "min": (folds.min_, "min({c})"),
    "max": (folds.max_, "max({c})"),
    "count": (folds.count_, "count({c})"),
}

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", "d"]),
        st.one_of(st.none(), st.integers(min_value=-100, max_value=100)),
        st.integers(min_value=-50, max_value=50),
    ),
    min_size=1, max_size=40)


@given(
    rows=rows_strategy,
    fold_kinds=st.lists(st.sampled_from(sorted(FOLD_KINDS)), min_size=1,
                        max_size=3, unique=True),
    fold_col=st.sampled_from(["x", "y"]),
    threshold=st.integers(min_value=-40, max_value=40),
)
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_pipeline_matches_duckdb(spark, rows, fold_kinds, fold_col,
                                        threshold):
    pdf = pd.DataFrame(rows, columns=["k", "x", "y"]).astype(
        {"x": "Int64", "y": "int64"})
    df = spark.createDataFrame(pdf.astype(object).where(pdf.notna(), None),
                               "k string, x long, y long")

    fold = FOLD_KINDS[fold_kinds[0]][0](fold_col, out=f"o0")
    for i, kind in enumerate(fold_kinds[1:], start=1):
        fold = fold & FOLD_KINDS[kind][0](fold_col, out=f"o{i}")
    out = map_reduce(
        df,
        unpack=unpack_filter_row(F.col("y") >= threshold),
        assign=split_on_keys(["k"]),
        reduce=fold_and_add_key(fold),
    )
    got = {r["k"]: tuple(r[f"o{i}"] for i in range(len(fold_kinds)))
           for r in out.collect()}

    con = duckdb.connect()
    con.register("t", pdf)
    sel = ", ".join(
        FOLD_KINDS[kind][1].format(c=fold_col) + f" AS o{i}"
        for i, kind in enumerate(fold_kinds))
    want = {}
    for row in con.sql(
            f"SELECT k, {sel} FROM t WHERE y >= {threshold} GROUP BY k").fetchall():
        want[row[0]] = tuple(row[1:])
    con.close()

    assert got == want
