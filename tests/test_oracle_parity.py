"""Differential tests: every queries() entry vs its DuckDB oracle —
a local replica of the driver's t2 correctness gate (sort-before-compare,
FIXTURES.md convention).

Run at sf0.001 by default (fast); set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01
for the driver-scale check.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import pytest

import __spark_entry__ as entry_mod
from frames_map_reduce_spark.sources import STAR_TABLES

from tests.conftest import SF_DIR

# data-dependent oracles (ann_ivf's centroid replay) must derive their
# spec constants from the SAME fixture this suite compares against
import os as _os  # noqa: E402

_os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR

ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()
WITH_ORACLE = sorted(set(QUERIES) & set(ORACLES))
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    return v


def _canon(rows, columns):
    """Driver-style canonicalization: sort columns by name, then rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((v is None, str(type(v)), str(v)) for v in t))


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(ORACLES[name])
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), \
        f"{name}: column names differ: {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), \
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    a = _canon(spark_rows, spark_cols)
    b = _canon(duck_rows, duck_cols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
