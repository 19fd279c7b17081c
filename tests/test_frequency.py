"""Misra-Gries heavy hitters (operators/frequency.py): exactness when
capacity covers the domain, and the worst-case envelope
est ≤ true ≤ est + total_err when it doesn't."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from frames_map_reduce_spark.operators.frequency import heavy_hitters_approx


def _zipf_rows(n=20000, n_vals=400, seed=7):
    rng = random.Random(seed)
    # Zipf-ish: value i with weight ~ 1/(i+1)
    weights = [1.0 / (i + 1) for i in range(n_vals)]
    total = sum(weights)
    cum, acc = [], 0.0
    for w in weights:
        acc += w / total
        cum.append(acc)
    rows = []
    for _ in range(n):
        u = rng.random()
        lo = next(i for i, c in enumerate(cum) if u <= c)
        rows.append((f"v{lo:04d}",))
    return rows


def test_exact_when_capacity_covers_domain(spark):
    rows = _zipf_rows(n=5000, n_vals=100)
    df = spark.createDataFrame(rows, "tok string")
    got = {r["tok"]: (r["est"], r["lower"], r["upper"])
           for r in heavy_hitters_approx(df, "tok", 10, capacity=500).collect()}
    exact = {r["tok"]: r["n"] for r in
             df.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
               .orderBy(F.col("n").desc(), "tok").limit(10).collect()}
    # no pruning happened anywhere -> estimates are exact, bounds tight
    assert set(got) == set(exact)
    for t, n in exact.items():
        est, lo, up = got[t]
        assert est == n == lo == up


def test_envelope_holds_under_aggressive_pruning(spark):
    rows = _zipf_rows(n=20000, n_vals=400)
    df = spark.createDataFrame(rows, "tok string").repartition(8)
    exact = {r["tok"]: r["n"] for r in
             df.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()}
    out = heavy_hitters_approx(df, "tok", 20, capacity=32).collect()
    assert len(out) == 20
    assert any(r["upper"] > r["est"] for r in out)  # pruning DID happen
    for r in out:
        true = exact[r["tok"]]
        assert r["est"] <= true <= r["upper"], (r["tok"], r["est"], true,
                                                r["upper"])
    # heavy head must surface despite tiny capacity: the true top value
    # is in the sketch top-20
    top_true = max(exact, key=lambda t: (exact[t], t))
    assert top_true in {r["tok"] for r in out}


def test_nulls_ignored_and_validation(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",), ("b",)],
                               "tok string")
    got = {r["tok"]: r["est"] for r in
           heavy_hitters_approx(df, "tok", 5).collect()}
    assert got == {"a": 2, "b": 1}
    with pytest.raises(ValueError, match="positive"):
        heavy_hitters_approx(df, "tok", 0)


def test_heavy_hitters_long_column_envelope(spark):
    """r4 verdict #7: the sketch is type-generic over atomic columns —
    a bigint key column works cast-free and the Misra-Gries envelope
    (est <= true <= est + total pruned mass) holds under real pruning."""
    rows = [(v,) for v in list(range(200)) * 1 + [7] * 50 + [11] * 30]
    df = spark.createDataFrame(rows, "k long").repartition(4)
    exact = {r["k"]: r["n"]
             for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    out = heavy_hitters_approx(df, "k", k=5, capacity=16).collect()
    assert out, "sketch returned nothing"
    assert all(isinstance(r["k"], int) for r in out)
    for r in out:
        assert r["est"] <= exact[r["k"]] <= r["upper"], r
    # the two true heavy keys must surface in the top-5
    got = {r["k"] for r in out}
    assert {7, 11} <= got


def test_heavy_hitters_rejects_complex_type(spark):
    df = spark.createDataFrame([([1, 2],)], "k array<long>")
    with pytest.raises(ValueError, match="atomic"):
        heavy_hitters_approx(df, "k", k=3)
