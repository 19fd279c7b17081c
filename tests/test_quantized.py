"""Int8 quantization + integer-exact MIPS retrieval (operators/quantized).

The design claim under test: power-of-two quantization is bit-exact in
every engine, and everything after it is bounded-integer arithmetic —
so Spark, DuckDB, and a plain-Python spec replay must agree EXACTLY, no
rounding grid, no ulp tolerance.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from frames_map_reduce_spark.operators import quantized as QZ

from tests.conftest import rows_sorted


def _spec_quantize(x, frac_bits: int = 8, clamp_bits: int = 8):
    """The module-header spec, in plain Python."""
    if x is None or np.isnan(x):
        return None
    lo = -(1 << (clamp_bits - 1))
    hi = -lo - 1
    return max(lo, min(hi, int(np.floor(float(x) * (1 << frac_bits)))))


VECS = [
    (0, [0.0, 0.25, -0.25, 0.4999999]),
    (1, [0.5, -0.5, 1.7, -3.0]),          # saturation both ends
    (2, [1.0 / 256, -1.0 / 256, 2.0 / 256, -0.75]),  # exact grid points
    (3, [0.123456, -0.498, 0.001, 0.3]),
    (4, [float("nan"), 0.1, 0.2, 0.3]),   # NaN poisons the dot
    # NULL coordinate: must quantize to NULL, not saturate — both
    # engines' greatest/least SKIP nulls, the measured sharp edge
    (5, [None, 0.1, -0.1, 0.2]),
]


@pytest.fixture(scope="module")
def vec_df(spark):
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    return spark.createDataFrame(
        [(i, [None if v is None else float(np.float32(v)) for v in vs])
         for i, vs in VECS], schema)


def test_quantize_matches_spec_including_saturation_and_nan(vec_df):
    got = {r["vec_id"]: r["q"] for r in
           vec_df.select("vec_id",
                         QZ.quantize_expr("embedding").alias("q")).collect()}
    for i, vs in VECS:
        expect = [_spec_quantize(None if v is None else float(np.float32(v)))
                  for v in vs]
        assert got[i] == expect, (i, got[i], expect)


def test_quantize_storage_type_is_smallest_fit(vec_df):
    """The 4x bandwidth claim rides the element type: int8 clamp must
    produce array<tinyint> (1 B/coord in rows and shuffles), 16-bit
    clamp array<smallint>."""
    t8 = vec_df.select(QZ.quantize_expr("embedding").alias("q")).schema
    assert t8["q"].dataType.simpleString() == "array<tinyint>"
    t16 = vec_df.select(
        QZ.quantize_expr("embedding", frac_bits=12,
                         clamp_bits=16).alias("q")).schema
    assert t16["q"].dataType.simpleString() == "array<smallint>"


def test_quantize_sql_twin_bit_identical(vec_df):
    spark_q = {r["vec_id"]: r["q"] for r in
               vec_df.select("vec_id",
                             QZ.quantize_expr("embedding").alias("q"))
                     .collect()}
    con = duckdb.connect()
    rows = [(i, [None if v is None else float(np.float32(v))
                  for v in vs]) for i, vs in VECS]
    con.execute("CREATE TABLE t (vec_id BIGINT, embedding FLOAT[])")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    duck_q = dict(con.execute(
        f"SELECT vec_id, {QZ.quantize_sql('embedding')} FROM t").fetchall())
    assert spark_q == duck_q


def test_quantized_dot_exact_vs_numpy(vec_df):
    qdf = vec_df.select("vec_id", QZ.quantize_expr("embedding").alias("q"))
    a = qdf.alias("a")
    b = qdf.alias("b")
    got = {(r["ia"], r["ib"]): r["d"] for r in
           a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
            .select(F.col("a.vec_id").alias("ia"),
                    F.col("b.vec_id").alias("ib"),
                    QZ.quantized_dot(F.col("a.q"), F.col("b.q")).alias("d"))
            .collect()}
    spec = {i: [_spec_quantize(None if v is None else
                                float(np.float32(v))) for v in vs]
            for i, vs in VECS}
    for (ia, ib), d in got.items():
        qa, qb = spec[ia], spec[ib]
        if any(v is None for v in qa + qb):
            assert d is None, (ia, ib, d)
        else:
            assert d == int(np.dot(np.array(qa, dtype=np.int64),
                                   np.array(qb, dtype=np.int64))), (ia, ib)


def test_quantized_dot_empty_and_mismatched_lengths(spark):
    schema = T.StructType([
        T.StructField("a", T.ArrayType(T.IntegerType())),
        T.StructField("b", T.ArrayType(T.IntegerType())),
    ])
    df = spark.createDataFrame(
        [([], []), ([1, 2], [3]), (None, [1])], schema)
    got = [r["d"] for r in
           df.select(QZ.quantized_dot("a", "b").alias("d")).collect()]
    # empty pair → 0 (aggregate's initial value); length mismatch and
    # NULL vector → NULL — the contract the SQL twin pins with guards
    assert got == [0, None, None]


def test_quantized_topk_matches_duckdb_twin(spark, embeddings, sf_dir):
    queries = (embeddings.filter(F.col("vec_id") < 5)
                         .select(F.col("vec_id").alias("query_id"),
                                 "embedding"))
    corpus = embeddings.filter(F.col("vec_id") >= 5)
    got = rows_sorted(
        QZ.quantized_topk(corpus, queries, k=5), "query_id", "rank")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf_dir}/embeddings.parquet')")
    sql = QZ.quantized_topk_sql(
        "embeddings", "vec_id", "embedding",
        query_pred="vec_id < 5", corpus_pred="vec_id >= 5", k=5)
    exp = sorted([tuple(r) for r in con.execute(sql).fetchall()],
                 key=lambda t: (t[0], t[3]))
    assert [t for t in got] == exp


def test_quantized_topk_recall_vs_float_dot(spark, embeddings):
    """Int8 MIPS should nearly reproduce float-dot top-5 on real
    embeddings — a calibration sanity check (deterministic data, so the
    measured recall is pinned, not flaky)."""
    import pandas as pd  # noqa: F401

    pdf = embeddings.orderBy("vec_id").toPandas()
    mat = np.array(list(pdf["embedding"]), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    qm, qi = mat[ids < 5], ids[ids < 5]
    cm, ci = mat[ids >= 5], ids[ids >= 5]
    sims = qm @ cm.T
    float_top = {qi[j]: set(ci[np.lexsort((ci, -sims[j]))[:5]])
                 for j in range(len(qi))}

    queries = (embeddings.filter(F.col("vec_id") < 5)
                         .select(F.col("vec_id").alias("query_id"),
                                 "embedding"))
    corpus = embeddings.filter(F.col("vec_id") >= 5)
    got = QZ.quantized_topk(corpus, queries, k=5).collect()
    int8_top: dict = {}
    for r in got:
        int8_top.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(len(int8_top[q] & float_top[q]) for q in float_top)
    recall = hits / (5 * len(float_top))
    assert recall >= 0.8, recall


def test_quantized_topk_query_cap_raises(spark, embeddings):
    queries = embeddings.select(F.col("vec_id").alias("query_id"),
                                "embedding")
    with pytest.raises(ValueError, match="broadcasts the query set"):
        QZ.quantized_topk(embeddings, queries, k=3, max_queries=10)


def test_quantized_topk_plan_is_codegen_broadcast(spark, embeddings):
    """The scoring stage must be JVM codegen over a broadcast join —
    the only Python in the plan is the partial-top-k stage."""
    queries = (embeddings.filter(F.col("vec_id") < 5)
                         .select(F.col("vec_id").alias("query_id"),
                                 "embedding"))
    corpus = embeddings.filter(F.col("vec_id") >= 5)
    plan = (QZ.quantized_topk(corpus, queries, k=5)
              ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert plan.count("MapInPandas") == 1  # partial_topk only
    assert "BatchEvalPython" not in plan   # no row-at-a-time UDF
