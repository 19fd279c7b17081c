"""Hashed log-odds classifier (operators/classifier.py).

Covers the model contract (full weight-table spine, sign of evidence,
gate semantics) and the engine-exactness claims (partition invariance of
the integer score path).  Cross-engine value parity is proven separately
by test_oracle_parity / the driver on the quality_classifier registry
query.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frames_map_reduce_spark.operators import classifier as CLF
from tests.conftest import rows_sorted

D = 64
SALT = "t"


@pytest.fixture(scope="module")
def tiny(spark):
    # 'alpha' appears only in positive docs, 'omega' only in negative,
    # 'common' in both equally; one empty doc exercises the absent-row
    # contract.
    rows = [
        (1, "alpha alpha common", True),
        (2, "alpha common", True),
        (3, "omega common", False),
        (4, "omega omega common", False),
        (5, "", True),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, good boolean")


@pytest.fixture(scope="module")
def weights(tiny):
    return CLF.train_logodds_classifier(tiny, "text", "good",
                                        n_buckets=D, salt=SALT).cache()


def test_weight_table_is_dense_spine(weights):
    got = rows_sorted(weights, "bucket")
    assert len(got) == D
    assert [b for b, _ in got] == list(range(D))


def test_evidence_signs(spark, tiny, weights):
    # bucket of a token = same hash spec the operator uses
    def bucket_of(tok: str) -> int:
        return (spark.range(1)
                .select((CLF.hash_unit(F.lit(tok), SALT) % D).alias("b"))
                .collect()[0]["b"])

    w = {b: wt for b, wt in weights.collect()}
    assert w[bucket_of("alpha")] > 0     # positive-only evidence
    assert w[bucket_of("omega")] < 0     # negative-only evidence


def test_score_gate_and_absent_empty_doc(tiny, weights):
    scores = CLF.classifier_score(tiny, weights, "text", "doc_id",
                                  n_buckets=D, salt=SALT)
    got = {r["doc_id"]: r for r in scores.collect()}
    assert set(got) == {1, 2, 3, 4}      # doc 5 has no tokens -> absent
    # positive-class docs rank above the gate, negative below
    assert got[1]["logit_rank"] > 0 and got[2]["logit_rank"] > 0
    assert got[3]["logit_rank"] < 0 and got[4]["logit_rank"] < 0
    # logit_sum is the exact integer sum; n_tokens counts occurrences
    assert got[1]["n_tokens"] == 3 and got[4]["n_tokens"] == 3


def test_partition_invariance(documents):
    """The integer score path is bit-identical under any partitioning:
    train + score on 1 partition vs 13 must agree on every cell."""
    labeled = documents.withColumn("_pos", F.col("lang") == "en")
    outs = []
    for n in (1, 13):
        df = labeled.repartition(n)
        w = CLF.train_logodds_classifier(df, "text", "_pos",
                                         n_buckets=256, salt="pi")
        s = CLF.classifier_score(df, w, "text", "doc_id",
                                 n_buckets=256, salt="pi")
        outs.append(rows_sorted(s, "doc_id"))
    assert outs[0] == outs[1]


def test_bad_inputs(tiny):
    with pytest.raises(ValueError):
        CLF.train_logodds_classifier(tiny, "text", "good", n_buckets=1)


def test_gate_columns_match_classifier_score_exactly(documents):
    """The stateless expression form must compute the IDENTICAL integers
    to the join-based classifier_score on every row — that contract is
    what lets the streaming gate reuse the batch oracle verbatim."""
    labeled = documents.withColumn("_pos", F.col("lang") == "en")
    w = CLF.train_logodds_classifier(labeled, "text", "_pos",
                                     n_buckets=256, salt="g")
    joined = CLF.classifier_score(documents, w, "text", "doc_id",
                                  n_buckets=256, salt="g")
    w_rows = [(r["bucket"], r["weight"]) for r in w.collect()]
    cols = CLF.classifier_gate_columns(w_rows, "text", 256, salt="g")
    gate = (documents.select("doc_id",
                             *(c.alias(n) for n, c in cols.items()))
                     .filter(F.col("n_tokens") > 0))
    assert rows_sorted(gate, "doc_id") == rows_sorted(joined, "doc_id")


def test_gate_columns_contracts(spark, documents):
    # sparse / wrong-length weights are rejected loudly
    with pytest.raises(ValueError, match="cover exactly"):
        CLF.classifier_gate_columns([(0, 1), (2, 1)], "text", 3)
    # tokenless rows: n_tokens 0, NULL rank, never pass a threshold
    w = [(i, 0) for i in range(8)]
    cols = CLF.classifier_gate_columns(w, "t", 8)
    df = spark.createDataFrame([("",), ("x y",)], "t string")
    got = {r["n_tokens"]: r["logit_rank"]
           for r in df.select(*(c.alias(n) for n, c in cols.items())).collect()}
    assert got[0] is None and got[2] == 0


def test_train_hot_token_skew_and_exactness(spark):
    """A degenerate corpus where ONE token dominates (10^5 occurrences
    of 'hot' against a handful of others): the explode->agg train path
    must survive the hot bucket (map-side combine collapses repeats
    before the shuffle), produce the dense spine, and the arithmetic
    must match the closed-form weight computed in Python from the same
    counts."""
    import math

    hot_doc = " ".join(["hot"] * 100_000)
    df = spark.createDataFrame(
        [(hot_doc, True), ("cold other", False)], "text string, pos boolean")
    D = 32
    w = CLF.train_logodds_classifier(df, "text", "pos", n_buckets=D, salt="sk")
    got = {b: wt for b, wt in w.collect()}
    assert len(got) == D
    hot_b = (spark.range(1)
             .select((CLF.hash_unit(F.lit("hot"), "sk") % D).alias("b"))
             .collect()[0]["b"])
    # closed form: pos occurrences 100000 all in hot's bucket; totals
    # P=100000, N=2; replicate the exact expression (one ln, then round)
    pos_b = 100_000
    neg_b = sum(1 for t in ("cold", "other")
                if (spark.range(1)
                    .select((CLF.hash_unit(F.lit(t), "sk") % D).alias("b"))
                    .collect()[0]["b"]) == hot_b)
    expect = int(round(math.log(((pos_b + 1.0) * (2 + float(D)))
                                / ((neg_b + 1.0) * (100_000 + float(D))))
                       * CLF.LOGIT_SCALE))
    assert got[hot_b] == expect


def test_feature_tokens_bigram_laws(spark):
    """The (1,2)-gram feature stream (r9 verdict #4, the DSIR paper's
    feature set): unigrams ++ joined adjacent bigrams, 2n-1 features
    for an n-token document, single-token and empty documents degrade
    to unigrams-only, and the Spark/DuckDB constructions agree."""
    import duckdb
    from pyspark.sql import functions as F

    from frames_map_reduce_spark.operators.classifier import (
        feature_tokens, feature_tokens_sql)

    rows = [(1, "the quick brown fox"), (2, "single"), (3, ""),
            (4, None), (5, "a  b\tc")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["f"] for r in df.select(
        "doc_id", feature_tokens(F.col("text"), (1, 2)).alias("f"))
        .collect()}
    assert got[1] == ["the", "quick", "brown", "fox",
                      "the quick", "quick brown", "brown fox"]
    assert got[2] == ["single"]
    assert got[3] == []
    assert got[4] is None
    assert got[5] == ["a", "b", "c", "a b", "b c"]
    for d, f in got.items():
        if f:
            n = sum(1 for t in f if " " not in t)
            assert len(f) == 2 * n - 1

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = dict(con.sql(
        f"SELECT doc_id, {feature_tokens_sql('text', (1, 2))} "
        f"FROM t").fetchall())
    assert {k: (list(v) if v is not None else None)
            for k, v in want.items()} == got

    import pytest as _pt
    with _pt.raises(ValueError, match="ngram"):
        feature_tokens(F.col("text"), (2, 3))
    with _pt.raises(ValueError, match="ngram"):
        feature_tokens_sql("text", (1, 3))
