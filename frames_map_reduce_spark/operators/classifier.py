"""Hashed linear quality classifier for training-data curation.

CCNet / fastText-style corpus filtering trains a cheap linear model on a
trusted-vs-rest label and keeps documents the model scores highly; at
100 TB the classifier must be (a) trainable in one aggregation pass and
(b) appliable as a map-side join, or it becomes the pipeline bottleneck.
This module implements the classic hashed bag-of-words log-odds
classifier (multinomial Naive Bayes with add-one smoothing — the closed
form a one-pass fastText-like linear filter converges to):

- **Features**: token occurrences hashed into ``n_buckets`` slots with
  the engine's shared salted-md5 hash (``sampling.hash_unit``) — the
  "hashing trick", so the model is a fixed-size table regardless of
  vocabulary.
- **Training** (:func:`train_logodds_classifier`): one explode + one
  aggregation builds per-bucket occurrence counts for the positive and
  negative class; the per-bucket weight is the smoothed log-odds ratio
  ``ln(((pos+1)·(N+D)) / ((neg+1)·(P+D)))`` quantized to integer
  MICRO-units (same engine-exactness technique as ``quality.lp_rank``:
  the one ``ln`` per bucket is a single deterministic IEEE op on exact
  integer inputs; everything after it is integer arithmetic, so scores
  are bit-identical under any partitioning and any engine).  The full
  ``[0, n_buckets)`` table is emitted (unseen buckets get the prior-only
  weight), so scoring needs no fallback constant.
- **Scoring** (:func:`classifier_score`): explode + broadcast join
  against the weight table (``n_buckets`` rows — always broadcastable by
  construction) + one per-document integer aggregation.  Output is the
  exact BIGINT logit sum and ``logit_rank``, the half-up integer mean in
  micro-log-odds (offset-positive, same ``div``/``//`` reconciliation as
  ``lp_rank``).  A keep/drop gate is then a pure integer comparison:
  ``logit_rank >= threshold_micro``.

Scale shape: training is explode → 2-phase hash agg over at most
``n_buckets × 2`` live keys (map-side combine collapses hot tokens
before the shuffle) → a broadcastable ``n_buckets``-row table; scoring
is explode → broadcast hash join → 2-phase per-doc agg.  Nothing
quadratic, nothing driver-side, no Python in the hot path.

Cross-engine caveat (same accepted risk class as ``lp_rank``): the
per-bucket ``ln`` is computed once per bucket in each engine; a last-ulp
disagreement would need the true value to sit within ~1e-6 ulp of a
half-integer micro-unit.  All DOWNSTREAM arithmetic is integer and
therefore exact.

Public lineage: CCNet's trusted-vs-rest quality filtering (Wenzek et
al., LREC 2020, arXiv:1911.00359), fastText linear text classification
(Joulin et al., EACL 2017, arXiv:1607.01759), and the hashing trick for
feature spaces (Weinberger et al., ICML 2009, arXiv:0902.2206).  Beyond
the reference's surface (quality-scoring mandate); composes with the
fold algebra downstream (inputs and outputs are plain frames).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from frames_map_reduce_spark.functions import text as TX
from frames_map_reduce_spark.operators.sampling import hash_unit, hash_unit_sql
from frames_map_reduce_spark.schema import require_columns

__all__ = [
    "train_logodds_classifier", "train_logodds_classifier_sql",
    "classifier_score", "classifier_score_sql",
    "classifier_gate_columns",
    "feature_tokens", "feature_tokens_sql",
    "LOGIT_SCALE", "LOGIT_OFFSET",
]

#: fixed-point scale for weights: micro-log-odds.  Frozen — changing it
#: changes every published score (treat like a model release).
LOGIT_SCALE = 1_000_000
#: positive offset making the half-up integer mean sign-free (Spark
#: ``div`` truncates toward zero, DuckDB ``//`` floors — they agree only
#: on non-negatives; the offset cancels in every comparison).  Weights
#: are bounded by ``LOGIT_SCALE · |ln(ratio)|`` « 2^30, so ``w + offset``
#: is always positive.  Offset sums overflow BIGINT only beyond ~8e9
#: tokens per document — far past any real document.
LOGIT_OFFSET = 1 << 30
#: gate-form cap (the GATE_MAX_M_BITS convention): the stateless gate
#: carries the dense weight table as one in-plan array literal — ~9 s
#: of plan-build at 2^16 elements is the practical ceiling; past it the
#: broadcast-join ``classifier_score`` is the right shape anyway.
GATE_MAX_BUCKETS = 1 << 16


def _bucket(token: Column, n_buckets: int, salt: str) -> Column:
    # coalesce with a non-null literal marks the bucket NON-NULLABLE,
    # so joins on it cannot infer an isnotnull filter — which pushdown
    # would substitute into a SECOND md5 evaluation per token row
    # (measured 0.65x on the score shape with it gone).  Feature
    # tokens are never NULL, so the -1 arm never fires; if it ever
    # did, -1 matches no [0, n_buckets) spine row — exactly NULL's
    # join behavior.
    return F.coalesce(hash_unit(token, salt) % F.lit(n_buckets),
                      F.lit(-1).cast("long"))


def _bucket_sql(token: str, n_buckets: int, salt: str) -> str:
    return f"({hash_unit_sql(token, salt)} % {n_buckets})"


def _check_ngram(ngram) -> tuple[int, int]:
    ng = tuple(ngram)
    if ng not in ((1, 1), (1, 2)):
        raise ValueError(f"ngram must be (1, 1) or (1, 2), got {ngram!r}")
    return ng


def feature_tokens(col: Column, ngram=(1, 1)) -> Column:
    """The classifier's hashed-feature stream for a text column: the
    engine's whitespace tokens at the default ``ngram=(1, 1)``;
    ``(1, 2)`` appends joined adjacent bigrams (``"a b"`` — whitespace
    tokens cannot contain a space, so the join is collision-free), the
    DSIR paper's feature set (Xie et al. arXiv:2302.03169 §3 hashes
    unigrams + bigrams).  Pure array expressions — codegen, no
    Python."""
    toks = TX.tokens(col)
    if _check_ngram(ngram) == (1, 1):
        return toks
    n1 = F.greatest(F.size(toks) - F.lit(1), F.lit(0))
    bi = F.zip_with(F.slice(toks, F.lit(1), n1),
                    F.slice(toks, F.lit(2), n1),
                    lambda a, b: F.concat(a, F.lit(" "), b))
    return F.concat(toks, bi)


def feature_tokens_sql(col: str, ngram=(1, 1)) -> str:
    """DuckDB twin of :func:`feature_tokens` — same token spec, same
    slice-zip-join bigram construction (1-based inclusive list slices;
    ``t[1:0]`` is ``[]`` so single-token documents contribute no
    bigram, matching Spark's zero-length slice)."""
    t = TX.tokens_sql(col)
    if _check_ngram(ngram) == (1, 1):
        return t
    # the NULL guard matches Spark's concat (NULL in → NULL out);
    # DuckDB's list_concat SKIPS NULL args (the documented concat trap)
    # — immaterial under unnest (both yield zero rows) but the twins
    # should agree at the projection level too
    return (f"CASE WHEN {t} IS NULL THEN NULL ELSE "
            f"list_concat({t}, list_transform(list_zip("
            f"({t})[1:greatest(len({t}) - 1, 0)], ({t})[2:len({t})]), "
            f"p -> p[1] || ' ' || p[2])) END")


def train_logodds_classifier(df: DataFrame, text_col: str, label_col: str,
                             n_buckets: int = 4096,
                             salt: str = "clf",
                             ngram=(1, 1)) -> DataFrame:
    """Train a hashed log-odds classifier: ``(bucket BIGINT,
    weight BIGINT)`` with one row for EVERY bucket in ``[0, n_buckets)``.

    ``label_col`` is the positive-class indicator (boolean or 0/1; NULL
    labels are an error by contract — filter upstream).  Weights are
    micro-log-odds (see module docstring); positive = evidence for the
    positive class.

    ``n_buckets`` is the capacity dial: 4096 suffices for a keep/drop
    gate (collisions blur individual tokens but the aggregate logit
    concentrates); production language filters use 2^18-2^21.  The table
    is ``n_buckets`` rows either way — broadcastable by construction.

    ``ngram=(1, 2)`` hashes joined adjacent bigrams alongside the
    unigrams (:func:`feature_tokens`) — the DSIR paper's feature set;
    the spec (including ``ngram``) is part of the model and must match
    at scoring time.
    """
    require_columns(df, [text_col, label_col])
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    lab = F.col(label_col).cast("boolean")
    occ = (df.select(lab.alias("_pos"),
                     F.explode(feature_tokens(F.col(text_col), ngram))
                      .alias("_tok"))
             .select("_pos", _bucket(F.col("_tok"), n_buckets, salt).alias("bucket"))
             .groupBy("bucket")
             .agg(F.sum(F.when(F.col("_pos"), 1).otherwise(0)).alias("_p"),
                  F.sum(F.when(F.col("_pos"), 0).otherwise(1)).alias("_n")))
    # dense [0, n_buckets) spine so unseen buckets carry the prior-only
    # weight and scoring never needs a fallback constant; occ is
    # n_buckets rows at most — broadcast it so the spine join never
    # shuffles (guide §3.1)
    spine = (df.sparkSession.range(0, n_buckets)
               .select(F.col("id").alias("bucket")))
    counts = (spine.join(F.broadcast(occ), "bucket", "left")
                   .select("bucket",
                           F.coalesce("_p", F.lit(0)).alias("_p"),
                           F.coalesce("_n", F.lit(0)).alias("_n")))
    # totals via ONE unpartitioned window over the n_buckets-row counts
    # frame (bounded by construction), NOT a separate agg + crossJoin:
    # that shape re-ran the whole corpus tokenize/bucket subtree a
    # second time under the broadcast (two scans of the training data
    # per fit — guide §1.2 "don't compute things you throw away");
    # same exact BIGINT sums, same downstream arithmetic
    w_all = Window.partitionBy()
    counts = (counts.withColumn("_pt", F.sum("_p").over(w_all))
                    .withColumn("_nt", F.sum("_n").over(w_all)))
    d = float(n_buckets)
    # smoothed log-odds on exact integer inputs; products/quotients are
    # correctly-rounded IEEE doubles (engine-identical), then ONE ln
    ratio = (((F.col("_p") + F.lit(1.0)) * (F.col("_nt") + F.lit(d)))
             / ((F.col("_n") + F.lit(1.0)) * (F.col("_pt") + F.lit(d))))
    return (counts.select(F.col("bucket").cast("bigint").alias("bucket"),
                          F.round(F.log(ratio) * LOGIT_SCALE, 0)
                           .cast("bigint").alias("weight")))


def train_logodds_classifier_sql(table: str, text_col: str, label_col: str,
                                 n_buckets: int = 4096,
                                 salt: str = "clf",
                                 pred: str = "TRUE",
                                 ngram=(1, 1)) -> str:
    """DuckDB twin of :func:`train_logodds_classifier` (generated, not
    hand-kept): same tokenizer spec, same hash/bucket arithmetic, same
    smoothing formula and micro-quantization.  ``pred`` optionally
    restricts the training rows (WHERE clause body)."""
    toks = feature_tokens_sql(text_col, ngram)
    bucket = _bucket_sql("_tok", n_buckets, salt)
    d = repr(float(n_buckets))
    return f"""
        WITH occ AS (
            SELECT {bucket} AS bucket,
                   sum(CASE WHEN _pos THEN 1 ELSE 0 END)::BIGINT AS _p,
                   sum(CASE WHEN _pos THEN 0 ELSE 1 END)::BIGINT AS _n
            FROM (SELECT CAST({label_col} AS BOOLEAN) AS _pos,
                         unnest({toks}) AS _tok
                  FROM {table} WHERE {pred})
            GROUP BY 1),
        spine AS (
            SELECT unnest(range(0, {n_buckets})) AS bucket),
        counts AS (
            SELECT s.bucket, COALESCE(o._p, 0) AS _p, COALESCE(o._n, 0) AS _n
            FROM spine s LEFT JOIN occ o USING (bucket)),
        totals AS (
            SELECT sum(_p) AS _pt, sum(_n) AS _nt FROM counts)
        SELECT CAST(bucket AS BIGINT) AS bucket,
               CAST(round(ln(((_p + 1.0) * (_nt + {d}))
                           / ((_n + 1.0) * (_pt + {d}))) * {LOGIT_SCALE}, 0)
                    AS BIGINT) AS weight
        FROM counts CROSS JOIN totals"""


def classifier_score(df: DataFrame, weights: DataFrame, text_col: str,
                     id_col: str, n_buckets: int, salt: str = "clf",
                     carry: Sequence[str] = (),
                     ngram=(1, 1)) -> DataFrame:
    """Score every document against a trained weight table.

    Output per document (tokenless documents are absent — mirror in any
    SQL twin): ``id_col``, ``carry``..., ``n_tokens`` (BIGINT),
    ``logit_sum`` (BIGINT, the exact micro-log-odds sum — bit-identical
    under any partitioning), and ``logit_rank`` (BIGINT, the half-up
    integer mean in micro-log-odds — the per-token-normalized score a
    keep/drop threshold compares against).

    ``n_buckets``/``salt``/``ngram`` MUST match training (the feature
    and bucket functions are part of the model).  The weight table is
    explicitly broadcast — it is ``n_buckets`` rows by construction.
    With ``ngram=(1, 2)``, ``n_tokens`` counts FEATURES (unigrams +
    bigrams = 2·tokens − 1 per document), the paper's normalization.
    """
    require_columns(df, [text_col, id_col, *carry])
    require_columns(weights, ["bucket", "weight"])
    toks = (df.select(id_col, *carry,
                      F.explode(feature_tokens(F.col(text_col), ngram))
                       .alias("_tok"))
              .select(id_col, *carry,
                      _bucket(F.col("_tok"), n_buckets, salt).alias("bucket")))
    scored = toks.join(F.broadcast(weights), "bucket")
    per_doc = (scored.groupBy(id_col, *carry)
                     .agg(F.count(F.lit(1)).alias("n_tokens"),
                          F.sum("weight").alias("logit_sum"),
                          F.sum(F.col("weight") + F.lit(LOGIT_OFFSET))
                           .alias("_qs")))
    rank = (F.expr("(2 * _qs + n_tokens) div (2 * n_tokens)")
            - F.lit(LOGIT_OFFSET))
    return per_doc.select(id_col, *carry,
                          F.col("n_tokens").cast("bigint").alias("n_tokens"),
                          F.col("logit_sum").cast("bigint").alias("logit_sum"),
                          rank.cast("bigint").alias("logit_rank"))


def classifier_score_sql(table: str, weights_cte: str, text_col: str,
                         id_col: str, n_buckets: int, salt: str = "clf",
                         carry: Sequence[str] = (),
                         ngram=(1, 1)) -> str:
    """DuckDB twin of :func:`classifier_score`.  ``weights_cte`` is the
    NAME of a CTE (or table) with ``(bucket, weight)`` — compose it from
    :func:`train_logodds_classifier_sql` in the caller's WITH clause."""
    cs = "".join(f", {c}" for c in carry)
    bucket = _bucket_sql("_tok", n_buckets, salt)
    feats = feature_tokens_sql(text_col, ngram)
    return f"""
        SELECT {id_col}{cs},
               count(*)::BIGINT AS n_tokens,
               sum(weight)::BIGINT AS logit_sum,
               CAST((2 * sum(weight + {LOGIT_OFFSET}) + count(*))
                    // (2 * count(*)) - {LOGIT_OFFSET} AS BIGINT) AS logit_rank
        FROM (SELECT {id_col}{cs}, {bucket} AS bucket
              FROM (SELECT {id_col}{cs}, unnest({feats}) AS _tok
                    FROM {table}))
        JOIN {weights_cte} USING (bucket)
        GROUP BY {id_col}{cs}"""


def classifier_gate_columns(weights: Sequence[tuple[int, int]],
                            text_col: str, n_buckets: int,
                            salt: str = "clf") -> dict[str, Column]:
    """The classifier as a PURE STATELESS EXPRESSION — the ingestion-gate
    form: the dense weight table rides along as ONE array literal indexed
    by bucket, so scoring a row touches no join, no shuffle, and no state.
    That is exactly what a Structured Streaming gate or a map-side corpus
    filter needs (``classifier_score``'s explode → join → groupBy is the
    faster shape for BATCH scoring: the higher-order-function lambda here
    is interpreted per token, the join path is codegen).

    ``weights`` must cover exactly ``[0, n_buckets)`` — the dense spine
    :func:`train_logodds_classifier` emits (typically via ``.collect()``,
    bounded at ``n_buckets`` rows by construction).

    Returns ``{"n_tokens": …, "logit_sum": …, "logit_rank": …}`` Columns
    computing the IDENTICAL integers to :func:`classifier_score`
    (tokenless rows get ``n_tokens = 0`` and NULL rank instead of being
    absent — a stateless expression cannot drop rows; filter on
    ``n_tokens > 0`` for exact parity).  The half-up mean uses the exact
    integer identity ``floor(a/b) = (a - a % b)/b`` on offset-positive
    values: the subtraction is exact BIGINT, the division is an exact
    multiple, so the double carries no rounding.
    """
    got = sorted(weights)
    if [b for b, _ in got] != list(range(n_buckets)):
        raise ValueError(
            f"weights must cover exactly [0, {n_buckets}) — got "
            f"{len(got)} rows; pass train_logodds_classifier(...).collect()")
    if n_buckets > GATE_MAX_BUCKETS:
        raise ValueError(
            f"gate form carries the dense weight table in-plan; "
            f"n_buckets={n_buckets} > {GATE_MAX_BUCKETS} — use "
            f"classifier_score (broadcast join) for big tables")
    # numpy array, NOT a python list: F.lit(list) expands to CreateArray
    # with one literal child per element (the r8 bloom-spine lesson —
    # measured 1.3 s/query at 1024 elements, 29 s at 65536); the ndarray
    # path builds ONE ArrayType literal (0.4 s / 9 s respectively)
    import numpy as _np
    arr = F.lit(_np.asarray([int(w) for _, w in got], dtype=_np.int64))
    toks = TX.tokens(F.col(text_col))
    wts = F.transform(
        toks,
        lambda t: F.element_at(
            arr, (hash_unit(t, salt) % F.lit(n_buckets) + 1).cast("int")))
    s = F.aggregate(wts, F.lit(0).cast("bigint"), lambda a, w: a + w)
    n = F.size(toks)
    a = F.lit(2) * (s + n.cast("bigint") * F.lit(LOGIT_OFFSET)) + n
    b = F.lit(2) * n.cast("bigint")
    rank = F.when(n > 0,
                  ((a - a % b) / b).cast("bigint") - F.lit(LOGIT_OFFSET))
    return {"n_tokens": n.cast("bigint"),
            "logit_sum": s.cast("bigint"),
            "logit_rank": rank.cast("bigint")}
