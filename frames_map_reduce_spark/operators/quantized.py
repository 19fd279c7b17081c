"""Int8 embedding quantization + integer-exact dot-product retrieval.

At 100 TB the embedding columns ARE the bandwidth bill: a 64-dim
float32 vector is 256 B/row in every scan and every shuffle.  Symmetric
power-of-two int8 quantization cuts that 4x (64 B/row) and turns
scoring into integer multiply-adds — the standard serving-side trick
(faiss SQ8, ScaNN int8) — and, done with POWER-OF-TWO scales only, it
is *bit-exact across engines*:

  q = clamp(floor(x · 2^frac_bits), -2^(clamp_bits-1), 2^(clamp_bits-1)-1)

``x · 2^frac_bits`` is an exponent shift (exact for every finite float,
in float32 and float64 alike), ``floor`` of an exactly-representable
value is exact, and the clamp is integer — so Spark, DuckDB, and numpy
produce the SAME int8 vector from the same floats, with no rounding
mode to reconcile.  Every downstream score is then a BIGINT sum of
bounded integer products (|q| ≤ 128 ⇒ a 64-dim dot ≤ 2^20, astronomically
inside BIGINT), engine-exact by construction — the same
integer-after-one-quantization design rule as ``label_outliers``
(similarity.py), applied to retrieval.

Semantics note (named honestly): ranking is by RAW INNER PRODUCT of the
quantized vectors — MIPS, the objective most embedding models are
trained for — not cosine.  For unnormalized vectors the two orders
differ; normalize upstream if cosine order is wanted.  Saturation: any
coordinate with |x| ≥ 2^(clamp_bits-1-frac_bits) clamps (defaults: |x| ≥
0.5); pick ``frac_bits`` so the embedding's dynamic range fits, exactly
like choosing a scale for SQ8.

Scale shape: quantization is a pure codegen ``transform`` (JVM, no
Python); scoring is ``zip_with``+``aggregate`` (JVM codegen
multiply-add); the bounded query set is broadcast, each corpus Arrow
batch keeps a partial top-k per query (``partial_topk`` — the same
partial-then-merge exactness argument as ``brute_force_topk``), and the
final merge window sees ≤ partitions×k rows per query.  Exact MIPS is
inherently O(|corpus|×|queries|) work; what int8 buys at scale is 4×
less scan/shuffle byte volume and SIMD-friendly integer math.  For
sub-linear candidate generation feed the SAME quantized column through
the IVF/SRP operators and re-score candidates with the exact integer
dot.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from frames_map_reduce_spark.operators.similarity import (_rank_topk,
                                                          partial_topk)
from frames_map_reduce_spark.schema import require_columns

__all__ = ["quantize_expr", "quantize_embeddings", "quantized_dot",
           "quantized_topk", "quantize_sql", "quantized_topk_sql"]


def _clamp_range(clamp_bits: int) -> tuple[int, int]:
    if not 2 <= clamp_bits <= 31:
        raise ValueError(f"clamp_bits must be in [2, 31], got {clamp_bits}")
    lo = -(1 << (clamp_bits - 1))
    return lo, -lo - 1


def _storage_type(clamp_bits: int) -> str:
    """Smallest integral element type the clamp range fits — the 4×
    bandwidth claim is realized HERE: ``tinyint`` elements are 1 byte in
    Spark's internal rows and shuffle blocks (and INT(8)-annotated in
    parquet), vs 4 for the float32 they replace.  Same names are valid
    DuckDB types."""
    if clamp_bits <= 8:
        return "tinyint"
    if clamp_bits <= 16:
        return "smallint"
    return "int"


def quantize_expr(vec: Column | str, frac_bits: int = 8,
                  clamp_bits: int = 8) -> Column:
    """``array<float/double>`` → array of the smallest integral type the
    clamp fits (``array<tinyint>`` at the int8 default — 1 byte/coord in
    Spark's rows and shuffle blocks, the actual 4× win) by the
    module-header power-of-two quantization.  Pure codegen (``transform`` over
    ``floor``/``greatest``/``least``) — no UDF, no shuffle.  NaN and
    NULL coordinates quantize to NULL EXPLICITLY — both Spark's and
    DuckDB's ``greatest``/``least`` SKIP NULL arguments (row-wise
    min/max semantics) rather than propagating them, so without the
    guard a NULL coordinate would silently saturate to the clamp bound
    — and poison the row's dot to NULL, which ranking then excludes
    (the zero-norm convention of ``brute_force_topk``)."""
    if frac_bits < 0:
        raise ValueError(f"frac_bits must be >= 0, got {frac_bits}")
    lo, hi = _clamp_range(clamp_bits)
    scale = 1 << frac_bits
    col = F.col(vec) if isinstance(vec, str) else vec
    st = _storage_type(clamp_bits)
    return F.transform(
        col,
        lambda x: F.when(
            x.isNull() | F.isnan(x.cast("double")), F.lit(None).cast(st)
        ).otherwise(
            F.greatest(
                F.lit(lo),
                F.least(F.lit(hi),
                        F.floor(x.cast("double") * F.lit(scale))))
            .cast(st)))


def quantize_embeddings(df: DataFrame, vec_col: str, out_col: str = "qvec",
                        frac_bits: int = 8,
                        clamp_bits: int = 8) -> DataFrame:
    """``df`` + ``out_col``: the int8-range quantized twin of
    ``vec_col`` (kept alongside — drop the float column at write time
    to realize the 4× storage/bandwidth win)."""
    require_columns(df, [vec_col])
    return df.withColumn(out_col,
                         quantize_expr(vec_col, frac_bits, clamp_bits))


def quantized_dot(a: Column | str, b: Column | str) -> Column:
    """Exact BIGINT inner product of two quantized vectors — JVM
    codegen ``zip_with`` + ``aggregate``, no Python.  NULL if either
    vector is NULL or any paired coordinate is NULL (NaN poisoning
    contract of :func:`quantize_expr`); length mismatch contributes
    NULL pairs (zip_with pads) and therefore NULLs the dot."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("bigint") * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v)


def quantized_topk(corpus: DataFrame, queries: DataFrame, k: int,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   query_id_col: str = "query_id", frac_bits: int = 8,
                   clamp_bits: int = 8,
                   max_queries: int = 10_000) -> DataFrame:
    """Exact int8-MIPS top-``k`` per query: quantize both sides
    (codegen), broadcast the bounded query set, score with the exact
    BIGINT dot, per-batch partial top-k, deterministic merge.

    Returns ``(query_id, vec_id, dot_q, rank)`` — ``dot_q`` BIGINT,
    ranking by (``dot_q`` DESC, ``id_col`` ASC), NULL dots (NaN /
    length-mismatch rows) excluded.  Integer-exact end to end: there is
    no rounding parameter because there is nothing to round.

    ``queries`` must be a bounded set (checked: ≤ ``max_queries``; the
    broadcast hint is the plan).  For query sets beyond the cap,
    quantize both sides with :func:`quantize_embeddings` and run the
    block-join scorer (``brute_force_topk_joined``) on the float
    column, or IVF/SRP for sub-linear candidates — this function's cap
    error names both."""
    require_columns(corpus, [id_col, vec_col])
    require_columns(queries, [query_id_col, vec_col])
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    n_q = queries.limit(max_queries + 1).count()
    if n_q > max_queries:
        raise ValueError(
            f"quantized_topk broadcasts the query set; got > {max_queries} "
            "queries. Raise max_queries deliberately, or use "
            "brute_force_topk_joined (block-join exact) / ivf_topk "
            "(sub-linear) for unbounded query sets.")
    qq = queries.select(
        F.col(query_id_col),
        quantize_expr(vec_col, frac_bits, clamp_bits).alias("_qq"))
    cq = corpus.select(
        F.col(id_col),
        quantize_expr(vec_col, frac_bits, clamp_bits).alias("_cq"))
    scored = (cq.join(F.broadcast(qq))  # bounded fan-out by contract
                .withColumn("dot_q", quantized_dot("_cq", "_qq"))
                .filter(F.col("dot_q").isNotNull())
                .select(query_id_col, id_col, "dot_q"))
    part = partial_topk(scored, k, query_id_col, id_col, sim_col="dot_q")
    return _rank_topk(part, k, query_id_col, id_col, sim_col="dot_q")


def quantize_sql(vec_expr: str, frac_bits: int = 8,
                 clamp_bits: int = 8) -> str:
    """DuckDB twin of :func:`quantize_expr` — same exponent-shift /
    floor / clamp arithmetic, exact by the same argument.  NULL and NaN
    coordinates both pin to NULL via an explicit leading guard: DuckDB's
    ``least``/``greatest`` SKIP NULL arguments (row-wise min/max
    semantics) where Spark's propagate them, so without the guard a
    NULL coordinate would silently clamp to the saturation bound
    instead of poisoning the dot (measured divergence, not
    hypothetical)."""
    if frac_bits < 0:
        raise ValueError(f"frac_bits must be >= 0, got {frac_bits}")
    lo, hi = _clamp_range(clamp_bits)
    scale = 1 << frac_bits
    st = _storage_type(clamp_bits).upper()
    return (f"list_transform({vec_expr}, x -> CASE WHEN "
            f"x IS NULL OR isnan(CAST(x AS DOUBLE)) THEN NULL ELSE "
            f"CAST(greatest({lo}, least({hi}, "
            f"CAST(floor(CAST(x AS DOUBLE) * {scale}) AS INT))) AS {st}) END)")


def quantized_topk_sql(table: str, id_col: str, vec_col: str,
                       query_pred: str, corpus_pred: str, k: int,
                       frac_bits: int = 8, clamp_bits: int = 8) -> str:
    """DuckDB twin of :func:`quantized_topk` over a self-split of
    ``table`` (``query_pred`` rows are the queries, ``corpus_pred`` the
    corpus — the registry convention of ``ann_bruteforce``).  The dot
    is an explicit INTEGER product sum over ``list_zip`` (no float
    path); NULL semantics are pinned to Spark's ``aggregate`` (any NULL
    paired coordinate — incl. ``list_zip``'s padding on length mismatch
    or a NULL vector — NULLs the dot, which ranking excludes; a dim-0
    pair dots to 0, not NULL, matching ``aggregate``'s initial value —
    DuckDB's ``list_sum`` alone would silently SKIP NULLs and return
    NULL on empty, hence the explicit guards)."""
    q = quantize_sql(vec_col, frac_bits, clamp_bits)
    return f"""
        WITH _t AS (SELECT {id_col}, {q} AS _qv FROM {table}),
        _p AS (
          SELECT a.{id_col} AS query_id, b.{id_col} AS {id_col},
                 a._qv AS _aq, b._qv AS _bq,
                 list_transform(list_zip(a._qv, b._qv),
                      p -> CAST(p[1] AS BIGINT) * p[2]) AS _pr
          FROM (SELECT * FROM _t WHERE {query_pred}) a
          JOIN (SELECT * FROM _t WHERE {corpus_pred}) b ON true),
        _s AS (
          SELECT query_id, {id_col},
                 CASE WHEN _aq IS NULL OR _bq IS NULL THEN NULL
                      WHEN len(list_filter(_pr, v -> v IS NULL)) > 0
                        THEN NULL
                      ELSE COALESCE(CAST(list_sum(_pr) AS BIGINT), 0)
                 END AS dot_q
          FROM _p)
        SELECT query_id, {id_col}, dot_q, rank FROM (
          SELECT query_id, {id_col}, dot_q,
                 row_number() OVER (PARTITION BY query_id
                     ORDER BY dot_q DESC, {id_col}) AS rank
          FROM _s WHERE dot_q IS NOT NULL)
        WHERE rank <= {int(k)}"""
