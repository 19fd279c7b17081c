"""Token-budget shard packing for training-data pipelines.

Training jobs consume a corpus as fixed-budget shards (e.g. "~100M
tokens per file").  Assigning documents to shards must be deterministic
(resumable, re-runnable) and distributed (no driver-side loop over
documents).  The window-expressible scheme used here is *offset
packing*: documents take a deterministic total order, and a document
belongs to shard ``floor(start_offset / budget)`` where
``start_offset`` is the cumulative size of all documents before it.

Semantics (documented, engine-checkable):

- every shard except the last holds ≥ 1 document and its documents'
  start offsets span one ``budget`` window — so a shard's total size
  can overshoot ``budget`` by at most one document;
- a document larger than ``budget`` still lands in exactly one shard
  (the one its start offset falls in);
- "close the shard early when the next doc would overflow" is a
  sequential recurrence, NOT window-expressible — offset packing is the
  standard distributed relaxation.

Scale: one shuffle on the ``by`` columns; the cumulative sum is a
running ROWS window inside each partition.  Pack per group (source,
date, …): a global pack (``by=()``) degenerates to a single-task sort,
exactly like any global window — the API makes the partitioning
explicit so that cost is a visible choice.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from frames_map_reduce_spark.schema import require_columns

__all__ = ["pack_shards", "pack_sequences", "pack_sequences_sql",
           "write_packed_shards"]


def pack_shards(df: DataFrame, size_col: Column | str, budget: int,
                order_by: Sequence[str], by: Sequence[str] = (),
                shard_col: str = "shard_id") -> DataFrame:
    """Label every row with its shard index under offset packing.

    ``size_col``: a column name or expression giving each row's size
    (tokens, bytes…).  ``order_by`` must totally order rows within each
    ``by`` group (include a unique id) or shard assignment is
    nondeterministic.  Returns ``df`` + ``shard_col`` (bigint, 0-based
    per group).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if not order_by:
        raise ValueError("order_by must name at least one column")
    require_columns(df, [*by, *order_by])
    size = F.col(size_col) if isinstance(size_col, str) else size_col
    w = (Window.partitionBy(*[F.col(c) for c in by])
               .orderBy(*[F.col(c) for c in order_by])
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = F.sum(size).over(w) - size  # cumulative size BEFORE this row
    return df.withColumn(
        shard_col, F.floor(start / F.lit(budget)).cast("bigint"))


def pack_shards_sql(size_expr: str, budget: int, order_by: Sequence[str],
                    by: Sequence[str] = ()) -> str:
    """DuckDB twin: expression for the shard index (same offset-packing
    spec), to embed in a SELECT over the same ordered window."""
    part = f"PARTITION BY {', '.join(by)} " if by else ""
    order = ", ".join(order_by)
    cum = (f"sum({size_expr}) OVER ({part}ORDER BY {order} "
           f"ROWS UNBOUNDED PRECEDING)")
    return f"CAST(floor(({cum} - {size_expr}) / {budget}) AS BIGINT)"


def write_packed_shards(df: DataFrame, path: str, size_col: Column | str,
                        budget: int, order_by: Sequence[str],
                        by: Sequence[str] = (),
                        fmt: str = "parquet") -> None:
    """Materialize offset-packed shards as ONE FILE PER SHARD — the
    output stage of a training-data pipeline: each file's total
    ``size_col`` (tokens, bytes, …) stays within ``budget`` (single
    oversized rows excepted, as in :func:`pack_shards`).

    Plan: assign shard ids (:func:`pack_shards`, one window pass) →
    hash-repartition on the shard keys so each shard's rows co-locate in
    one task → partitioned write with one file per (by…, shard_id)
    directory.  The repartition is the only added shuffle, and its key
    count equals the shard count, which packing already bounded to
    ~total_size/budget — there is no small-files problem and no
    driver-side loop at any scale."""
    packed = pack_shards(df, size_col, budget, order_by, by)
    keys = [*by, "shard_id"]
    out = packed.repartition(*[F.col(k) for k in keys])
    (out.write.mode("overwrite").partitionBy(*keys).format(fmt).save(path))


def pack_sequences(df: DataFrame, size_col: Column | str, block: int,
                   order_by: Sequence[str], by: Sequence[str] = (),
                   seq_col: str = "seq_id") -> DataFrame:
    """Concat-and-chunk sequence packing — the GPT-style training-data
    layout: documents are (logically) concatenated in a deterministic
    order and the token stream is cut into fixed-``block``-token
    sequences, documents STRADDLING block boundaries (unlike
    :func:`pack_shards`, where a document belongs to exactly one shard).

    Returns the per-sequence packing manifest, one row per
    (``by``…, ``seq_col``): ``n_docs`` documents contributing tokens,
    ``n_tokens`` tokens falling in the block (== ``block`` everywhere
    except each group's final partial block), and ``n_starts`` documents
    whose first token lands there — exactly what a loader needs to seek
    into a packed corpus, and what a pipeline audits (fragmentation =
    docs split across sequences = n_docs − n_starts).

    Zero-size rows occupy no block and are excluded.  All arithmetic is
    BIGINT (offsets, integer floor-division block ids, least/greatest
    overlap widths) — engine-exact by design, no float ever enters.

    Scale: one shuffle on ``by`` for the running-offset window, one
    explode (a document emits one row per block it touches — total rows
    = corpus_tokens/block + n_docs at most), one 2-phase aggregation.
    A global pack (``by=()``) degenerates to a single-task window,
    exactly as documented for :func:`pack_shards` — partition the pack
    (per source, per shard) to parallelize."""
    if block <= 0:
        raise ValueError(f"block must be positive, got {block}")
    if not order_by:
        raise ValueError("order_by must name at least one column")
    require_columns(df, [*by, *order_by])
    size = F.col(size_col) if isinstance(size_col, str) else size_col
    w = (Window.partitionBy(*[F.col(c) for c in by])
               .orderBy(*[F.col(c) for c in order_by])
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    sized = (df.withColumn("_sz", size.cast("bigint"))
               .filter(F.col("_sz") > 0)
               .withColumn("_end", F.sum("_sz").over(w))
               .withColumn("_start", F.col("_end") - F.col("_sz")))
    blocks = sized.withColumn(
        seq_col, F.explode(F.sequence(F.expr(f"_start div {block}"),
                                      F.expr(f"(_end - 1) div {block}"))))
    lo = F.col(seq_col) * block          # block's first token offset
    hi = (F.col(seq_col) + 1) * block    # one past its last
    return (blocks.groupBy(*[F.col(c) for c in by], F.col(seq_col))
                  .agg(F.count(F.lit(1)).alias("n_docs"),
                       F.sum(F.least(F.col("_end"), hi)
                             - F.greatest(F.col("_start"), lo))
                        .alias("n_tokens"),
                       F.sum(F.when(F.col("_start") >= lo, 1).otherwise(0))
                        .alias("n_starts")))


def pack_sequences_sql(table_expr: str, size_expr: str, block: int,
                       order_by: Sequence[str], by: Sequence[str] = (),
                       seq_col: str = "seq_id") -> str:
    """DuckDB twin of :func:`pack_sequences` — same offsets (running
    BIGINT window sum), same inclusive ``generate_series`` block range
    (matching Spark's inclusive ``sequence``), same ``//`` integer floor
    division and least/greatest overlap arithmetic.  ``table_expr`` is a
    table name or parenthesized subquery providing ``size_expr`` and the
    ``by``/``order_by`` columns."""
    part = f"PARTITION BY {', '.join(by)} " if by else ""
    order = ", ".join(order_by)
    by_cols = "".join(f"{c}, " for c in by)
    return f"""
WITH _sized AS (
    SELECT {by_cols}{order}, CAST({size_expr} AS BIGINT) AS _sz
    FROM {table_expr}),
 _off AS (
    -- DuckDB's integer window sum widens to HUGEINT; pin BIGINT to
    -- match Spark's offsets (and generate_series' signature)
    SELECT *, CAST(sum(_sz) OVER ({part}ORDER BY {order}
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _end
    FROM _sized WHERE _sz > 0),
 _blocks AS (
    SELECT {by_cols}_sz, _end, _end - _sz AS _start,
           unnest(generate_series((_end - _sz) // {block},
                                  (_end - 1) // {block})) AS {seq_col}
    FROM _off)
SELECT {by_cols}{seq_col},
       count(*) AS n_docs,
       CAST(sum(least(_end, ({seq_col} + 1) * {block})
                - greatest(_start, {seq_col} * {block})) AS BIGINT)
        AS n_tokens,
       CAST(sum(CASE WHEN _start >= {seq_col} * {block} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_starts
FROM _blocks GROUP BY {by_cols}{seq_col}
"""
