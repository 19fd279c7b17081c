"""Data layout for scan pruning: Z-order clustered parquet writes.

At 100 TB the cheapest query is the one that never reads most of the
files.  Parquet footers carry per-column min/max for every file and row
group; engines (Spark, Trino, DuckDB) prune scans against them — but the
stats only help if rows are CLUSTERED so each file covers a narrow range
of the filter columns.  Sorting clusters one column perfectly and the
rest not at all; interleaving the bits of several columns (a Z-order /
Morton curve — the technique behind Delta Lake's ``OPTIMIZE ZORDER BY``
and ClickHouse/Databricks layout tooling) keeps EVERY indexed column's
per-file extent near ``global_extent / n_files^(1/d)``, so selective
filters on any of them skip most files.

Spark-first shape: the Z-value is a pure JVM bitwise expression (no
Python in the row path), the clustering is one ``repartitionByRange`` on
that value (a single shuffle — exactly what any global sort costs)
followed by a within-partition sort, and the write is a plain parquet
sink.  Bounds for normalization come from one aggregate over the input
(a scan, no shuffle) or are caller-provided when known (e.g. from table
metadata on a maintained table).

The reference has no storage layer at all (SURVEY §2.1 — frames are
in-memory Foldables); this is scale-extension surface, the write-side
dual of the bucketed-join sink in ``sources.write_bucketed``.
"""

from __future__ import annotations

import re
from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from frames_map_reduce_spark.schema import require_columns

__all__ = ["z_value", "write_zordered", "write_zordered_fixed",
           "zorder_fixed_extents_sql", "file_column_stats",
           "box_prune_stats", "compaction_plan", "compaction_plan_sql",
           "parquet_file_manifest", "profile_frame", "profile_frame_sql"]


def z_value(df: DataFrame, cols: Sequence[str], bits: int = 12,
            bounds: Mapping[str, tuple[float, float]] | None = None,
            out: str = "_z") -> DataFrame:
    """Append a Z-order (Morton) key over ``cols``.

    Each column is min/max-normalized to a ``bits``-bit integer rank and
    the ranks' bits are interleaved — all as one JVM expression tree
    (``bits × len(cols)`` shift/mask/or terms, no UDF).  ``bounds`` maps
    column → (min, max); omitted columns get their bounds from ONE
    aggregate over ``df`` (scan-only, no shuffle).  Constant columns
    (min == max) rank as 0 via ``try_divide``.

    ``bits × len(cols)`` must be ≤ 62 (the key lives in a signed long;
    ANSI mode would throw on overflow rather than wrap).

    Caveat the Delta docs also carry: linear min/max normalization keys
    skew — a heavy-hitter value concentrates rank space.  The clustering
    property (narrow per-file extents) degrades gracefully; for heavily
    skewed columns, pre-bucket to ranks upstream.
    """
    cols = list(cols)
    require_columns(df, cols)
    if not cols:
        raise ValueError("z_value over zero columns")
    if bits * len(cols) > 62:
        raise ValueError(
            f"bits*len(cols) = {bits * len(cols)} exceeds 62; the Z key "
            "must fit a signed long")
    from pyspark.sql.types import NumericType

    for c in cols:
        dt = df.schema[c].dataType
        if not isinstance(dt, NumericType):
            raise ValueError(
                f"z_value needs numeric columns; {c} is "
                f"{dt.simpleString()} — cast (e.g. unix_micros for "
                "timestamps) or rank it upstream")
    bounds = dict(bounds or {})
    missing = [c for c in cols if c not in bounds]
    if missing:
        row = df.agg(*[e for c in missing
                       for e in (F.min(c).alias(f"lo_{c}"),
                                 F.max(c).alias(f"hi_{c}"))]).first()
        for c in missing:
            bounds[c] = (row[f"lo_{c}"], row[f"hi_{c}"])

    top = (1 << bits) - 1
    ranks: list[Column] = []
    for c in cols:
        lo, hi = bounds[c]
        if lo is None or hi is None:
            raise ValueError(f"column {c} is all-NULL; cannot Z-order on it")
        # NULLs sort to rank 0 (start of the curve) — deterministic, and
        # footer stats still prune on the non-null range.
        frac = F.try_divide(F.col(c).cast("double") - F.lit(float(lo)),
                            F.lit(float(hi) - float(lo)))
        rank = F.floor(F.coalesce(frac, F.lit(0.0)) * top).cast("long")
        ranks.append(F.greatest(F.lit(0), F.least(F.lit(top), rank)))

    d = len(cols)
    z: Column = F.lit(0).cast("long")
    for i in range(bits):
        for j, rank in enumerate(ranks):
            # bit i of rank j lands at interleaved position i*d + j.
            # shiftleft/shiftright take Python ints (not Columns) —
            # unrolled here, which also keeps the whole tree codegen-able.
            bit = F.shiftright(rank, i).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, i * d + j))
    return df.withColumn(out, z)


def write_zordered(df: DataFrame, path: str, cols: Sequence[str],
                   bits: int = 12, num_files: int | None = None,
                   bounds: Mapping[str, tuple[float, float]] | None = None,
                   mode: str = "error") -> None:
    """Write ``df`` as parquet clustered on the Z-order curve of ``cols``.

    ONE range shuffle on the Z key (`repartitionByRange` — the same cost
    as any global sort) + a within-partition sort, so each output file
    covers a contiguous curve segment and its footer min/max for every
    ``cols`` member is tight.  The Z key itself is dropped before the
    write — it is a layout device, not data.

    ``num_files`` defaults to the session shuffle parallelism; at scale
    pick it so files land near your target size (the
    ``write_packed_shards`` sizing notes apply).
    """
    zdf = z_value(df, cols, bits=bits, bounds=bounds, out="_z")
    n = num_files or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    (zdf.repartitionByRange(n, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode).parquet(path))


def write_zordered_fixed(df: DataFrame, path: str, cols: Sequence[str],
                         bits: int = 10, n_files: int = 16,
                         bounds: Mapping[str, tuple[float, float]] | None = None,
                         mode: str = "overwrite",
                         fid_col: str = "zfid") -> None:
    """Z-order clustered parquet write with DETERMINISTIC fixed-width
    curve segments: file id = the top ``log2(n_files)`` bits of the
    Z key (``z >> (bits·d − log2 n)``), written as a hive partition
    directory ``{fid_col}=k`` with exactly one file per populated
    segment (all rows of a segment hash to one task, ``partitionBy``
    splits tasks by segment).

    vs :func:`write_zordered`: that one balances FILE SIZES via
    ``repartitionByRange`` (sampled range bounds — the right default for
    skewed production data, but the sample makes the row→file mapping
    an implementation detail).  Fixed-width segments make the mapping a
    PURE FUNCTION of the row and the (data-derived or caller-pinned)
    bounds — replayable in any engine from the same arithmetic, which is
    what lets the layout family carry a value-level differential oracle
    (:func:`zorder_fixed_extents_sql`).  The trade: a heavily skewed
    column concentrates rows in few segments (file sizes vary); prefer
    the ranged writer when balance matters more than replayability.

    ``n_files`` must be a power of two ≤ 2^(bits·d).
    """
    cols = list(cols)
    k = n_files.bit_length() - 1
    if n_files <= 0 or (1 << k) != n_files:
        raise ValueError(f"n_files must be a power of two, got {n_files}")
    if k > bits * len(cols):
        raise ValueError(
            f"n_files=2^{k} exceeds the 2^{bits * len(cols)} curve points")
    zdf = z_value(df, cols, bits=bits, bounds=bounds, out="_z")
    fid = F.shiftrightunsigned(F.col("_z"),
                               bits * len(cols) - k).cast("int")
    (zdf.withColumn(fid_col, fid)
        .drop("_z")
        .repartition(n_files, F.col(fid_col))
        .write.mode(mode).partitionBy(fid_col).parquet(path))


def zorder_fixed_extents_sql(src_sql: str, cols: Sequence[str],
                             bits: int = 10, n_files: int = 16,
                             fid_col: str = "zfid",
                             bounds: Mapping[str, tuple[float, float]]
                             | None = None) -> str:
    """DuckDB twin of the :func:`write_zordered_fixed` layout contract
    (differential oracle for the layout family): replays the exact
    normalization / rank-clamp / bit-interleave / top-bit-segment
    arithmetic of :func:`z_value` + the fixed-width file assignment as
    pure SQL over ``src_sql`` (a SELECT producing exactly the typed
    columns ``cols``, mirroring the Spark-side projection), and returns
    per-segment ``({fid_col}, n_files, num_rows, <col>_min, <col>_max)``
    — the values a footer audit (:func:`file_column_stats`) of the
    written files must reproduce bit-for-bit: parquet min/max stats are
    exact for integral and (NaN-free) floating columns, both engines'
    double arithmetic is IEEE, and the bounds aggregate commutes with
    the double cast.  ``n_files`` is the literal 1: one file per
    populated segment is part of the write contract.

    ``bounds``, when given, must be the SAME caller-pinned mapping the
    write used — the twin then emits the pinned values as literals
    instead of deriving them from the data (r6 ADVICE: a write with
    explicit bounds paired with a data-derived twin would silently
    compute different segment assignments).  Partial pinning (only some
    columns) mixes literals with derived bounds, exactly like
    :func:`z_value`."""
    cols = list(cols)
    k = n_files.bit_length() - 1
    if n_files <= 0 or (1 << k) != n_files:
        raise ValueError(f"n_files must be a power of two, got {n_files}")
    d = len(cols)
    top = (1 << bits) - 1
    bounds = dict(bounds or {})
    st_parts = ", ".join(
        (f"CAST({float(bounds[c][0])!r} AS DOUBLE) AS _lo{j}, "
         f"CAST({float(bounds[c][1])!r} AS DOUBLE) AS _hi{j}")
        if c in bounds else
        (f"CAST(min({c}) AS DOUBLE) AS _lo{j}, "
         f"CAST(max({c}) AS DOUBLE) AS _hi{j}")
        for j, c in enumerate(cols))
    rk_parts = ", ".join(
        f"greatest(CAST(0 AS BIGINT), least(CAST({top} AS BIGINT), "
        f"CAST(floor(coalesce((CAST({c} AS DOUBLE) - _lo{j}) / "
        f"nullif(_hi{j} - _lo{j}, 0), 0.0) * {top}) AS BIGINT))) AS _r{j}"
        for j, c in enumerate(cols))
    z_terms = " | ".join(
        f"(((_r{j} >> {i}) & 1) << {i * d + j})"
        for i in range(bits) for j in range(d))
    aggs = ", ".join(f"min({c}) AS {c}_min, max({c}) AS {c}_max"
                     for c in cols)
    shift = bits * d - k
    # all-pinned bounds leave no aggregate to collapse _st to one row —
    # drop the FROM clause in that case (a bare SELECT is one row)
    st_from = "" if all(c in bounds for c in cols) else " FROM _src"
    return f"""
        WITH _src AS ({src_sql}),
        _st AS (SELECT {st_parts}{st_from}),
        _rk AS (SELECT _src.*, {rk_parts} FROM _src CROSS JOIN _st),
        _z AS (SELECT *, ({z_terms}) AS _zv FROM _rk)
        SELECT CAST(_zv >> {shift} AS INT) AS {fid_col},
               CAST(1 AS BIGINT) AS n_files,
               count(*) AS num_rows, {aggs}
        FROM _z GROUP BY {fid_col}"""


def file_column_stats(path: str, cols: Sequence[str]) -> list[dict]:
    """Per-file min/max from parquet footers — the audit view of what a
    stats-pruning scan would see.  Driver-side utility (reads footers
    only, never data pages); one dict per data file:
    ``{"file": ..., "num_rows": ..., "<col>_min": ..., "<col>_max": ...}``.
    """
    import pyarrow.dataset as ds

    out: list[dict] = []
    dataset = ds.dataset(path, format="parquet")
    for frag in dataset.get_fragments():
        meta = frag.metadata
        # row-group column metadata is indexed by FLATTENED LEAF columns
        # (nested/list/struct fields each occupy leaf slots), so resolve
        # indices from the parquet schema's leaf paths — enumerating
        # physical_schema.names would silently shift after any nested
        # column and read min/max from the wrong leaf (r4 ADVICE)
        pq_schema = meta.schema
        names = {}
        for i in range(len(pq_schema)):
            p = pq_schema.column(i).path
            if p not in names:          # first leaf wins for nested paths
                names[p] = i
        rec: dict = {"file": frag.path, "num_rows": meta.num_rows}
        for c in cols:
            lo = hi = None
            if c not in names:
                raise KeyError(
                    f"column {c!r} is not a flat leaf column of {frag.path}; "
                    f"stats audit supports top-level atomic columns only "
                    f"(leaves: {sorted(names)[:20]})")
            idx = names[c]
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    lo = hi = None
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            rec[f"{c}_min"], rec[f"{c}_max"] = lo, hi
        out.append(rec)
    return out


def box_prune_stats(path: str, box: Mapping[str, tuple]) -> dict:
    """What a min/max-stats-pruning scan would do for a box query over
    the files at ``path`` — the AUDIT of the layout's pruning value
    (driver-side, footers only, never data pages).

    ``box`` maps column → (lo, hi) inclusive.  A file can be skipped
    iff its footer proves NO row can match: some column's
    ``[min, max]`` range misses ``[lo, hi]`` entirely.  Files without
    usable stats for a box column must be read (never wrongly pruned).
    Returns ``{"files_total", "files_pruned", "rows_in_read_files"}`` —
    the last is the scan cost the surviving files impose, the number a
    100 TB capacity plan actually budgets."""
    stats = file_column_stats(path, list(box))
    total = pruned = rows_read = 0
    for rec in stats:
        total += 1
        skip = False
        for c, (lo, hi) in box.items():
            mn, mx = rec[f"{c}_min"], rec[f"{c}_max"]
            if mn is not None and mx is not None and (mx < lo or mn > hi):
                skip = True
                break
        if skip:
            pruned += 1
        else:
            rows_read += rec["num_rows"]
    return {"files_total": total, "files_pruned": pruned,
            "rows_in_read_files": rows_read}


def compaction_plan(manifest: DataFrame, file_col: str, bytes_col: str,
                    target_bytes: int,
                    partition_cols: Sequence[str] = ()) -> DataFrame:
    """Small-files compaction plan — the standing maintenance job every
    large parquet table needs (the ``OPTIMIZE``/bin-packing half of
    what :func:`write_zordered` is the clustering half of): group a
    partition's files into rewrite tasks of roughly ``target_bytes``
    each, so a 100 TB table accreted in tiny increments (streaming
    sinks, per-batch overwrites, CDC deltas) stops paying per-file open
    cost on every scan.

    Input is a MANIFEST frame — one row per file with its size (from
    :func:`parquet_file_manifest`, a catalog, or any listing) — so the
    planner is pure DataFrame logic: within each partition, files order
    by (bytes DESC, file) and fill output groups sequentially,
    ``group = cumulative_bytes_before div target_bytes`` — the classic
    streaming first-fill approximation of bin packing (largest-first
    ordering bounds each group's overshoot by less than its largest
    remaining file).  All INTEGER arithmetic on exact byte counts —
    the plan is deterministic and engine-stable.

    Output: ``partition_cols``..., ``file_col``, ``bytes`` (BIGINT),
    ``grp`` (BIGINT rewrite-task id within the partition).  Files
    larger than ``target_bytes`` get a group of their own (cum div
    target jumps past them) and are left for the caller to split or
    skip — a planner never rewrites a healthy big file into pieces.

    Scale shape: one window over the manifest keyed by the partition
    columns — the manifest is rows-per-FILE, millions at most for a
    100 TB table, so this is a skinny frame by construction; the heavy
    work (the rewrites) is the caller's per-group jobs.
    """
    require_columns(manifest, [file_col, bytes_col, *partition_cols])
    if target_bytes < 1:
        raise ValueError(f"need target_bytes >= 1, got {target_bytes}")
    from pyspark.sql import Window

    w = (Window.partitionBy(*[F.col(c) for c in partition_cols])
         if partition_cols else Window.partitionBy(F.lit(1)))
    w = (w.orderBy(F.col(bytes_col).desc(), file_col)
          .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(F.sum(F.col(bytes_col).cast("bigint")).over(w),
                            F.lit(0))
    staged = manifest.select(
        *partition_cols, file_col,
        F.col(bytes_col).cast("bigint").alias("bytes"),
        cum_before.alias("_cb"))
    # integer div (`div`), not `/` — float division misplaces the floor
    # once cumulative bytes pass 2^53 (a few PB: reachable for a table
    # manifest, and wrong is wrong)
    return staged.select(*partition_cols, file_col, "bytes",
                         F.expr(f"_cb div {target_bytes}").alias("grp"))


def compaction_plan_sql(manifest_sel: str, file_col: str, bytes_col: str,
                        target_bytes: int,
                        partition_cols: Sequence[str] = ()) -> str:
    """DuckDB twin of :func:`compaction_plan` (differential oracle)."""
    parts = ", ".join(partition_cols) if partition_cols else "1"
    cols = "".join(f"{c}, " for c in partition_cols)
    return f"""
        SELECT {cols}{file_col}, CAST({bytes_col} AS BIGINT) AS bytes,
               (coalesce(sum(CAST({bytes_col} AS BIGINT)) OVER (
                   PARTITION BY {parts}
                   ORDER BY {bytes_col} DESC, {file_col}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               // {target_bytes})::BIGINT AS grp
        FROM ({manifest_sel})"""


def parquet_file_manifest(spark, path: str) -> DataFrame:
    """File manifest of a parquet directory — the input
    :func:`compaction_plan` consumes: one row per data file with
    ``(file STRING, bytes BIGINT)``.  Uses pyarrow's dataset listing
    (the :func:`file_column_stats` convention — metadata only, never
    data pages); driver-side by the same bounded-manifest contract
    (rows per FILE, not per record).  Sizes come from the dataset's
    OWN filesystem handle (``get_file_info``), so the manifest works on
    every pyarrow-supported filesystem (s3://, gs://, hdfs://, local) —
    ``os.path.getsize`` would silently narrow the contract to local
    paths (r10 ADVICE)."""
    import pyarrow.dataset as ds

    dataset = ds.dataset(path, format="parquet")
    infos = dataset.filesystem.get_file_info(list(dataset.files))
    rows = [(i.path, int(i.size)) for i in infos]
    return spark.createDataFrame(rows, "file string, bytes long")


#: Profiled column names are interpolated into generated SQL text (the
#: stack arm literals here, the count(c) arms in the DuckDB twin), so
#: they must be plain identifiers — a quote/backtick/paren in a name
#: would break or silently change the generated query (r11 ADVICE).
#: Validated, not escaped: the twin must stay dialect-portable, and a
#: corpus schema with SQL-special column names is an upstream smell.
_PLAIN_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _require_plain_idents(cols: Sequence[str], where: str) -> None:
    bad = [c for c in cols if not _PLAIN_IDENT.match(c)]
    if bad:
        raise ValueError(
            f"{where}: column names must be plain identifiers "
            f"([A-Za-z_][A-Za-z0-9_]*) because they are interpolated "
            f"into generated SQL; rename or alias first: {bad!r}")


def profile_frame(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """ANALYZE-style whole-frame data profile — the table-stats pass
    every maintained table runs before layout decisions (this module's
    z-order bounds, the optimizer's broadcast thresholds, a pipeline's
    null-rate assertions all start here): ONE row per profiled column
    with

    ``col_name`` (STRING), ``n_rows`` / ``n_nulls`` / ``n_distinct``
    (BIGINT, distinct is EXACT and excludes NULLs — the SQL
    ``count(DISTINCT col)`` convention), ``min_value`` / ``max_value``
    (STRING — the native-type min/max rendered to text AFTER the
    aggregation, so numeric columns order numerically, not
    lexicographically; NULL for all-NULL columns).

    Scale shape: ONE aggregation pass.  The k exact multi-column
    distincts compile to Spark's Expand strategy — k× map-side row
    expansion into one 2-phase aggregate, the documented price of
    exactness (at extreme scale profile a sample, or swap in
    ``approx_count_distinct`` upstream — the exact form is what the
    cross-engine oracle needs).  The wide 1-row aggregate is then
    unpivoted to the per-column long form by a ``stack`` projection —
    no second pass, no driver-side loop.

    String rendering caveat (documented, not guarded): integer and
    string columns render identically on every engine; DOUBLE columns
    use each engine's float-to-text rules — profile those via an
    integer-quantized projection when cross-engine hash equality
    matters (the repo's exact-integer staging convention).
    """
    cols = list(cols) if cols is not None else list(df.columns)
    require_columns(df, cols)
    if not cols:
        raise ValueError("profile_frame needs at least one column")
    _require_plain_idents(cols, "profile_frame")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_n")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.col(c)).cast("bigint").alias(f"_nn{i}"),
            F.count_distinct(F.col(c)).cast("bigint").alias(f"_nd{i}"),
            F.min(F.col(c)).cast("string").alias(f"_mn{i}"),
            F.max(F.col(c)).cast("string").alias(f"_mx{i}"),
        ]
    wide = df.agg(*aggs)
    arms = ", ".join(
        f"'{c}', _nn{i}, _nd{i}, _mn{i}, _mx{i}" for i, c in enumerate(cols))
    stacked = wide.select(
        F.col("_n"),
        F.expr(f"stack({len(cols)}, {arms}) AS "
               f"(col_name, _nn, n_distinct, min_value, max_value)"))
    return stacked.select(
        "col_name",
        F.col("_n").alias("n_rows"),
        (F.col("_n") - F.col("_nn")).cast("bigint").alias("n_nulls"),
        "n_distinct", "min_value", "max_value")


def profile_frame_sql(table: str, cols: Sequence[str]) -> str:
    """DuckDB twin of :func:`profile_frame` (differential oracle): the
    same single wide aggregate, unpivoted by UNION ALL of literal
    projections (DuckDB's ``unpivot`` cannot mix types; the generated
    arms are the stack projection spelled out)."""
    cols = list(cols)
    if not cols:
        raise ValueError("profile_frame_sql needs at least one column")
    _require_plain_idents(cols, "profile_frame_sql")
    inner = ["count(*) AS _n"]
    for i, c in enumerate(cols):
        inner += [f"count({c}) AS _nn{i}",
                  f"count(DISTINCT {c}) AS _nd{i}",
                  f"CAST(min({c}) AS VARCHAR) AS _mn{i}",
                  f"CAST(max({c}) AS VARCHAR) AS _mx{i}"]
    arms = " UNION ALL ".join(
        f"SELECT '{c}' AS col_name, _n::BIGINT AS n_rows, "
        f"(_n - _nn{i})::BIGINT AS n_nulls, _nd{i}::BIGINT AS n_distinct, "
        f"_mn{i} AS min_value, _mx{i} AS max_value FROM _pf_wide"
        for i, c in enumerate(cols))
    return (f"WITH _pf_wide AS (SELECT {', '.join(inner)} FROM {table}) "
            + arms)
