"""Changelog (CDC) compaction: latest-wins snapshots from an append-only
event/update log.

A 100 TB ingestion pipeline rarely receives clean snapshots — it receives
changelogs (upserts + tombstones).  ``compact_latest`` reduces a log to
its current state in ONE 2-phase aggregation: ``max_by(payload-struct,
version-struct)`` partial-aggregates map-side (each task keeps one
candidate per key seen locally), so the shuffle carries at most
|distinct keys| rows per task — strictly cheaper than the window
``row_number() = 1`` formulation, which shuffles EVERY log row and
sorts whole key partitions.

The reference engine has no storage/CDC layer (SURVEY §2.1 — sources
are in-memory Foldables); this is part of the mandated scale-extension
surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from frames_map_reduce_spark.schema import require_columns

__all__ = ["compact_latest", "merge_upsert", "scd2_intervals",
           "snapshot_diff", "snapshot_diff_sql"]


def compact_latest(df: DataFrame, keys: Sequence[str],
                   version: Sequence[str],
                   payload: Sequence[str] | None = None,
                   tombstone: Column | None = None) -> DataFrame:
    """Latest row per ``keys``, "latest" = lexicographic max of
    ``version`` (include a unique id as the last version column or the
    winner among ties is nondeterministic).  ``payload`` defaults to all
    non-key columns.  ``tombstone`` (evaluated on the winning row)
    drops keys whose LATEST record is a delete — earlier deletes are
    correctly superseded by later upserts."""
    require_columns(df, [*keys, *version])
    payload = [c for c in df.columns if c not in keys] \
        if payload is None else list(payload)
    winner = F.max_by(F.struct(*payload), F.struct(*version)).alias("_w")
    out = (df.groupBy(*keys).agg(winner)
             .select(*keys, *[F.col(f"_w.{c}").alias(c) for c in payload]))
    if tombstone is not None:
        out = out.filter(~tombstone)
    return out


def merge_upsert(target: DataFrame, changes: DataFrame,
                 keys: Sequence[str], version: Sequence[str],
                 tombstone: Column | None = None,
                 only_newer: bool = False) -> DataFrame:
    """Batch MERGE INTO: apply a changelog to an existing snapshot.

    The latest change per key (lexicographic max of ``version``) wins
    within the batch; a winning ``tombstone`` row deletes the key; any
    other winning row replaces (or inserts) the target row.  Result
    schema is ``target``'s schema; ``changes`` must carry all of
    ``target``'s columns plus the ``version`` columns.  ``tombstone``
    is evaluated on the compacted winner AFTER projection to the target
    schema, so it may reference target columns only (a flag kept in the
    snapshot, not a changes-only column).

    ``only_newer=True`` additionally compares each winning change
    against the target row it would replace and keeps the TARGET side
    when its version is higher — the guard for out-of-order or replayed
    delta batches (requires the ``version`` columns to be part of the
    target schema).  A tombstoned key has no target row to defend
    itself with, so only upsert regressions are guarded; deliver
    deletes in order (the same boundary every retention-free table
    format has).

    **Incremental ≡ batch**: for a log split at any cutoff,
    ``merge_upsert(compact_latest(log[:t]), log[t:])`` equals
    ``compact_latest(log)`` — pinned in tests/test_cdc.py and by the
    driver oracle for ``merge_upsert`` (which is the full-log compaction
    SQL).  That equivalence is what makes daily incremental snapshot
    maintenance sound at 100 TB: recompacting the full history every day
    re-shuffles the whole log, while the merge touches only the delta.

    Scale: ONE 2-phase compaction shuffle over the delta (small), then a
    ``left_anti`` of the target against the delta's distinct keys — a
    build side of |delta keys| rows, which AQE broadcasts when it fits,
    so the 100 TB target is scanned once and never shuffled.  The final
    union is a no-shuffle concat.

    The reference has no mutation surface at all (SURVEY §2.1 — frames
    are immutable in-memory Foldables); this is scale-extension surface,
    same family as ``compact_latest``.
    """
    require_columns(changes, [*keys, *version])
    # reserved internal names: _is_delete would be silently OVERWRITTEN
    # by withColumn and then selected back into the result (corruption,
    # not an error); fail loudly instead, as leakage_safe_split does for
    # its internal columns
    reserved = {"_is_delete", "_target_version"}
    clash = sorted(reserved & (set(target.columns) | set(changes.columns)))
    if clash:
        raise ValueError(
            f"column names {clash} are reserved by merge_upsert; rename "
            "them in the input frames")
    missing = [c for c in target.columns if c not in changes.columns]
    if missing:
        raise ValueError(
            f"changes is missing target columns {missing}; MERGE needs "
            "the full target payload on every change row")
    if only_newer:
        vm = [c for c in version if c not in target.columns]
        if vm:
            raise ValueError(
                f"only_newer=True needs the version columns in the target "
                f"schema; missing {vm}")
    # Winning change per key, tombstone flag evaluated on the winner so a
    # delete followed by a later in-batch upsert correctly survives.
    payload = [c for c in target.columns if c not in keys]
    winners = compact_latest(changes, keys, version, payload=payload)
    if tombstone is not None:
        winners = winners.withColumn("_is_delete", tombstone)
    else:
        winners = winners.withColumn("_is_delete", F.lit(False))
    if only_newer:
        # An older-versioned delta must not regress the snapshot: drop
        # winners the target already supersedes.  The target's versions
        # for the touched keys come from a broadcast SEMI-join (build =
        # the small delta key set), so the big target is scanned —
        # column-pruned to keys+version — but never shuffled; the
        # resulting skinny frame is delta-sized and joins winners
        # broadcast-side.
        tv = (target.join(F.broadcast(winners.select(*keys)),
                          on=list(keys), how="left_semi")
                    .select(*keys,
                            F.struct(*version).alias("_target_version")))
        winners = (winners.join(F.broadcast(tv), on=list(keys), how="left")
                          .filter(F.col("_target_version").isNull()
                                  | (F.struct(*version)
                                     >= F.col("_target_version")))
                          .drop("_target_version"))
    upserts = winners.filter(~F.col("_is_delete")) \
                     .select(*target.columns)
    # Every surviving changed key leaves the target (replaced or
    # deleted); the anti-join build side is the compacted delta's key set.
    touched = winners.select(*keys)
    untouched = target.join(touched, on=list(keys), how="left_anti")
    return untouched.unionByName(upserts)


def scd2_intervals(df: DataFrame, keys: Sequence[str], ts_col: str,
                   order: Sequence[str] | None = None,
                   tombstone: Column | None = None,
                   valid_from: str = "valid_from",
                   valid_to: str = "valid_to",
                   current: str = "is_current") -> DataFrame:
    """Changelog → SCD-type-2 history: each record becomes a validity
    interval ``[ts, next record's ts)`` per key; the last interval is
    open (``valid_to`` null, ``is_current`` true).

    ``order`` is the total per-key ordering (default ``[ts_col]`` —
    append a unique id when timestamps can tie, or interval bounds are
    nondeterministic).  ``tombstone`` rows close the preceding interval
    (their ts becomes its ``valid_to``) but emit no interval themselves,
    so a key whose latest record is a delete has no current row.

    Scale: one shuffle on ``keys``; per-key history sorts locally inside
    the window, so state is bounded by the largest single key's history
    — the same bound any per-key versioning scheme needs.  There is no
    self-join (the naive formulation joins the log to itself on
    "next version").
    """
    require_columns(df, [*keys, ts_col])
    order = [ts_col] if order is None else list(order)
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order])
    out = (df.withColumn(valid_from, F.col(ts_col))
             .withColumn(valid_to, F.lead(ts_col).over(w)))
    if tombstone is not None:
        out = out.filter(~tombstone)
    return out.withColumn(current, F.col(valid_to).isNull())


def snapshot_diff(old: DataFrame, new: DataFrame, keys: Sequence[str],
                  value_col: str) -> DataFrame:
    """Snapshot-to-snapshot corpus diff — the data-versioning primitive
    an INCREMENTAL pipeline plans from: classify every key as
    ``added`` / ``removed`` / ``changed`` / ``unchanged`` between two
    snapshots, comparing ``value_col`` (pass a content fingerprint for
    document frames so the compare is a fixed-width equality, not a
    text compare).  Downstream, only ``added`` + ``changed`` keys need
    re-embedding/re-scoring and only ``removed`` need index eviction —
    at 100 TB the diff is one key-equality full-outer join (AQE-sized
    shuffle on the keys, no other pass over either snapshot).

    Presence is tracked with explicit markers, NOT value nullability —
    a key present with a NULL value is a real row (NULL == NULL counts
    as unchanged via null-safe equality), distinct from an absent key.

    Returns ``keys + (value_old, value_new, status)``."""
    from functools import reduce

    require_columns(old, [*keys, value_col])
    require_columns(new, [*keys, value_col])
    # dataset aliases: both snapshots often derive from ONE source frame
    # (two views of the same corpus), which trips Spark's ambiguous-
    # self-join detection unless columns are alias-qualified
    o = old.select(*keys, F.col(value_col).alias("value_old"),
                   F.lit(True).alias("_in_old")).alias("_sd_o")
    n = new.select(*keys, F.col(value_col).alias("value_new"),
                   F.lit(True).alias("_in_new")).alias("_sd_n")
    # NULL-SAFE key equality, matching the twin's IS NOT DISTINCT FROM:
    # a name-list join would never match NULL keys and misclassify the
    # same NULL-keyed row as removed+added
    cond = reduce(lambda a, b: a & b,
                  [F.col(f"_sd_o.{k}").eqNullSafe(F.col(f"_sd_n.{k}"))
                   for k in keys])
    j = o.join(n, cond, "full_outer")
    status = (
        F.when(~F.coalesce(F.col("_in_old"), F.lit(False)), "added")
         .when(~F.coalesce(F.col("_in_new"), F.lit(False)), "removed")
         .when(F.col("value_old").eqNullSafe(F.col("value_new")),
               "unchanged")
         .otherwise("changed"))
    return j.select(
        *[F.coalesce(F.col(f"_sd_o.{k}"), F.col(f"_sd_n.{k}")).alias(k)
          for k in keys],
        "value_old", "value_new", status.alias("status"))


def snapshot_diff_sql(old_from: str, new_from: str, keys: Sequence[str],
                      value_expr: str) -> str:
    """DuckDB twin of :func:`snapshot_diff` — same markers, same
    null-safe equality (``IS NOT DISTINCT FROM``), same precedence."""
    key_list = ", ".join(keys)
    on = " AND ".join(f"o.{k} IS NOT DISTINCT FROM n.{k}" for k in keys)
    key_out = ", ".join(f"coalesce(o.{k}, n.{k}) AS {k}" for k in keys)
    return f"""
        SELECT {key_out}, o.value_old, n.value_new,
               CASE WHEN o._in_old IS NULL THEN 'added'
                    WHEN n._in_new IS NULL THEN 'removed'
                    WHEN o.value_old IS NOT DISTINCT FROM n.value_new
                         THEN 'unchanged'
                    ELSE 'changed' END AS status
        FROM (SELECT {key_list}, {value_expr} AS value_old,
                     TRUE AS _in_old FROM {old_from}) o
        FULL OUTER JOIN
             (SELECT {key_list}, {value_expr} AS value_new,
                     TRUE AS _in_new FROM {new_from}) n
        ON {on}"""
