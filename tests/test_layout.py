"""Z-order clustered writes (operators/layout.py): key correctness,
and the property that pays for itself at 100 TB — per-file footer
min/max extents tight enough on EVERY indexed column that a selective
filter skips most files.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frames_map_reduce_spark.operators.layout import (
    file_column_stats,
    write_zordered,
    z_value,
)


def _morton2(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_reference_interleave(spark):
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x long, y long")
    # bounds pinned to the rank domain so rank == raw value exactly
    out = z_value(df, ["x", "y"], bits=3, bounds={"x": (0, 7), "y": (0, 7)})
    got = {(r["x"], r["y"]): r["_z"] for r in out.collect()}
    for (x, y), zv in got.items():
        assert zv == _morton2(x, y, 3), (x, y)


def test_z_value_guards(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError, match="exceeds 62"):
        z_value(df, ["x", "y"], bits=32)
    with pytest.raises(ValueError, match="zero columns"):
        z_value(df, [])
    allnull = spark.createDataFrame([(None,)], "x double")
    with pytest.raises(ValueError, match="all-NULL"):
        z_value(allnull, ["x"])


def test_constant_column_ranks_zero(spark):
    df = spark.createDataFrame([(5, i) for i in range(4)], "c long, y long")
    out = z_value(df, ["c", "y"], bits=2)   # c: min==max -> try_divide NULL -> 0
    assert all(r["_z"] == _morton2(0, r["y"], 2) for r in out.collect())


@pytest.fixture(scope="module")
def grid_paths(spark, tmp_path_factory):
    """40k-point 2-D grid written twice: Z-ordered vs hash-scattered."""
    base = tmp_path_factory.mktemp("layout")
    n_side = 200
    df = (spark.range(n_side * n_side)
               .select((F.col("id") % n_side).alias("x"),
                       (F.col("id") / n_side).cast("long").alias("y"),
                       F.col("id").alias("payload")))
    zpath = str(base / "zordered")
    rpath = str(base / "scattered")
    write_zordered(df, zpath, ["x", "y"], bits=8, num_files=16)
    df.repartition(16).write.parquet(rpath)
    return zpath, rpath


def test_zorder_tightens_per_file_extents(grid_paths):
    zpath, rpath = grid_paths
    zstats = file_column_stats(zpath, ["x", "y"])
    rstats = file_column_stats(rpath, ["x", "y"])
    assert len(zstats) == 16

    def mean_extent(stats, col):
        spans = [s[f"{col}_max"] - s[f"{col}_min"] for s in stats]
        return sum(spans) / len(spans)

    for col in ("x", "y"):
        # 16 files on a 2-D curve ~ 4x4 tiles: extent ~ 1/4 of global.
        # Random placement puts ~the whole range in every file.
        assert mean_extent(zstats, col) < 0.55 * 199, col
        assert mean_extent(rstats, col) > 0.9 * 199, col
        assert mean_extent(zstats, col) < 0.6 * mean_extent(rstats, col), col


def test_zorder_skips_files_for_box_query(grid_paths):
    """The pruning a stats-aware scan performs: a 15%x15% box query
    must intersect only a minority of Z-ordered files but every
    scattered file."""
    zpath, rpath = grid_paths

    def files_hit(stats, box):
        (x0, x1), (y0, y1) = box
        return sum(1 for s in stats
                   if s["x_min"] <= x1 and s["x_max"] >= x0
                   and s["y_min"] <= y1 and s["y_max"] >= y0)

    box = ((10, 40), (10, 40))
    zhit = files_hit(file_column_stats(zpath, ["x", "y"]), box)
    rhit = files_hit(file_column_stats(rpath, ["x", "y"]), box)
    assert rhit == 16
    assert zhit <= 8


def test_zordered_roundtrip_preserves_rows(spark, grid_paths):
    zpath, _ = grid_paths
    back = spark.read.parquet(zpath)
    assert back.count() == 200 * 200
    agg = back.agg(F.sum("payload").alias("s"),
                   F.count_distinct("x", "y").alias("d")).first()
    assert agg["s"] == (200 * 200) * (200 * 200 - 1) // 2
    assert agg["d"] == 200 * 200


def test_file_column_stats_nested_schema_leaf_indexing(spark, tmp_path):
    """Row-group column stats are indexed by flattened LEAF columns:
    a struct/list column before `b` shifts the leaf indices, which the
    old top-level-name enumeration read straight through — min/max came
    from the wrong physical column without an error (r4 ADVICE)."""
    from frames_map_reduce_spark.operators.layout import file_column_stats

    path = str(tmp_path / "nested")
    df = spark.createDataFrame(
        [(1, (100, 200), 7), (2, (300, 400), 9)],
        "a long, s struct<x: long, y: long>, b long")
    df.coalesce(1).write.parquet(path)
    stats = file_column_stats(path, ["a", "b"])
    assert len(stats) == 1
    assert stats[0]["a_min"] == 1 and stats[0]["a_max"] == 2
    # with name-position indexing b would have read s.x's stats (100/300)
    assert stats[0]["b_min"] == 7 and stats[0]["b_max"] == 9

    import pytest as _pytest
    with _pytest.raises(KeyError, match="leaf"):
        file_column_stats(path, ["s"])


def test_write_zordered_fixed_contract(spark, tmp_path):
    """The deterministic fixed-segment writer: exactly one file per
    populated segment, file contents reproduce the pure-SQL segment
    assignment (DuckDB twin), and a rerun is byte-stable at the
    extents level — the replayability that buys the layout family its
    value-level oracle."""
    import re

    import duckdb

    from frames_map_reduce_spark.operators.layout import (
        write_zordered_fixed,
        zorder_fixed_extents_sql,
    )

    df = spark.range(5000).select(
        (F.col("id") % 97).cast("double").alias("x"),
        (F.col("id") % 89).cast("bigint").alias("y"))
    path = str(tmp_path / "zfix")

    with pytest.raises(ValueError, match="power of two"):
        write_zordered_fixed(df, path, ["x", "y"], n_files=12)

    def extents():
        write_zordered_fixed(df, path, ["x", "y"], bits=8, n_files=8)
        per_fid = {}
        for rec in file_column_stats(path, ["x", "y"]):
            fid = int(re.search(r"zfid=(\d+)/", rec["file"]).group(1))
            per_fid.setdefault(fid, []).append(
                (rec["num_rows"], rec["x_min"], rec["x_max"],
                 rec["y_min"], rec["y_max"]))
        return per_fid

    first = extents()
    assert all(len(files) == 1 for files in first.values())
    assert extents() == first  # rerun (overwrite) is extent-stable

    df.toPandas().to_parquet(str(tmp_path / "src.parquet"), index=False)
    con = duckdb.connect()
    rows = con.sql(zorder_fixed_extents_sql(
        f"SELECT x, y FROM '{tmp_path}/src.parquet'", ["x", "y"],
        bits=8, n_files=8)).fetchall()
    want = {r[0]: [(r[2], r[3], r[4], r[5], r[6])] for r in rows}
    got = {fid: [(n, xmin, xmax, ymin, ymax)]
           for fid, [(n, xmin, xmax, ymin, ymax)] in first.items()}
    assert got == want


def test_ranged_writer_prunes_box_queries(spark, grid_paths):
    """The ranged writer's pruning VALUE, pinned behaviorally (r6
    verdict #6): its row→file mapping rides repartitionByRange's
    sampled boundaries, so no other engine can replay per-file extents
    value-for-value (the fixed-segment writer carries that oracle —
    q_zorder_pruning); what CAN be proven here is that the audit's
    pruning decisions are sound and worth something: >0 files pruned
    for a small box, pruned files contain zero matching rows, and
    surviving files contain every match."""
    from frames_map_reduce_spark.operators.layout import box_prune_stats
    zpath, _ = grid_paths
    box = {"x": (10, 40), "y": (10, 40)}
    audit = box_prune_stats(zpath, box)
    assert audit["files_total"] == 16
    assert 0 < audit["files_pruned"] < 16
    assert audit["rows_in_read_files"] < 40_000  # real scan savings
    # soundness: every matching row lives in a surviving (read) file
    stats = file_column_stats(zpath, ["x", "y"])
    pruned_files = [s["file"] for s in stats
                    if s["x_max"] < 10 or s["x_min"] > 40
                    or s["y_max"] < 10 or s["y_min"] > 40]
    assert len(pruned_files) == audit["files_pruned"]
    in_pruned = (spark.read.parquet(*pruned_files)
                 .filter(F.col("x").between(10, 40)
                         & F.col("y").between(10, 40)).count())
    assert in_pruned == 0
    survivors = [s["file"] for s in stats if s["file"] not in pruned_files]
    matches = (spark.read.parquet(*survivors)
               .filter(F.col("x").between(10, 40)
                       & F.col("y").between(10, 40)).count())
    assert matches == 31 * 31  # every match is reachable


def test_fixed_extents_sql_pinned_bounds(spark, tmp_path):
    """r6 ADVICE: the SQL twin must honor caller-pinned bounds — a
    write with explicit bounds and a data-derived twin would silently
    disagree on segment assignment.  Pin bounds wider than the data and
    check twin == footer audit, all-pinned and partially-pinned."""
    import duckdb
    import pandas as pd
    from frames_map_reduce_spark.operators.layout import (
        write_zordered_fixed, zorder_fixed_extents_sql)
    pdf = pd.DataFrame({"a": [float(i * 7 % 50) for i in range(200)],
                        "b": [i * 13 % 80 for i in range(200)]})
    df = spark.createDataFrame(pdf, "a double, b bigint")
    for bounds in ({"a": (0.0, 100.0), "b": (0.0, 100.0)},
                   {"a": (0.0, 100.0)}):
        path = str(tmp_path / f"zb{len(bounds)}")
        write_zordered_fixed(df, path, ["a", "b"], bits=6, n_files=8,
                             bounds=bounds)
        got = {}
        for rec in file_column_stats(path, ["a", "b"]):
            import re
            fid = int(re.search(r"zfid=(\d+)/", rec["file"]).group(1))
            got[fid] = (rec["num_rows"], rec["a_min"], rec["a_max"],
                        rec["b_min"], rec["b_max"])
        con = duckdb.connect()
        con.register("src", pdf)
        sql = zorder_fixed_extents_sql(
            "SELECT CAST(a AS DOUBLE) AS a, CAST(b AS BIGINT) AS b "
            "FROM src", ["a", "b"], bits=6, n_files=8, bounds=bounds)
        want = {int(r[0]): (int(r[2]), r[3], r[4], r[5], r[6])
                for r in con.sql(sql).fetchall()}
        assert got == want, bounds


# ---------------------------------------------------------------------------
# Compaction planner
# ---------------------------------------------------------------------------

def _manifest(spark, sizes, part="p0"):
    rows = [(part, f"f{i:03d}", int(s)) for i, s in enumerate(sizes)]
    return spark.createDataFrame(rows, "part string, file string, bytes long")


def test_compaction_plan_groups_fill_sequentially(spark):
    """Largest-first sequential fill: groups accumulate ~target bytes,
    every file appears exactly once, and group ids are dense from 0."""
    from frames_map_reduce_spark.operators.layout import compaction_plan

    m = _manifest(spark, [700, 300, 200, 100, 900, 50])
    plan = compaction_plan(m, "file", "bytes", 1000,
                           partition_cols=["part"]).collect()
    assert len(plan) == 6
    by_grp: dict = {}
    for r in plan:
        by_grp.setdefault(r.grp, []).append(r.bytes)
    # size-desc order: 900,700,300,200,100,50
    # cum_before:        0, 900,1600,1900,2100,2200 -> grp 0,0,1,1,2,2
    assert sorted(by_grp) == [0, 1, 2]
    assert sorted(by_grp[0]) == [700, 900]   # 1600 bytes: overshoot < 700
    assert sorted(by_grp[1]) == [200, 300]
    assert sorted(by_grp[2]) == [50, 100]


def test_compaction_plan_oversized_file_gets_own_group(spark):
    """A file larger than target advances cum past itself: nothing else
    lands in its group when it leads the partition."""
    from frames_map_reduce_spark.operators.layout import compaction_plan

    m = _manifest(spark, [5000, 10, 10])
    plan = {r.file: r.grp for r in
            compaction_plan(m, "file", "bytes", 1000,
                            partition_cols=["part"]).collect()}
    assert plan["f000"] == 0            # the 5000-byte file
    assert plan["f001"] == plan["f002"] == 5  # cum 5000, 5010 -> grp 5


def test_compaction_plan_partitions_are_independent(spark):
    """Group ids restart per partition — a plan never merges files
    across partition boundaries."""
    from frames_map_reduce_spark.operators.layout import compaction_plan

    rows = [("a", "f1", 1000), ("a", "f2", 600),
            ("b", "f3", 1000), ("b", "f4", 600)]
    m = spark.createDataFrame(rows, "part string, file string, bytes long")
    plan = {r.file: (r.part, r.grp) for r in
            compaction_plan(m, "file", "bytes", 1000,
                            partition_cols=["part"]).collect()}
    # within each partition: cum_before 0 -> grp 0, then 1000 -> grp 1;
    # partition b restarts at 0 instead of continuing a's fill
    assert plan["f1"] == ("a", 0) and plan["f2"] == ("a", 1)
    assert plan["f3"] == ("b", 0) and plan["f4"] == ("b", 1)


def test_compaction_plan_rejects_bad_target(spark):
    import pytest

    from frames_map_reduce_spark.operators.layout import compaction_plan

    m = _manifest(spark, [10])
    with pytest.raises(ValueError):
        compaction_plan(m, "file", "bytes", 0)


def test_parquet_manifest_feeds_planner(spark, tmp_path):
    """End-to-end ops arc: list a real parquet dir, plan its rewrite —
    manifest bytes must equal the on-disk sizes and the plan must cover
    every file exactly once."""
    import glob
    import os

    from frames_map_reduce_spark.operators.layout import (
        compaction_plan,
        parquet_file_manifest,
    )

    p = str(tmp_path / "t")
    spark.range(1000).repartition(6).write.parquet(p)
    m = parquet_file_manifest(spark, p)
    files = sorted(glob.glob(f"{p}/part-*.parquet"))
    got = {r.file: r.bytes for r in m.collect()}
    assert sorted(got) == files
    assert all(got[f] == os.path.getsize(f) for f in files)
    plan = compaction_plan(m, "file", "bytes", 1 << 30).collect()
    assert sorted(r.file for r in plan) == files
    assert all(r.grp == 0 for r in plan)   # tiny files, one group


def test_profile_frame_single_pass_plan(spark):
    """profile_frame must stay ONE aggregation pass: the exact
    multi-distincts compile to Expand into a 2-phase aggregate, the
    unpivot is a stack projection — no Python stages, no join, no
    second scan of the input."""
    from frames_map_reduce_spark.operators.layout import profile_frame
    from frames_map_reduce_spark.plans import explain_formatted

    df = spark.range(100).selectExpr("id", "cast(id % 7 as string) AS s")
    plan = explain_formatted(profile_frame(df, ["id", "s"]))
    assert "EvalPython" not in plan and "InPandas" not in plan
    assert "Expand" in plan
    assert plan.count("Scan") <= 1


def test_profile_frame_validation(spark):
    from frames_map_reduce_spark.operators.layout import (
        profile_frame,
        profile_frame_sql,
    )

    df = spark.range(3)
    with pytest.raises(ValueError):
        profile_frame(df, [])
    with pytest.raises(ValueError):
        profile_frame_sql("t", [])
    with pytest.raises(Exception):
        profile_frame(df, ["nope"])
    # SQL-special column names are rejected with a NAMED error before
    # they reach the generated stack/UNION arms (r11 ADVICE: an
    # interpolated quote/backtick would break or silently change the
    # query); plain identifiers pass
    evil = spark.range(3).selectExpr("id AS `id'; drop`")
    with pytest.raises(ValueError, match="plain identifiers"):
        profile_frame(evil, ["id'; drop"])
    with pytest.raises(ValueError, match="plain identifiers"):
        profile_frame_sql("t", ["a b"])
    with pytest.raises(ValueError, match="plain identifiers"):
        profile_frame_sql("t", ['x"y'])
    assert "col_name" in profile_frame_sql("t", ["ok_col", "_ok2"])
