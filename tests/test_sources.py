"""Source/sink tests — notably the reference's per-cell-failure CSV
ingestion semantics (examples/AddRowsByLabel.hs:146-155)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from frames_map_reduce_spark.sources import (
    read_csv_permissive,
    read_tables,
    to_frame,
    write_parquet,
)


def test_csv_per_cell_failure(spark, tmp_path):
    """A bad cell becomes NULL in that cell; the row survives — the
    reference's 'holy rows' semantics, finer than Spark PERMISSIVE."""
    p = tmp_path / "holy.csv"
    p.write_text("label,x,y\nA,1,2\nZ,NaN_bad,3\nA,4,lol\nZ,5,6\n")
    schema = T.StructType([
        T.StructField("label", T.StringType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
    ])
    df = read_csv_permissive(spark, str(p), schema)
    rows = [tuple(r) for r in df.collect()]
    assert ("A", 1.0, 2.0) in rows
    assert ("Z", None, 3.0) in rows   # bad x, good y — row survives
    assert ("A", 4.0, None) in rows   # good x, bad y
    assert ("Z", 5.0, 6.0) in rows
    # and the reference's golden aggregate over it (FIXTURES.md F2)
    agg = df.groupBy("label").agg(F.sum("x").alias("x"), F.sum("y").alias("y"))
    got = {r["label"]: (r["x"], r["y"]) for r in agg.collect()}
    assert got == {"A": (5.0, 2.0), "Z": (5.0, 9.0)}


def test_to_frame_and_parquet_roundtrip(spark, tmp_path):
    df = to_frame(spark, [(1, "a"), (2, "b")], "id long, s string")
    out = str(tmp_path / "t.parquet")
    write_parquet(df, out)
    back = spark.read.parquet(out)
    assert sorted([tuple(r) for r in back.collect()]) == [(1, "a"), (2, "b")]


def test_read_tables(spark, sf_dir):
    tables = read_tables(spark, sf_dir, ["region", "nation"])
    assert set(tables) == {"region", "nation"}
    assert tables["region"].count() == 5


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """A filter on a partition column must prune at the DIRECTORY level
    (PartitionFilters on the scan), not as a post-scan row filter — at
    100 TB this is the difference between reading one partition and
    reading everything."""
    from frames_map_reduce_spark.plans import partition_filters, pushed_filters
    from frames_map_reduce_spark.sources import write_parquet

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_returnflag")
    path = str(tmp_path / "li_part")
    write_parquet(li, path, partition_by=["l_returnflag"])

    back = spark.read.parquet(path).filter(F.col("l_returnflag") == "A")
    pf = partition_filters(back)
    assert any("l_returnflag" in p for p in pf), pf
    # the predicate must NOT degrade to a data filter on the scan
    assert not any("l_returnflag" in p for p in pushed_filters(back))
    # and values round-trip
    expect = li.filter(F.col("l_returnflag") == "A").count()
    assert back.count() == expect


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    from frames_map_reduce_spark.sources import read_orc, write_orc

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    path = str(tmp_path / "li_orc")
    write_orc(li, path)
    back = read_orc(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, li.collect()))
    # ORC scans push predicates like parquet
    from frames_map_reduce_spark.plans import pushed_filters
    assert pushed_filters(back.filter(F.col("l_quantity") > 30.0))


def test_json_lines_roundtrip_with_schema(spark, tmp_path):
    from frames_map_reduce_spark.sources import read_json_lines, write_json_lines

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("s", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ])
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.5), (3, "c", None)], schema)
    path = str(tmp_path / "jl")
    write_json_lines(df, path)
    back = read_json_lines(spark, path, schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
