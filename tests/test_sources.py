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
