"""Structured Streaming variants of the map-reduce pipeline.

The reference is batch-only (SURVEY §2.8), but its fold pipeline maps
directly onto Structured Streaming: an Unpack is a stream filter, an
Assign+FoldReduce is a (windowed) streaming aggregation, and the
whole-group reduces become ``applyInPandasWithState``.  These helpers give
the engine a streaming surface with the same Fold vocabulary.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frames_map_reduce_spark.folds import Fold
from frames_map_reduce_spark.mapreduce import Unpack
from frames_map_reduce_spark.schema import require_columns


def stream_map_reduce(stream: DataFrame, unpack: Unpack, keys: Sequence[str],
                      fold: Fold, ts_col: str | None = None,
                      window: str | None = None, slide: str | None = None,
                      watermark: str = "10 minutes") -> DataFrame:
    """Streaming rendering of ``map_reduce``: filter → (windowed) groupBy →
    one ``.agg`` pass.  With ``window`` set, groups by a tumbling (or, with
    ``slide``, sliding) event-time window on ``ts_col`` with a watermark so
    state is bounded and late data beyond the watermark is dropped —
    mandatory for unbounded inputs."""
    df = unpack.apply(stream)
    group_cols = [F.col(k) for k in keys]
    if window is not None:
        if ts_col is None:
            raise ValueError("windowed streaming map_reduce needs ts_col")
        require_columns(df, [ts_col])
        df = df.withWatermark(ts_col, watermark)
        win = (F.window(F.col(ts_col), window, slide) if slide
               else F.window(F.col(ts_col), window))
        group_cols = [win.alias("window"), *group_cols]
    return df.groupBy(*group_cols).agg(*fold.columns())


def stream_to_memory(result: DataFrame, name: str, output_mode: str = "complete"):
    """Test sink: run the streaming query into an in-memory table with
    availableNow (process everything currently available, then stop)."""
    return (result.writeStream
                  .format("memory")
                  .queryName(name)
                  .outputMode(output_mode)
                  .trigger(availableNow=True)
                  .start())
