"""Partitioning utilities.

At 100 TB inputs arrive as thousands of parquet splits and parallelism is
free; at test scale a small table is often ONE split, serializing heavy
per-row expression work onto one core.  ``ensure_parallelism`` widens such
inputs to the cluster's default parallelism — a no-op when the scan is
already wide, so plans keep the same shape at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition up to the session's default parallelism if
    the current partitioning is narrower.  Never shrinks (that's AQE's
    job), never repartitions an already-wide plan."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    current = df.rdd.getNumPartitions()
    if current >= target:
        return df
    return df.repartition(target)
