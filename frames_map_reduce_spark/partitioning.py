"""Partitioning utilities.

At 100 TB inputs arrive as thousands of parquet splits and parallelism is
free; at test scale a small table is often ONE split, serializing heavy
per-row expression work onto one core.  ``ensure_parallelism`` widens such
inputs to the cluster's default parallelism — a no-op when the scan is
already wide, so plans keep the same shape at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _current_partitions(df: DataFrame) -> int:
    """Partition count WITHOUT building RDD lineage where possible.

    1. The physical plan's output partitioning (exact for anything
       downstream of a shuffle/repartition; ``UnknownPartitioning(0)``
       for leaf file scans).
    2. For file scans, the input file count — a lower bound on split
       count (big files split further, never merge below it), which is
       exactly the signal needed here: thousands of files ⇒ wide ⇒
       no-op; one file ⇒ narrow ⇒ widen.
    3. ``df.rdd.getNumPartitions()`` only as the last resort (local
       in-memory frames), where the plan is tiny and the RDD conversion
       cost is trivial — at 100 TB plan sizes paths 1-2 always hit
       first.
    """
    try:
        n = (df._jdf.queryExecution().sparkPlan()
               .outputPartitioning().numPartitions())
        if n > 0:
            return n
    except Exception:  # non-JVM backends (e.g. connect) — fall through
        pass
    files = df.inputFiles()
    if files:
        return len(files)
    return df.rdd.getNumPartitions()


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition up to the session's default parallelism if
    the current partitioning is narrower.  Never shrinks (that's AQE's
    job), never repartitions an already-wide plan."""
    if df.isStreaming:
        # partition probing is meaningless pre-execution on a stream;
        # micro-batch parallelism comes from the source's own splits
        return df
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if _current_partitions(df) >= target:
        return df
    return df.repartition(target)
