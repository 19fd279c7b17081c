"""frames_map_reduce_spark — a PySpark-native analytics engine with the
capabilities of the Frames-map-reduce reference library.

The reference (`/root/reference`, adamConnerSax/Frames-map-reduce) adapts the
map-reduce-folds Unpack → Assign → Reduce fold pipeline to typed dataframes
(see its Readme.md:7-13).  This package re-expresses that algebra Spark-first:

- :mod:`frames_map_reduce_spark.folds`       — the Fold algebra
  (reference ``src/Frames/Folds.hs``): composable one-pass aggregates that
  compile to native Spark aggregate Columns, with a Pandas GROUPED_AGG
  fallback for arbitrary folds.
- :mod:`frames_map_reduce_spark.mapreduce`   — Unpack / Assign / Reduce
  combinators and the ``map_reduce`` pipeline builder
  (reference ``src/Frames/MapReduce.hs``).
- :mod:`frames_map_reduce_spark.aggregation` — key-coarsening aggregation
  (reference ``src/Frames/Aggregation.hs``).
- :mod:`frames_map_reduce_spark.operators`   — scale extensions: dedup
  (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
  similarity search (brute-force + LSH ANN), multimodal column plumbing.
- :mod:`frames_map_reduce_spark.functions`   — text analysis & vector
  expression helpers (all native Column expressions; JVM-side).
- :mod:`frames_map_reduce_spark.streaming`   — Structured Streaming
  variants of the map-reduce pipeline.

Everything compiles to declarative DataFrame plans so Catalyst does
pushdown / pruning / partial aggregation; Python UDFs appear only where
semantics genuinely require them (whole-group reduces, SimHash packing).
"""

from frames_map_reduce_spark import folds
from frames_map_reduce_spark.aggregation import (
    aggregate_all_fold,
    aggregate_fold,
    combine_key_aggregations,
    key_map,
    merge_data_folds,
)
from frames_map_reduce_spark.mapreduce import (
    assign_keys,
    assign_keys_and_data,
    fold_and_add_key,
    fold_and_label,
    frame_concat,
    make_recs_with_key,
    map_reduce,
    process_and_label,
    reduce_and_add_key,
    reduce_map_with_key,
    split_on_data,
    split_on_keys,
    unpack_filter_on_field,
    unpack_filter_row,
    unpack_flat_map,
    unpack_good_rows,
    unpack_no_op,
)
from frames_map_reduce_spark.partitioning import ensure_parallelism
from frames_map_reduce_spark.session import get_spark
from frames_map_reduce_spark.skew import salted_aggregate, salted_join

__version__ = "0.1.0"

__all__ = [
    "folds",
    "get_spark",
    "map_reduce",
    "unpack_filter_row",
    "unpack_filter_on_field",
    "unpack_good_rows",
    "unpack_flat_map",
    "unpack_no_op",
    "assign_keys",
    "assign_keys_and_data",
    "split_on_keys",
    "split_on_data",
    "fold_and_add_key",
    "fold_and_label",
    "reduce_and_add_key",
    "process_and_label",
    "make_recs_with_key",
    "reduce_map_with_key",
    "frame_concat",
    "key_map",
    "combine_key_aggregations",
    "aggregate_all_fold",
    "aggregate_fold",
    "merge_data_folds",
    "ensure_parallelism",
    "salted_aggregate",
    "salted_join",
]
