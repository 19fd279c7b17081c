"""Corpus-quality operators for training-data curation.

Repetition profiling is the Gopher/FineWeb-style quality gate: documents
dominated by repeated n-grams (boilerplate, keyword stuffing, degenerate
generations) are filtered before training.  The per-document statistics
here are computed by EXPLODING the n-gram array and aggregating — linear
work and a key-partitioned shuffle, instead of the quadratic
count-each-distinct-inside-a-lambda formulation that looks cheaper but
interprets O(distinct × total) comparisons per row.

Beyond the reference's surface (text analysis mandate); composes with the
fold algebra downstream (the output is a plain frame).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frames_map_reduce_spark.functions import text as TX
from frames_map_reduce_spark.schema import require_columns


def ngram_repetition_stats(df: DataFrame, text_col: str, id_col: str,
                           carry: Sequence[str] = (), n: int = 2) -> DataFrame:
    """Per-document n-gram repetition profile.

    Output: ``id_col``, ``carry``..., and

    - ``total_ngrams``   — n-gram occurrences in the document
    - ``distinct_ngrams``— distinct n-grams
    - ``max_ngram_count``— occurrences of the most frequent n-gram
    - ``dup_ngram_frac`` — 1 - distinct/total (0 = no repetition)
    - ``top_ngram_frac`` — max/total (Gopher's "top n-gram fraction")

    Documents with fewer than ``n`` tokens produce no n-grams and are
    absent from the output (mirror this in any SQL twin).

    Scale shape: explode → two key-partitioned aggregations.  The first
    groupBy key is (doc, n-gram) — high cardinality, no hot keys — and
    map-side partial aggregation collapses within-partition repeats, so a
    pathological document costs bandwidth proportional to its distinct
    n-grams, not its length.
    """
    require_columns(df, [text_col, id_col, *carry])
    grams = (df.select(id_col, *carry,
                       F.explode(TX.word_ngrams(F.col(text_col), n)).alias("_ng"))
               .groupBy(id_col, *carry, "_ng")
               .agg(F.count(F.lit(1)).alias("_n")))
    per_doc = (grams.groupBy(id_col, *carry)
                    .agg(F.sum("_n").alias("total_ngrams"),
                         F.count(F.lit(1)).alias("distinct_ngrams"),
                         F.max("_n").alias("max_ngram_count")))
    total = F.col("total_ngrams").cast("double")
    return per_doc.select(
        id_col, *carry, "total_ngrams", "distinct_ngrams", "max_ngram_count",
        (F.lit(1.0) - F.try_divide(F.col("distinct_ngrams").cast("double"), total)
         ).alias("dup_ngram_frac"),
        F.try_divide(F.col("max_ngram_count").cast("double"), total)
         .alias("top_ngram_frac"))


def ngram_repetition_stats_sql(text_col: str, id_col: str,
                               carry: Sequence[str] = (), n: int = 2,
                               table: str = "documents") -> str:
    """DuckDB twin of :func:`ngram_repetition_stats` (differential oracle)."""
    cs = "".join(f", {c}" for c in carry)
    grams = TX.word_ngrams_sql(text_col, n)
    return f"""
        SELECT {id_col}{cs}, total_ngrams, distinct_ngrams, max_ngram_count,
               1 - distinct_ngrams::DOUBLE / total_ngrams AS dup_ngram_frac,
               max_ngram_count::DOUBLE / total_ngrams AS top_ngram_frac
        FROM (SELECT {id_col}{cs}, sum(_n) AS total_ngrams,
                     count(*) AS distinct_ngrams, max(_n) AS max_ngram_count
              FROM (SELECT {id_col}{cs}, _ng, count(*) AS _n
                    FROM (SELECT {id_col}{cs}, unnest({grams}) AS _ng
                          FROM {table})
                    GROUP BY {id_col}{cs}, _ng)
              GROUP BY {id_col}{cs})"""
