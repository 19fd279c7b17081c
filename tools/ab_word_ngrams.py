"""Paired A/B: word_ngrams zip_with chain (current) vs bind-once
transform+slice formulation (guide §1 measure-first; §2.3 cheaper
per-task work).  Checks VALUE IDENTITY on the full corpus first
(count + md5-hash-sum over the exploded grams), then interleaves
noop-sink timings of the gram pass A/B/A/B to cancel host drift.

Usage: python tools/ab_word_ngrams.py [--n 5] [--reps 4]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from frames_map_reduce_spark.functions import text as TX  # noqa: E402
from frames_map_reduce_spark.session import get_spark  # noqa: E402


def ngrams_slice(col, n: int):
    """Candidate: bind the token array ONCE per row (the char_shingles
    single-element-transform trick — lambda bodies are interpreted with
    no CSE), then one slice + one concat_ws per gram."""
    toks = TX.tokens(col)
    if n == 1:
        return toks

    def per_row(t):
        m = F.size(t) - (n - 1)
        return F.when(t.isNull(), F.lit(None).cast("array<string>")).when(
            m >= 1,
            F.transform(F.sequence(F.lit(1), F.greatest(m, F.lit(1))),
                        lambda i: F.concat_ws(" ", F.slice(t, i, n)))
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(toks), per_row), 1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--distinct", action="store_true",
                    help="wrap in array_distinct like the contamination path")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("fmr-ab-ngrams",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()

    old_col = TX.word_ngrams(F.col("text"), args.n)
    new_col = ngrams_slice(F.col("text"), args.n)
    if args.distinct:
        old_col = F.array_distinct(old_col)
        new_col = F.array_distinct(new_col)

    # ---- value identity on the FULL corpus (null flag + exploded hash)
    def digest(col):
        g = docs.select(F.col("doc_id"), col.alias("g"))
        agg = g.select(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.when(F.col("g").isNull(), 1).otherwise(0)).alias("nulls"),
        ).collect()[0]
        ex = (g.select("doc_id", F.posexplode_outer("g").alias("p", "t"))
               .select(F.sum(F.xxhash64("doc_id", "p", "t")
                             .cast("decimal(38,0)")).alias("h"),
                       F.count(F.lit(1)).alias("n")).collect()[0])
        return (agg["rows"], agg["nulls"], ex["h"], ex["n"])

    d_old, d_new = digest(old_col), digest(new_col)
    print(f"identity old={d_old} new={d_new} -> "
          f"{'IDENTICAL' if d_old == d_new else 'MISMATCH'}")
    if d_old != d_new:
        sys.exit(1)

    # ---- interleaved noop-sink timing of the gram pass
    def run(col) -> float:
        t0 = time.perf_counter()
        (docs.select(col.alias("g"))
             .write.format("noop").mode("overwrite").save())
        return time.perf_counter() - t0

    run(old_col)  # warm
    olds, news = [], []
    for _ in range(args.reps):
        olds.append(run(old_col))
        news.append(run(new_col))
    print(f"old: median {statistics.median(olds):.3f}s of "
          f"{[round(s, 2) for s in olds]}")
    print(f"new: median {statistics.median(news):.3f}s of "
          f"{[round(s, 2) for s in news]}")
    print(f"ratio new/old = "
          f"{statistics.median(news) / statistics.median(olds):.3f}")


if __name__ == "__main__":
    main()
