"""Paired same-session A/B for the r13 explode_outer fixes (guide §1).

Reconstructs each OLD (non-outer explode / JVM size-filter) shape
inline next to the NEW shape the operators now build, alternates them
to a noop sink in one session (the only honest protocol under this
host's throttle bursts), and proves row-identity with a count+hash
aggregate.  Shapes measured:

  grams   — ngram explode (quality.ngram_repetition_stats shape, n=2)
  tokens  — tokenize explode (quality.unigram_lm_score shape)
  bloom   — bloom_positions explode (bloom._word_rows shape)
  wordish — wordish regex + size filter (tokenizer encode input shape)
  lines   — posexplode(split) (dedup.remove_duplicate_lines shape)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from frames_map_reduce_spark.session import get_spark  # noqa: E402
from frames_map_reduce_spark.functions import text as TX  # noqa: E402
from frames_map_reduce_spark.operators.bloom import bloom_positions  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-explode-outer",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def pair(name, old_fn, new_fn, hash_cols):
        # identity first (cheap aggregates), then alternate timings
        def dig(df):
            return df.groupBy().agg(
                F.count("*").alias("n"),
                F.sum(F.xxhash64(*hash_cols).cast("decimal(38,0)"))
                 .alias("h")).collect()
        ident = dig(old_fn()) == dig(new_fn())
        for fn in (old_fn, new_fn):       # warm both plans
            fn().write.format("noop").mode("overwrite").save()
        res = {"old": [], "new": []}
        for _ in range(5):
            for key, fn in (("old", old_fn), ("new", new_fn)):
                t0 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                res[key].append(time.perf_counter() - t0)
        mo = statistics.median(res["old"])
        mn = statistics.median(res["new"])
        print(f"{name}: identical={ident} old={mo:.3f}s new={mn:.3f}s "
              f"ratio={mn/mo:.2f} "
              f"(old={sorted(round(x, 2) for x in res['old'])} "
              f"new={sorted(round(x, 2) for x in res['new'])})",
              flush=True)

    # --- grams (n=2 repetition shape) ------------------------------
    pair(
        "grams",
        lambda: docs.select(
            "doc_id", F.explode(TX.word_ngrams(F.col("text"), 2))
                       .alias("_ng")),
        lambda: docs.select(
            "doc_id", F.explode_outer(TX.word_ngrams(F.col("text"), 2))
                       .alias("_ng")).where(F.col("_ng").isNotNull()),
        ["doc_id", "_ng"])

    # --- tokens (unigram LM shape) ----------------------------------
    pair(
        "tokens",
        lambda: docs.select(
            "doc_id", F.explode(TX.tokens(F.col("text"))).alias("_tok")),
        lambda: docs.select(
            "doc_id", F.explode_outer(TX.tokens(F.col("text")))
                       .alias("_tok")).where(F.col("_tok").isNotNull()),
        ["doc_id", "_tok"])

    # --- bloom positions (word-rows shape, default geometry) --------
    m_bits, k = 1 << 22, 7
    pair(
        "bloom",
        lambda: docs.select(
            F.explode(bloom_positions(F.col("text"), m_bits, k))
             .alias("_pos")),
        lambda: docs.select(
            F.explode_outer(bloom_positions(F.col("text"), m_bits, k))
             .alias("_pos")).where(F.col("_pos").isNotNull()),
        ["_pos"])

    # --- wordish + size filter (encode input shape) ------------------
    # OLD: JVM size("_w") > 0 filter (pushdown re-inlines the regex);
    # NEW: no JVM filter — the operators now skip empty docs inside the
    # Arrow stage.  Identity holds on this corpus because every doc has
    # >= 1 wordish token (verified by the count in the digest); the
    # general-case equivalence is the Arrow-stage skip, pinned by the
    # tokenizer unit + parity tests.
    pair(
        "wordish",
        lambda: docs.select(
            "doc_id", TX.wordish_tokens(F.col("text")).alias("_w"))
            .filter(F.size("_w") > 0)
            .select("doc_id", F.size("_w").alias("n")),
        lambda: docs.select(
            "doc_id", TX.wordish_tokens(F.col("text")).alias("_w"))
            .select("doc_id", F.size("_w").alias("n")),
        ["doc_id", "n"])

    # --- lines (posexplode split shape) -------------------------------
    pair(
        "lines",
        lambda: docs.select(
            "doc_id", F.posexplode(F.split(F.col("text"), "\n"))
                       .alias("_p", "_line")),
        lambda: docs.select(
            "doc_id", F.posexplode_outer(F.split(F.col("text"), "\n"))
                       .alias("_p", "_line"))
            .where(F.col("_line").isNotNull()),
        ["doc_id", "_p", "_line"])


if __name__ == "__main__":
    main()
