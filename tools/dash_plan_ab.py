"""Capture the quality-dashboard PER-BATCH plan, before vs after the
r13 single-pass fusion (OPTIMIZATION_r13.md change 12).

``stream_quality_dashboard``'s work happens inside a ``foreachBatch``
closure, so opt_measure's returned-frame capture (the parquet readback)
never shows it.  This script rebuilds both shapes of the per-batch row
computation VERBATIM over a static batch frame — the "before" branch is
the pre-fusion body (commit ``be90aea``,
frames_map_reduce_spark/streaming/__init__.py apply()), the "after"
branch replays the fused body via the same factored helpers the live
code uses — and writes their ``explain("formatted")`` to
``plans/r13/quality_dashboard_batch_{before,after}.txt``.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from frames_map_reduce_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import query_rigs as R
    from frames_map_reduce_spark.operators import classifier as CLF
    from frames_map_reduce_spark.operators import quality as QL
    from frames_map_reduce_spark.operators.classifier import (
        classifier_gate_columns,
    )
    from frames_map_reduce_spark.operators.quality import (
        _ENTROPY_SCALE,
        entropy_run_struct,
        psi_against_reference,
        psi_reference_fusion,
        token_entropy_profile,
    )

    spark = get_spark("fmr-dash-plan",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    docs = R._docs(spark, SF_DIR)
    ref = docs.filter(F.col("lang") == "en")
    labeled = docs.withColumn("_is_en", F.col("lang") == F.lit("en"))
    bks = QL.quantile_breakpoints(ref, "n_chars", n_bins=8)
    ref_counts = QL.bin_counts(ref, "n_chars", bks)
    weights = [(r["bucket"], r["weight"]) for r in
               CLF.train_logodds_classifier(labeled, "text", "_is_en",
                                            n_buckets=R._QCLF_BUCKETS,
                                            salt=R._QCLF_SALT).collect()]
    batch_df = (docs.filter(F.col("doc_id") % 3 == 0)
                    .select("doc_id", "text", "n_chars"))
    gate_cols = classifier_gate_columns(weights, "text",
                                        R._QCLF_BUCKETS, R._QCLF_SALT)

    # ---- BEFORE (be90aea): 3 aggregation subtrees + 2 broadcast
    # crossJoins per micro-batch ----
    clf = (batch_df.select(*(c.alias(name)
                             for name, c in gate_cols.items()))
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.coalesce(
                    F.sum(F.when((F.col("n_tokens") > 0)
                                 & (F.col("logit_rank") >= 0), 1)
                           .otherwise(0)), F.lit(0))
                 .cast("bigint").alias("n_pass_quality"),
                F.coalesce(F.sum(F.when(F.col("n_tokens") > 0,
                                        F.col("logit_sum"))), F.lit(0))
                 .cast("bigint").alias("logit_total")))
    ent = (token_entropy_profile(batch_df, "text", "doc_id")
           .agg(F.sum("entropy_micro").alias("_se"),
                F.count(F.lit(1)).alias("_n"))
           .select(F.expr("case when _n > 0 then "
                          "(2 * _se + _n) div (2 * _n) end")
                    .cast("bigint").alias("entropy_mean_micro")))
    psi = (psi_against_reference(batch_df, "n_chars", bks, ref_counts)
           .select("psi_micro"))
    before = (clf.crossJoin(F.broadcast(ent))
                 .crossJoin(F.broadcast(psi))
                 .select("n_docs", "entropy_mean_micro", "psi_micro",
                         "n_pass_quality", "logit_total"))

    # ---- AFTER (live code): ONE projection + ONE aggregation ----
    binx, psi_aggs, psi_total, _nr, psi_col = \
        psi_reference_fusion("n_chars", bks, ref_counts, prefix="_psi")
    ent_st = entropy_run_struct("text")
    ent_micro = (F.round(F.log(F.col("_ent")["n"].cast("double"))
                         * _ENTROPY_SCALE, 0).cast("bigint")
                 - F.expr("(2 * _ent.r.q + _ent.n) div (2 * _ent.n)"))
    proj = batch_df.select(
        *(c.alias(name) for name, c in gate_cols.items()),
        ent_st.alias("_ent"), binx.alias("_psi_b"))
    row = proj.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.coalesce(
            F.sum(F.when((F.col("n_tokens") > 0)
                         & (F.col("logit_rank") >= 0), 1)
                   .otherwise(0)), F.lit(0))
         .cast("bigint").alias("n_pass_quality"),
        F.coalesce(F.sum(F.when(F.col("n_tokens") > 0,
                                F.col("logit_sum"))), F.lit(0))
         .cast("bigint").alias("logit_total"),
        F.sum(F.when(F.col("_ent")["n"] > 0, ent_micro)).alias("_se"),
        F.count(F.when(F.col("_ent")["n"] > 0, 1)).alias("_n"),
        *psi_aggs)
    after = psi_total(row).select(
        "n_docs",
        F.expr("case when _n > 0 then (2 * _se + _n) div (2 * _n) end")
         .cast("bigint").alias("entropy_mean_micro"),
        psi_col.alias("psi_micro"),
        "n_pass_quality", "logit_total")

    # value identity first, then the plans
    b = before.collect()[0]
    a = after.collect()[0]
    assert tuple(b) == tuple(a), (b, a)
    print("values identical:", tuple(a))

    for name, df in (("before", before), ("after", after)):
        path = os.path.join(HERE, "plans", "r13",
                            f"quality_dashboard_batch_{name}.txt")
        with open(path, "w") as f:
            f.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted")))
        print("wrote", path)


if __name__ == "__main__":
    main()
