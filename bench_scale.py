"""Scale-curve harness: materialize an sf1.0-equivalent dataset (10x
sf0.1) under /tmp and run the headline suite at both scales, so the
100 TB design claims rest on a measured curve, not only on plan shapes.

Usage:
    python bench_scale.py generate   # build /tmp/fmr_sf1.0 (idempotent)
    SPARK_GRAFT_SF_DIR=/tmp/fmr_sf1.0 python bench.py   # then bench it

Scaling model (replica construction, fully deterministic):

- every keyed table is unioned 10x with key offsets of r * 10^10 per
  replica r, so joins stay 1:1 (orders<->lineitem, customer<->orders,
  part/supplier<->lineitem, user_id<->events) and group cardinalities
  scale linearly — the same shape a 10x bigger generator run would give;
- region/nation stay fixed (dimensions);
- document text is Caesar-rotated per replica (letters only, case
  preserved): token/shingle STRUCTURE — lengths, whitespace, repetition
  — is preserved so per-doc work is identical, while content becomes
  replica-distinct so dedup semantics scale linearly (10 exact copies
  per doc would instead explode near-dup classes quadratically, which
  benchmarks the corpus, not the engine);
- embeddings keep their vector values (scoring cost is value-blind);
  ann queries draw their 5 probe vectors from vec_id < 5, i.e. replica
  0 only, so query count stays fixed while the corpus scales 10x.

Timestamps are left untouched: 10x events in the same wall-clock span
is exactly what 10x traffic looks like to windowed aggregations.
"""

from __future__ import annotations

import os
import string
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SRC = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_SCALE_DST", "/tmp/fmr_sf1.0")
FACTOR = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "10"))
OFF = 10_000_000_000  # replica key offset; >> any base key at sf0.1

KEY_COLS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]

_ALPHA = string.ascii_lowercase
_UPPER = string.ascii_uppercase


def _rotated_text(col, r_col):
    """CASE over replica id: Caesar-rotate letters by r (r=0 passes
    through).  translate() needs constant alphabets, hence the unrolled
    branches — FACTOR is small and this runs once, at generation."""
    out = F.when(r_col == 0, col)
    for r in range(1, FACTOR):
        rot = _ALPHA[r:] + _ALPHA[:r] + _UPPER[r:] + _UPPER[:r]
        out = out.when(r_col == r, F.translate(col, _ALPHA + _UPPER, rot))
    return out


def _scale_table(df: DataFrame, name: str) -> DataFrame:
    reps = df.sparkSession.range(FACTOR).select(F.col("id").alias("_r"))
    wide = df.crossJoin(reps)
    for k in KEY_COLS[name]:
        wide = wide.withColumn(k, F.col(k) + F.col("_r") * F.lit(OFF))
    if name == "documents":
        wide = wide.withColumn("text", _rotated_text(F.col("text"), F.col("_r")))
    return wide.drop("_r").repartition(32)


def generate() -> None:
    from frames_map_reduce_spark.session import get_spark
    spark: SparkSession = get_spark("fmr-bench-scale")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for name in DIMS + list(KEY_COLS):
        dst = f"{DST}/{name}.parquet"
        if os.path.exists(f"{dst}/_SUCCESS"):
            print(f"# {name}: exists, skipping", file=sys.stderr)
            continue
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        out = df if name in DIMS else _scale_table(df, name)
        out.write.mode("overwrite").parquet(dst)
        print(f"# {name}: {spark.read.parquet(dst).count()} rows",
              file=sys.stderr)
    print(f"# scale data ready at {DST}", file=sys.stderr)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "generate":
        generate()
    else:
        print(__doc__)
