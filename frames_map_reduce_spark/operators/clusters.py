"""Connected components over a pair list, and duplicate-cluster
resolution built on top of it.

Near-duplicate *pairs* (minhash/simhash/ngram — operators/dedup.py) are
only half of real training-data dedup: duplicates are transitive
(A≈B, B≈C ⇒ keep one of {A,B,C}), so the production semantics is
"group pairs into clusters, keep one canonical document per cluster".
The reference library has no graph operators at all (it is a fold
engine — SURVEY §2.8 extension surface); this module is part of the
mandated LLM-pipeline extension set.

Algorithm: alternating large-star / small-star contraction
(Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected
Components in MapReduce and Beyond", SoCC'14), the same algorithm
GraphFrames ships for billion-edge graphs.

Scale design:

- Each half-round is ``groupBy(min)`` + an equi-join — plain shuffles
  on node ids, no ``collect_list`` of neighborhoods (a hub node never
  materializes its adjacency list in one buffer, unlike the naive
  label-propagation rendering).
- Converges in O(log n) rounds regardless of component diameter
  (min-label propagation needs O(diameter) — a 100 TB boilerplate
  cluster can be a very long chain).
- Every round ends in ``localCheckpoint(eager=True)``: iterative
  self-referential lineages otherwise grow the plan exponentially and
  re-run every prior round per action.  On a real cluster point
  ``spark.sparkContext.setCheckpointDir`` at durable storage and swap
  in ``checkpoint()`` for executor-loss resilience; the local build
  keeps blocks on executors, which is exactly right for local[N].
- The fixpoint test compares (edge count, sum of edge hashes) — two
  scalar aggregates per round, no driver-side edge sets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from frames_map_reduce_spark.schema import require_columns

__all__ = ["connected_components", "attach_components", "dedup_clusters",
           "leakage_safe_split"]


def _canon(edges: DataFrame) -> DataFrame:
    """Direct every edge large→small and drop self-loops/duplicates."""
    u, v = F.col("_u"), F.col("_v")
    return (edges.select(F.greatest(u, v).alias("_u"),
                         F.least(u, v).alias("_v"))
                 .filter(u != v)
                 .distinct())


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round: every node connects its strictly-larger
    neighbors to the minimum of its neighborhood (incl. itself)."""
    sym = edges.union(edges.select(F.col("_v").alias("_u"),
                                   F.col("_u").alias("_v")))
    mins = (sym.groupBy("_u")
               .agg(F.min("_v").alias("_m"))
               .select("_u", F.least("_m", F.col("_u")).alias("_m")))
    return (sym.filter(F.col("_v") > F.col("_u"))
               .join(mins, "_u")
               .select(F.col("_v").alias("_u"), F.col("_m").alias("_v"))
               .filter(F.col("_u") != F.col("_v"))
               .distinct())


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round over large→small directed edges: every node
    connects its smaller neighbors (and itself) to their minimum."""
    mins = edges.groupBy("_u").agg(F.min("_v").alias("_m"))
    nbr = (edges.join(mins, "_u")
                .select(F.col("_v").alias("_u"), F.col("_m").alias("_v")))
    self_edge = mins.select("_u", F.col("_m").alias("_v"))
    return (nbr.union(self_edge)
               .filter(F.col("_u") != F.col("_v"))
               .distinct())


def _signature(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.xxhash64("_u", "_v") % F.lit(1 << 40)),
                   F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst",
                         max_iter: int = 25) -> DataFrame:
    """Resolve the undirected graph given as an edge list into
    components.

    Returns one row per node that appears in ``edges``:
    ``(id, component)`` where ``component`` is the smallest node id in
    the node's component (so each component's canonical member has
    ``id == component``).  Nodes with no edges don't appear — union
    them in with ``attach_components`` or treat absent as singleton.

    ``max_iter`` bounds the alternating rounds; 25 covers graphs up to
    ~2^25 nodes per component thanks to O(log n) convergence.  Raises
    if the fixpoint isn't reached (never observed in practice; a guard,
    not a tuning knob).
    """
    require_columns(edges, [src, dst])
    cur = _canon(edges.select(F.col(src).alias("_u"),
                              F.col(dst).alias("_v")))
    cur = cur.localCheckpoint(eager=True)
    sig = _signature(cur)
    for _ in range(max_iter):
        cur = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        new_sig = _signature(cur)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds")
    # At fixpoint every edge is (node → component root); the roots
    # themselves only appear on the right side, so add them back.
    members = cur.select(F.col("_u").alias("id"),
                         F.col("_v").alias("component"))
    roots = cur.select(F.col("_v").alias("id")).distinct() \
               .withColumn("component", F.col("id"))
    return members.union(roots).distinct()


def attach_components(nodes: DataFrame, components: DataFrame,
                      id_col: str) -> DataFrame:
    """Left-join ``components`` (from ``connected_components``) onto a
    node table; nodes without edges become singleton components
    (component = own id)."""
    comp = components.withColumnRenamed("id", id_col)
    return (nodes.join(comp, id_col, "left")
                 .withColumn("component",
                             F.coalesce("component", F.col(id_col))))


def dedup_clusters(df: DataFrame, text_col: str, id_col: str,
                   threshold: float = 0.6, num_perm: int = 128,
                   bands: int = 16, shingle_k: int = 5) -> DataFrame:
    """Full transitive near-duplicate clustering of a document table.

    Pipeline: MinHash-LSH candidate pairs → exact-Jaccard verification
    (operators/dedup.py) → connected components → every document
    labeled with its cluster and the cluster's canonical (minimum) id.

    Returns ``(id_col, cluster_id, cluster_size)`` — one row per input
    document; ``cluster_size == 1`` means unique.  Downstream "keep one
    per cluster" is ``filter(col(id_col) == col("cluster_id"))``.

    The output is deterministic and (unlike the LSH candidate step)
    exactly characterized: clusters are the transitive closure of
    "exact Jaccard ≥ threshold on k-shingles", so a recursive-CTE SQL
    oracle can verify it end-to-end.
    """
    from frames_map_reduce_spark.operators import dedup as DD

    pairs = DD.minhash_near_dup_pairs(
        df, text_col, id_col, threshold=threshold, num_perm=num_perm,
        bands=bands, shingle_k=shingle_k)
    comp = connected_components(pairs, src="id_a", dst="id_b")
    labeled = attach_components(df.select(id_col), comp, id_col) \
        .withColumnRenamed("component", "cluster_id")
    sizes = labeled.groupBy("cluster_id") \
                   .agg(F.count(F.lit(1)).alias("cluster_size"))
    return labeled.join(sizes, "cluster_id") \
                  .select(id_col, "cluster_id", "cluster_size")


def leakage_safe_split(df: DataFrame, id_col: str, weights,
                       pairs: DataFrame | None = None,
                       components: DataFrame | None = None,
                       src: str = "id_a", dst: str = "id_b",
                       salt: str = "", split_col: str = "split",
                       key_out: str = "split_key") -> DataFrame:
    """Near-dup-aware train/val/test split: hash-split on the near-dup
    CLUSTER id instead of the document id, so a document and all of its
    near-duplicates land in the SAME split — the standard defense
    against eval contamination through paraphrase/boilerplate copies
    that a plain per-document split sprays across train and test.

    Pass either ``pairs`` (a verified near-dup edge list, e.g. from
    ``minhash_near_dup_pairs``) or a precomputed ``components`` table
    from ``connected_components``.  Documents with no near-dups are
    singleton clusters (their own id).  ``weights``/``salt`` follow
    ``sampling.hash_split`` — deterministic, rerun- and growth-stable.

    Scale: components run over the EDGE list (tiny next to the corpus);
    labeling is one join on ``id_col``; the split itself stays map-side.
    Output adds ``key_out`` (the cluster id the hash was drawn from) and
    ``split_col``.
    """
    from frames_map_reduce_spark.operators.sampling import hash_split

    if (pairs is None) == (components is None):
        raise ValueError("pass exactly one of pairs= or components=")
    clash = [c for c in (key_out, split_col, "component")
             if c in df.columns]
    if clash:
        raise ValueError(
            f"df already has column(s) {clash}; pass different "
            "key_out/split_col names")
    if components is None:
        components = connected_components(pairs, src=src, dst=dst)
    labeled = attach_components(df, components, id_col) \
        .withColumnRenamed("component", key_out)
    return hash_split(labeled, key_out, weights, salt=salt,
                      split_col=split_col)
