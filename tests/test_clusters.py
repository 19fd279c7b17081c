"""Connected components + transitive dedup clustering.

Reference oracle inside the tests is a plain Python union-find — an
independent implementation of the same semantics, so the distributed
large-star/small-star contraction is checked against first principles,
not against itself.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from frames_map_reduce_spark.operators import dedup as DD
from frames_map_reduce_spark.operators.clusters import (
    attach_components,
    connected_components,
    dedup_clusters,
)
from tests.conftest import rows_sorted


def _union_find(nodes, pairs):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # fully compress, then map every node to the min id of its set
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _cc(spark, pairs):
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = connected_components(edges)
    return {r["id"]: r["component"] for r in got.collect()}


def test_chain_collapses_to_one_component(spark):
    # a long path is the worst case for label propagation; large-star/
    # small-star must still converge (in O(log n) rounds)
    n = 64
    pairs = [(i, i + 1) for i in range(n)]
    got = _cc(spark, pairs)
    assert got == {i: 0 for i in range(n + 1)}


def test_two_components_and_direction_insensitivity(spark):
    pairs = [(5, 3), (3, 9), (20, 21), (21, 20), (9, 9)]
    got = _cc(spark, pairs)
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        nodes = list(range(rng.randrange(30, 120)))
        pairs = [(rng.choice(nodes), rng.choice(nodes))
                 for _ in range(rng.randrange(10, 150))]
        pairs = [(a, b) for a, b in pairs if a != b]
        expect = _union_find({n for p in pairs for n in p}, pairs)
        assert _cc(spark, pairs) == expect, f"trial {trial}"


def test_attach_components_singletons(spark):
    nodes = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    comp = connected_components(
        spark.createDataFrame([(0, 4), (1, 2)], "src long, dst long"))
    got = {r["doc_id"]: r["component"]
           for r in attach_components(nodes, comp, "doc_id").collect()}
    assert got == {0: 0, 4: 0, 1: 1, 2: 1, 3: 3, 5: 5}


def test_empty_edges(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert connected_components(edges).count() == 0


def test_dedup_clusters_matches_pairwise_union_find(spark, documents):
    """End-to-end: cluster labels must be exactly the union-find closure
    of the verified near-dup pairs, and sizes must be consistent."""
    pairs_df = DD.minhash_near_dup_pairs(documents, "text", "doc_id",
                                         threshold=0.6, num_perm=128,
                                         bands=16)
    pairs = [(r["id_a"], r["id_b"]) for r in pairs_df.collect()]
    all_ids = [r["doc_id"] for r in documents.select("doc_id").collect()]
    expect = _union_find(set(all_ids), pairs)

    got = dedup_clusters(documents, "text", "doc_id",
                         threshold=0.6, num_perm=128, bands=16)
    rows = rows_sorted(got, "doc_id")
    assert [r[0] for r in rows] == sorted(all_ids)  # one row per doc
    by_id = {r[0]: (r[1], r[2]) for r in rows}
    # cluster id = min of union-find set (singletons = own id)
    for doc in all_ids:
        assert by_id[doc][0] == expect.get(doc, doc), doc
    # sizes consistent with label multiplicity
    from collections import Counter
    label_counts = Counter(v[0] for v in by_id.values())
    for doc, (label, size) in by_id.items():
        assert size == label_counts[label]
    # there is at least one real multi-doc cluster in the fixture
    assert max(label_counts.values()) >= 2


def test_leakage_safe_split_coclusters_share_split(spark):
    """Every member of a near-dup cluster draws the same split; isolated
    docs split as singletons on their own id (== plain hash_split)."""
    from frames_map_reduce_spark.operators.clusters import leakage_safe_split
    from frames_map_reduce_spark.operators.sampling import hash_split
    import pytest as _pt

    docs = spark.createDataFrame([(i, f"s{i % 3}") for i in range(30)],
                                 "doc_id long, source string")
    # two clusters: {0,1,2} (a chain) and {10,11}
    edges = spark.createDataFrame([(0, 1), (1, 2), (10, 11)],
                                  "id_a long, id_b long")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = leakage_safe_split(docs, "doc_id", w, pairs=edges, salt="t")
    got = {r["doc_id"]: (r["split_key"], r["split"]) for r in out.collect()}
    assert len(got) == 30
    assert got[0] == got[1] == got[2] and got[0][0] == 0
    assert got[10] == got[11] and got[10][0] == 10
    # singletons match a plain per-doc hash_split with the same salt
    plain = {r["doc_id"]: r["split"]
             for r in hash_split(docs, "doc_id", w, salt="t").collect()}
    clustered = {0, 1, 2, 10, 11}
    for d, (key, split) in got.items():
        if d not in clustered:
            assert key == d and split == plain[d], d
    with _pt.raises(ValueError, match="exactly one"):
        leakage_safe_split(docs, "doc_id", w)
