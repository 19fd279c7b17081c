"""Adversarial testdata guard (r8 verdict stretch #9): the LSH-vs-
exhaustive oracle convention (ingest_gate, stream_ingest_gate_v2,
minhash_firewall, dedup_minhash, …) is hash-stable ONLY under the
corpus invariant that every true near-dup pair sits far above the 0.6
probe threshold — a pair AT the threshold has only ~24% banding
detection probability, so a threshold-straddling fixture would make the
Spark (banded) and DuckDB (exhaustive) sides disagree
non-deterministically.  The invariant was measured and documented
(every cross-split near-dup pair ≥ 0.97 at sf0.01); this test ENFORCES
it against whatever fixture the suite runs on, so a regenerated corpus
cannot silently break the convention.

Pure DuckDB — the exhaustive pair set is computed losslessly via the
PPJoin prefix lemma (Xiao et al., WWW 2008; the same lemma
operators/dedup.py's ngram_jaccard_pairs relies on): order shingles by
ascending document frequency; two sets with Jaccard ≥ t must share an
element within their first ``n - ceil(t·n) + 1`` shingles in that
order, so the candidate join touches only rare-shingle collisions,
never the full cross product.
"""

from __future__ import annotations

import os

import duckdb

from frames_map_reduce_spark.functions import text as TX

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR",
                        "/root/testdata/sf0.001")
THRESHOLD = 0.6   # the probe threshold the gate queries use
MARGIN = 0.9      # the invariant: every true near-dup sits above this


def test_no_threshold_straddling_near_dup_pairs():
    shingles = TX.char_shingles_sql("text", 5)
    con = duckdb.connect()
    row = con.sql(f"""
        WITH dd AS (
            SELECT doc_id, list_distinct({shingles}) AS shl
            FROM '{SF_DIR}/documents.parquet'
            WHERE text IS NOT NULL AND len({shingles}) > 0),
        sh AS (SELECT doc_id, unnest(shl) AS s FROM dd),
        dfreq AS (SELECT s, count(*) AS df FROM sh GROUP BY s),
        ranked AS (
            SELECT sh.doc_id, sh.s,
                   row_number() OVER (PARTITION BY sh.doc_id
                                      ORDER BY dfreq.df, sh.s) AS rn
            FROM sh JOIN dfreq USING (s)),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        prefix AS (
            SELECT r.doc_id, r.s
            FROM ranked r JOIN sizes z USING (doc_id)
            WHERE r.rn <= z.n - ceil({THRESHOLD} * z.n) + 1),
        cands AS (
            SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
            FROM prefix a JOIN prefix b
              ON a.s = b.s AND a.doc_id < b.doc_id),
        pairs AS (
            SELECT ia, ib,
                   len(list_intersect(x.shl, y.shl))::DOUBLE /
                   nullif(len(list_distinct(list_concat(x.shl, y.shl))),
                          0) AS j
            FROM cands
            JOIN dd x ON x.doc_id = cands.ia
            JOIN dd y ON y.doc_id = cands.ib)
        SELECT count(*) FILTER (WHERE j >= {THRESHOLD}) AS n_dup,
               count(*) FILTER (WHERE j >= {THRESHOLD}
                                AND j < {MARGIN}) AS n_straddling,
               min(j) FILTER (WHERE j >= {THRESHOLD}) AS min_dup_j
        FROM pairs""").fetchone()
    n_dup, n_straddling, min_dup_j = row
    # the generator plants near-dups: the guard must SEE them (a zero
    # here would mean the candidate generation broke, not a clean corpus)
    assert n_dup > 0, "fixture has no near-dup pairs at all?"
    assert n_straddling == 0, (
        f"{n_straddling} pair(s) in the banding danger band "
        f"[{THRESHOLD}, {MARGIN}) — min near-dup Jaccard {min_dup_j}; "
        f"the LSH-vs-exhaustive oracle convention is no longer "
        f"hash-stable on this fixture (replay the banding candidate "
        f"set in the twins, or regenerate the corpus)")
    assert min_dup_j >= MARGIN
