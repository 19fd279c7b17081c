"""Retrieval operators: chunking coverage laws, BM25 scoring sanity,
contamination audit on crafted frames."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from frames_map_reduce_spark.operators import retrieval as RET


def _doc(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestChunking:
    def test_short_doc_single_chunk(self, spark):
        df = _doc(spark, [(1, "a b c")])
        out = RET.chunk_by_tokens(df, "text", "doc_id", size=8, stride=4).collect()
        assert len(out) == 1
        assert out[0].start_tok == 1 and out[0].n_tokens == 3

    def test_every_token_covered_and_strides(self, spark):
        n = 103
        text = " ".join(f"t{i}" for i in range(n))
        df = _doc(spark, [(1, text)])
        size, stride = 16, 10
        rows = sorted(RET.chunk_by_tokens(df, "text", "doc_id",
                                          size=size, stride=stride).collect(),
                      key=lambda r: r.start_tok)
        # starts advance by exactly `stride`
        starts = [r.start_tok for r in rows]
        assert starts == list(range(1, starts[-1] + 1, stride))
        # full coverage: last chunk reaches the final token, all but the
        # last are full-size
        assert all(r.n_tokens == size for r in rows[:-1])
        assert rows[-1].start_tok + rows[-1].n_tokens - 1 == n
        # no chunk fully contained in its predecessor
        assert rows[-1].n_tokens > size - stride or len(rows) == 1

    def test_exact_multiple_no_trailing_empty(self, spark):
        # n = size: exactly one chunk, no degenerate second window
        text = " ".join(f"t{i}" for i in range(8))
        df = _doc(spark, [(1, text)])
        out = RET.chunk_by_tokens(df, "text", "doc_id", size=8, stride=4).collect()
        assert [r.start_tok for r in out] == [1]

    def test_bad_args(self, spark):
        df = _doc(spark, [(1, "a")])
        try:
            RET.chunk_by_tokens(df, "text", "doc_id", size=4, stride=8)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass


class TestBM25:
    def test_hand_computed_score(self, spark):
        # 2 docs, query term "x": doc 1 has tf=2 dl=4, doc 2 tf=0
        df = _doc(spark, [(1, "x y x z"), (2, "y z w q")])
        out = RET.bm25_scores(df, "text", "doc_id", ["x"], k1=1.2, b=0.75).collect()
        assert [r.doc_id for r in out] == [1]
        tf, dl, avgdl, n_docs, dfreq = 2, 4, 4.0, 2, 1
        idf = math.log(1 + (n_docs - dfreq + 0.5) / (dfreq + 0.5))
        expect = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
        assert abs(out[0].bm25 - round(expect, 6)) < 1e-9

    def test_more_hits_rank_higher_same_length(self, spark):
        df = _doc(spark, [(1, "x x x a"), (2, "x a b c"), (3, "a b c d")])
        out = RET.bm25_scores(df, "text", "doc_id", ["x"]).collect()
        ids = [r.doc_id for r in out]
        assert ids == [1, 2]  # doc 3 never matches; tf=3 beats tf=1

    def test_length_normalization(self, spark):
        # same tf, longer doc scores lower when b > 0
        df = _doc(spark, [(1, "x a"), (2, "x a b c d e f g")])
        out = {r.doc_id: r.bm25
               for r in RET.bm25_scores(df, "text", "doc_id", ["x"]).collect()}
        assert out[1] > out[2]


class TestContamination:
    def test_duplicate_across_split_detected(self, spark):
        leak = "one two three four five six seven"
        train = _doc(spark, [(1, leak), (2, "a b c d e f g h i j")])
        ev = _doc(spark, [(10, leak)]).select("text")
        out = RET.ngram_contamination(train, ev, "text", "doc_id", n=5).collect()
        assert [r.doc_id for r in out] == [1]
        r = out[0]
        assert r.n_grams == 3 and r.n_hit == 3 and r.hit_frac == 1.0

    def test_partial_overlap_fraction(self, spark):
        # train doc shares exactly one 5-gram window with eval
        train = _doc(spark, [(1, "p q r s t u v")])  # 3 distinct 5-grams
        ev = _doc(spark, [(10, "p q r s t zzz")]).select("text")
        out = RET.ngram_contamination(train, ev, "text", "doc_id", n=5).collect()
        assert len(out) == 1
        assert out[0].n_hit == 1
        assert out[0].hit_frac == round(1 / 3, 6)

    def test_clean_corpus_empty(self, spark):
        train = _doc(spark, [(1, "a b c d e f")])
        ev = _doc(spark, [(10, "q r s t u v")]).select("text")
        assert RET.ngram_contamination(train, ev, "text", "doc_id", n=5).count() == 0


class TestContaminationFirewall:
    def test_probe_equals_recompute_and_extend_law(self, spark, tmp_path):
        """build(A); extend(B) probes bit-identically to (a) the
        from-scratch ngram_contamination over A ∪ B and (b) a fresh
        build(A ∪ B) — the extend≡rebuild law the registry oracle
        relies on."""
        ev_a = _doc(spark, [(10, "one two three four five six"),
                            (11, "alpha beta gamma delta epsilon zeta")])
        ev_b = _doc(spark, [(12, "one two three four five six"),  # dup of A!
                            (13, "red green blue cyan magenta yellow")])
        train = _doc(spark, [
            (1, "one two three four five six seven"),       # hits A (and B)
            (2, "red green blue cyan magenta yellow again"),  # hits B only
            (3, "nothing shared with any benchmark here x")])
        RET.build_contamination_index(ev_a.select("text"), "cont_t1", "text",
                                      n=5)
        RET.extend_contamination_index(ev_b.select("text"), "cont_t1", "text",
                                       n=5)
        got = sorted(RET.probe_contamination_index(
            spark, "cont_t1", train, "text", "doc_id", n=5).collect())
        want = sorted(RET.ngram_contamination(
            train, ev_a.union(ev_b).select("text"), "text", "doc_id",
            n=5).collect())
        assert got == want and [r.doc_id for r in got] == [1, 2]
        RET.build_contamination_index(
            ev_a.union(ev_b).select("text"), "cont_t2", "text", n=5)
        fresh = sorted(RET.probe_contamination_index(
            spark, "cont_t2", train, "text", "doc_id", n=5).collect())
        assert got == fresh

    def test_extend_duplicates_do_not_double_count(self, spark):
        """An extend that re-appends the EXACT same benchmark leaves
        every probe verdict unchanged (left_semi is multiplicity-blind)
        — and the stats monitor exposes the duplicate rows."""
        ev = _doc(spark, [(10, "one two three four five six")])
        train = _doc(spark, [(1, "one two three four five six seven")])
        RET.build_contamination_index(ev.select("text"), "cont_t3", "text",
                                      n=5)
        before = sorted(RET.probe_contamination_index(
            spark, "cont_t3", train, "text", "doc_id", n=5).collect())
        RET.extend_contamination_index(ev.select("text"), "cont_t3", "text",
                                       n=5)
        after = sorted(RET.probe_contamination_index(
            spark, "cont_t3", train, "text", "doc_id", n=5).collect())
        assert before == after
        st = RET.contamination_index_stats(spark, "cont_t3").head()
        assert st.n_rows == 2 * st.n_distinct  # every gram exactly twice

    def test_probe_plan_broadcasts_index(self, spark):
        """The index side must reach the probe join as a broadcast —
        the contract that keeps the incoming corpus shuffle-free beyond
        its per-doc reduce."""
        ev = _doc(spark, [(10, "one two three four five six")])
        train = _doc(spark, [(1, "one two three four five six seven")])
        RET.build_contamination_index(ev.select("text"), "cont_t4", "text",
                                      n=5)
        plan = RET.probe_contamination_index(
            spark, "cont_t4", train, "text", "doc_id",
            n=5)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftSemi" in plan

    def test_build_rejects_bad_n(self, spark):
        ev = _doc(spark, [(10, "a b c")])
        for fn in (RET.build_contamination_index,
                   RET.extend_contamination_index):
            try:
                fn(ev.select("text"), "cont_t5", "text", n=0)
                raise AssertionError("expected ValueError")
            except ValueError:
                pass
