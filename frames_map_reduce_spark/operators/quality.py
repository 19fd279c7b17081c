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
from functools import reduce as _reduce
from operator import add as _add

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


#: fixed-point scale/offset for the optional integer rank key: token
#: logprobs are quantized to micro-units (far below the model's noise
#: floor), and a 2^30 positive offset makes the half-up integer mean
#: sign-free (Spark ``div`` truncates, DuckDB ``//`` floors — they only
#: agree on non-negatives; the offset cancels in every comparison).
_LM_RANK_SCALE = 1_000_000
_LM_RANK_OFFSET = 1 << 30


def unigram_lm_score(df: DataFrame, text_col: str, id_col: str,
                     k_smooth: float = 0.5,
                     lm: DataFrame | None = None,
                     token_col: str = "token",
                     count_col: str = "cnt",
                     rank_key: bool = False) -> DataFrame:
    """Per-document unigram language-model score — the CCNet-style
    "perplexity filter" quality gate: documents whose token stream is
    unlikely under a reference unigram model (gibberish, encoding noise,
    exotic boilerplate) score high-perplexity and get filtered before
    training.

    Output per document (tokenless documents are absent — mirror in any
    SQL twin): ``id_col``, ``n_tokens``, ``avg_logprob`` (mean over token
    OCCURRENCES of ``ln((cnt + k) / (N + k·(V+1)))``, add-k smoothing
    with one reserved unseen slot; rounded 6dp), ``perplexity``
    (``exp(-avg_logprob)`` of the rounded mean, rounded 3dp — both
    engines exponentiate the identical double).

    ``lm`` defaults to the corpus's own counts (self-perplexity — spots
    outliers against the corpus itself, no OOV possible).  Pass a
    ``(token_col, count_col)`` frame to score against a REFERENCE model
    (e.g. counts from a trusted corpus); unseen tokens then take the
    smoothed-unseen mass ``ln(k / (N + k·(V+1)))`` via the left join.

    ``rank_key=True`` adds ``lp_rank`` (BIGINT): the half-up integer
    mean of the MICRO-quantized token logprobs (offset-positive — see
    ``_LM_RANK_SCALE``/``_LM_RANK_OFFSET``).  ``avg_logprob`` is a
    double average whose accumulation order is engine/partition
    specific; the 6dp round absorbs the last-ulp wobble for VALUE
    comparisons, but anything that makes a DISCRETE decision on the
    score (rank cuts, top-k membership) must not ride on it — integer
    sums are order-independent, so ``lp_rank`` is bit-identical under
    any partitioning and any engine.  Higher = more likely = lower
    perplexity.  Ranking only; never convert it back to a probability.

    Scale shape: explode → (optional) one vocabulary aggregation → a
    key-equality join of token occurrences against the vocab frame
    (map-side combine collapses within-partition repeats of hot tokens
    before the shuffle; AQE broadcasts the vocab side when it fits — a
    natural-language vocabulary almost always does) → one per-doc
    aggregation.  Nothing quadratic, nothing driver-side.
    """
    require_columns(df, [text_col, id_col])
    if k_smooth <= 0:
        raise ValueError(f"k_smooth must be positive, got {k_smooth}")
    toks = df.select(id_col,
                     F.explode(TX.tokens(F.col(text_col))).alias("_tok"))
    if lm is None:
        vocab = toks.groupBy("_tok").agg(F.count(F.lit(1)).alias("_cnt"))
    else:
        require_columns(lm, [token_col, count_col])
        vocab = lm.select(F.col(token_col).alias("_tok"),
                          F.col(count_col).cast("long").alias("_cnt"))
    stats = vocab.agg(F.sum("_cnt").alias("_N"),
                      F.count(F.lit(1)).alias("_V"))
    k = float(k_smooth)
    lp = F.log((F.coalesce(F.col("_cnt"), F.lit(0)) + F.lit(k))
               / (F.col("_N") + F.lit(k) * (F.col("_V") + 1)))
    scored = (toks.join(vocab, "_tok", "left")
                  .crossJoin(F.broadcast(stats))
                  .select(id_col, lp.alias("_lp")))
    aggs = [F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("_lp"), 6).alias("avg_logprob")]
    if rank_key:
        q = (F.round(F.col("_lp") * _LM_RANK_SCALE, 0).cast("bigint")
             + F.lit(_LM_RANK_OFFSET))
        aggs.append(F.sum(q).alias("_qs"))
    per_doc = scored.groupBy(id_col).agg(*aggs)
    cols = [F.col(id_col), F.col("n_tokens"), F.col("avg_logprob"),
            F.round(F.exp(-F.col("avg_logprob")), 3).alias("perplexity")]
    if rank_key:
        cols.append(F.expr("(2 * _qs + n_tokens) div (2 * n_tokens)")
                     .alias("lp_rank"))
    return per_doc.select(*cols)


def unigram_lm_score_sql(table: str, text_col: str, id_col: str,
                         k_smooth: float = 0.5,
                         rank_key: bool = False) -> str:
    """DuckDB twin of :func:`unigram_lm_score` in self-corpus mode
    (differential oracle) — same tokenizer spec (``TX.tokens_sql``), same
    smoothing arithmetic, same round-before-exp staging; with
    ``rank_key`` the same micro-quantized offset-positive half-up
    integer mean (``//`` floor division ≡ Spark ``div`` on the
    offset-guaranteed non-negatives)."""
    k = repr(float(k_smooth))
    toks = TX.tokens_sql(text_col)
    rank_agg = (f",\n                   sum(CAST(round(_lp * {_LM_RANK_SCALE}, 0) AS BIGINT)"
                f" + {_LM_RANK_OFFSET}) AS _qs" if rank_key else "")
    rank_out = (",\n               CAST((2 * _qs + n_tokens) // (2 * n_tokens)"
                " AS BIGINT) AS lp_rank" if rank_key else "")
    return f"""
        WITH toks AS (
            SELECT {id_col}, unnest({toks}) AS _tok FROM {table}),
        vocab AS (
            SELECT _tok, count(*)::BIGINT AS _cnt FROM toks GROUP BY _tok),
        st AS (
            SELECT sum(_cnt) AS _n, count(*) AS _v FROM vocab),
        lp AS (
            SELECT t.{id_col},
                   ln((COALESCE(v._cnt, 0) + {k}) / (st._n + {k} * (st._v + 1))) AS _lp
            FROM toks t LEFT JOIN vocab v USING (_tok) CROSS JOIN st),
        agg AS (
            SELECT {id_col}, count(*)::BIGINT AS n_tokens,
                   round(avg(_lp), 6) AS avg_logprob{rank_agg}
            FROM lp GROUP BY {id_col})
        SELECT {id_col}, n_tokens, avg_logprob,
               round(exp(-avg_logprob), 3) AS perplexity{rank_out}
        FROM agg"""


#: beginning-of-document sentinel for the bigram model's first transition.
#: A single space can never be a token (the tokenizer splits on it), so it
#: cannot collide with vocabulary.
_BOS = " "


def _transitions(t):
    """(prev, tok) pairs over a token array: (BOS, t1), (t1, t2), …
    Pure expression — prepend the sentinel, drop the last element, zip."""
    prevs = F.concat(F.array(F.lit(_BOS)),
                     F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))))
    return F.arrays_zip(prevs.alias("prev"), t.alias("tok"))


def bigram_lm_score(df: DataFrame, text_col: str, id_col: str,
                    k_smooth: float = 0.5,
                    broadcast_ctx: bool = True) -> DataFrame:
    """Per-document BIGRAM language-model score — the conditional
    upgrade of :func:`unigram_lm_score` (closer to the CCNet filter's
    n-gram model): each token is scored given its predecessor,
    ``ln((c(prev, tok) + k) / (c(prev) + k·(V+1)))`` with add-k
    smoothing over the corpus vocabulary ``V`` (+1 unseen slot), the
    first token conditioned on a BOS sentinel.  Degenerate repetition
    scores HIGH probability (low perplexity) under a bigram model while
    gibberish scores low — the two tails a quality gate cuts.

    Output per document (tokenless docs absent): ``id_col``,
    ``n_tokens``, ``avg_logprob`` (mean over transitions, rounded 6dp),
    ``perplexity`` (``exp(-avg)`` of the rounded mean, rounded 3dp).

    Scale shape: one explode of (prev, tok) pairs → bigram-count
    aggregation → context-count aggregation (both 2-phase, map-side
    combined) → two key-equality joins of the transition stream against
    those frames (AQE broadcasts them when the bigram table fits; at
    web scale it goes shuffle-side, which is the correct call) → one
    per-doc aggregation.  Nothing quadratic, nothing driver-side."""
    require_columns(df, [text_col, id_col])
    if k_smooth <= 0:
        raise ValueError(f"k_smooth must be positive, got {k_smooth}")
    toks = df.select(F.col(id_col), TX.tokens(F.col(text_col)).alias("_t")) \
             .filter(F.size("_t") > 0)
    trans = toks.select(
        id_col, F.explode(_transitions(F.col("_t"))).alias("_tr")) \
        .select(id_col, F.col("_tr.prev").alias("_prev"),
                F.col("_tr.tok").alias("_tok"))
    big = trans.groupBy("_prev", "_tok").agg(F.count(F.lit(1)).alias("_cb"))
    ctx = big.groupBy("_prev").agg(F.sum("_cb").alias("_cp"))
    vocab = trans.agg(F.count_distinct(F.col("_tok")).alias("_V"))
    k = float(k_smooth)
    lp = F.log((F.col("_cb") + F.lit(k))
               / (F.col("_cp") + F.lit(k) * (F.col("_V") + 1)))
    # ctx is provably ≤ vocab+1 rows (one per distinct predecessor incl.
    # BOS), so broadcast it EXPLICITLY by default: the BOS sentinel is a
    # guaranteed hot key (one transition per document) and on a
    # shuffle-side join it would funnel every document's first
    # transition through one partition.  ≤ vocab+1 is still unbounded
    # for token spaces like URLs/ids (r6 ADVICE) — ``broadcast_ctx=
    # False`` drops the hint and lets AQE pick the join (its skew-join
    # then splits the BOS partition; results are identical either way,
    # pinned in tests).  The bigram table `big` stays AQE-decided in
    # both modes — it is O(distinct bigrams), genuinely shuffle-scale
    # at web size, and its (prev, tok) key splits BOS mass across
    # distinct first tokens (residual skew pinned in
    # tests/test_skew_stress.py).
    ctx_side = F.broadcast(ctx) if broadcast_ctx else ctx
    scored = (trans.join(big, ["_prev", "_tok"])
                   .join(ctx_side, "_prev")
                   .crossJoin(F.broadcast(vocab))
                   .select(id_col, lp.alias("_lp")))
    per_doc = (scored.groupBy(id_col)
                     .agg(F.count(F.lit(1)).alias("n_tokens"),
                          F.round(F.avg("_lp"), 6).alias("avg_logprob")))
    return per_doc.select(
        id_col, "n_tokens", "avg_logprob",
        F.round(F.exp(-F.col("avg_logprob")), 3).alias("perplexity"))


def bigram_lm_score_sql(table: str, text_col: str, id_col: str,
                        k_smooth: float = 0.5) -> str:
    """DuckDB twin of :func:`bigram_lm_score` — same tokenizer spec,
    sentinel, smoothing arithmetic, and round-before-exp staging."""
    k = repr(float(k_smooth))
    toks = TX.tokens_sql(text_col)
    return f"""
        WITH base AS (
            SELECT {id_col}, {toks} AS t FROM {table}),
        trans AS (
            SELECT {id_col},
                   unnest(list_zip(
                       list_concat([' '], t[1:len(t) - 1]), t)) AS tr
            FROM base WHERE len(t) > 0),
        tr2 AS (
            SELECT {id_col}, tr[1] AS prev, tr[2] AS tok FROM trans),
        big AS (
            SELECT prev, tok, count(*)::BIGINT AS cb
            FROM tr2 GROUP BY prev, tok),
        ctx AS (
            SELECT prev, sum(cb)::BIGINT AS cp FROM big GROUP BY prev),
        voc AS (
            SELECT count(DISTINCT tok) AS v FROM tr2),
        lp AS (
            SELECT t.{id_col},
                   ln((b.cb + {k}) / (c.cp + {k} * (voc.v + 1))) AS _lp
            FROM tr2 t
            JOIN big b ON b.prev = t.prev AND b.tok = t.tok
            JOIN ctx c ON c.prev = t.prev
            CROSS JOIN voc),
        agg AS (
            SELECT {id_col}, count(*)::BIGINT AS n_tokens,
                   round(avg(_lp), 6) AS avg_logprob
            FROM lp GROUP BY {id_col})
        SELECT {id_col}, n_tokens, avg_logprob,
               round(exp(-avg_logprob), 3) AS perplexity
        FROM agg"""


# ---------------------------------------------------------------------------
# Token-distribution entropy (exact integer micronats)
# ---------------------------------------------------------------------------

#: fixed-point scale for entropy staging: per-distinct-token ln values are
#: quantized to MICROnats before the per-document accumulation, so every
#: sum is a BIGINT (order-independent — bit-identical under any partitioning
#: and any engine; the same staging discipline as the classifier's
#: micro-log-odds).  1e-6 nat is far below any filtering threshold's noise
#: floor.
_ENTROPY_SCALE = 1_000_000


def entropy_run_struct(text_col: str):
    """The in-row entropy fold as ONE reusable Column — the exact
    arithmetic of :func:`token_entropy_profile`, factored so per-batch
    monitors (``streaming.stream_quality_dashboard``) can fuse it into
    a single aggregation pass instead of running the profile as a
    separate job.

    Returns ``struct(n: long, r: struct(q: long, t: long))`` per row:
    ``n`` = token count, ``r.t`` = distinct-token count, ``r.q`` =
    BIGINT Σ ``round(ln(c)·1e6)·c`` over the row's equal-runs —
    ``entropy_micro = round(ln(n)·1e6) − (2·q + n) div (2·n)`` exactly
    as the profile stages it.  The fold appears once in the expression
    tree (extract fields AFTER a select boundary to keep it
    evaluated once per row)."""
    toks = TX.tokens(F.col(text_col))
    srt = F.array_sort(toks)
    zl = F.lit(0).cast("long")

    def _closed(acc):
        return (F.round(F.log(acc["c"].cast("double")) * _ENTROPY_SCALE, 0)
                 .cast("bigint") * acc["c"])

    def _merge(acc, x):
        return F.when(
            (acc["c"] > zl) & (x == acc["p"]),
            F.struct(acc["p"].alias("p"),
                     (acc["c"] + F.lit(1).cast("long")).alias("c"),
                     acc["t"].alias("t"), acc["q"].alias("q"))
        ).otherwise(
            F.struct(x.alias("p"), F.lit(1).cast("long").alias("c"),
                     (acc["t"] + F.lit(1).cast("long")).alias("t"),
                     (acc["q"] + F.when(acc["c"] > zl, _closed(acc))
                                  .otherwise(zl)).alias("q")))

    def _finish(acc):
        return F.struct(
            (acc["q"] + F.when(acc["c"] > zl, _closed(acc)).otherwise(zl))
             .alias("q"),
            acc["t"].alias("t"))

    runs = F.aggregate(
        srt,
        F.struct(F.lit("").alias("p"), zl.alias("c"),
                 zl.alias("t"), zl.alias("q")),
        _merge, _finish)
    return F.struct(F.size(toks).cast("long").alias("n"),
                    runs.alias("r"))


def token_entropy_profile(df: DataFrame, text_col: str, id_col: str,
                          carry: Sequence[str] = ()) -> DataFrame:
    """Per-document Shannon entropy of the token distribution, in exact
    integer micronats — the "low-entropy junk" quality signal (keyword
    stuffing, degenerate repetition, boilerplate loops score near 0;
    natural prose scores near ln of its length).  The same family of
    distributional gates as Gopher's repetition rules, but a single
    scalar that composes with threshold cuts.

    ``H = ln(n) − (1/n)·Σ_t c_t·ln(c_t)`` over the document's distinct
    tokens ``t`` with occurrence counts ``c_t`` (``n = Σ c_t``) —
    algebraically identical to ``−Σ p·ln p`` but staged so the only
    per-token float op is one ``ln`` that is immediately quantized:

    - per (doc, token): ``q = round(ln(c)·1e6)::BIGINT · c`` (``ln(1)=0``,
      so singleton tokens contribute exactly 0);
    - per doc: BIGINT sums, then
      ``entropy_micro = round(ln(n)·1e6) − halfup(Σq / n)`` with the
      half-up integer division ``(2·Σq + n) div (2·n)`` (non-negative
      operands, so Spark ``div`` truncation and DuckDB ``//`` flooring
      agree).

    Downstream DISCRETE decisions (threshold cuts, bottom-k membership)
    must ride on ``entropy_micro`` — it is engine-stable; ``entropy``
    (``entropy_micro/1e6``, one correctly-rounded division) and ``ttr``
    (type-token ratio, one correctly-rounded division, 6dp) are
    convenience projections.

    Tokenless documents are absent from the output (mirror in any SQL
    twin).

    Scale shape: explode → (doc, token) count → one per-doc aggregation.
    Map-side partial aggregation collapses within-partition repeats, so a
    pathological document costs bandwidth proportional to its DISTINCT
    tokens.  Nothing quadratic, nothing driver-side.
    """
    require_columns(df, [text_col, id_col, *carry])
    # r13 (guide §2.4 — remove shuffles outright): entropy is a
    # PER-DOCUMENT quantity, so no shuffle is fundamentally required —
    # the old explode → groupBy(doc, token) → groupBy(doc) shape paid
    # two exchanges to count within-row token repeats.  Now the counts
    # come from one in-row pass (entropy_run_struct): sort the token
    # array and fold it with ``F.aggregate``, closing each equal-run by
    # adding the SAME quantized ``round(ln(c)·1e6)·c`` term (the
    # identical Spark Log expression, so the doubles are the engine's
    # own), types and token totals alongside.  BIGINT sums are exact
    # under any association order, so the output is bit-identical
    # (verified row-for-row on the sf0.1 corpus before the switch);
    # tokenless documents stay absent via the size filter.
    runs = entropy_run_struct(text_col)
    per_doc = (df.select(id_col, *carry, runs.alias("_runs"))
                 .filter(F.col("_runs")["n"] > 0)
                 .select(id_col, *carry,
                         F.col("_runs")["n"].alias("n_tokens"),
                         F.col("_runs")["r"]["t"].alias("n_types"),
                         F.col("_runs")["r"]["q"].alias("_qs")))
    h = (F.round(F.log(F.col("n_tokens").cast("double")) * _ENTROPY_SCALE, 0)
          .cast("bigint")
         - F.expr("(2 * _qs + n_tokens) div (2 * n_tokens)"))
    return per_doc.select(
        id_col, *carry,
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_types").cast("bigint").alias("n_types"),
        h.alias("entropy_micro"),
        (h.cast("double") / _ENTROPY_SCALE).alias("entropy"),
        F.round(F.try_divide(F.col("n_types").cast("double"),
                             F.col("n_tokens").cast("double")), 6)
         .alias("ttr"))


def token_entropy_profile_sql(table: str, text_col: str, id_col: str,
                              carry: Sequence[str] = ()) -> str:
    """DuckDB twin of :func:`token_entropy_profile` (differential oracle):
    the same micronat quantize-then-BIGINT-sum staging, verbatim."""
    cs = "".join(f", {c}" for c in carry)
    toks = TX.tokens_sql(text_col)
    s = _ENTROPY_SCALE
    return f"""
        SELECT {id_col}{cs}, n_tokens, n_types,
               entropy_micro,
               entropy_micro::DOUBLE / {s} AS entropy,
               round(n_types::DOUBLE / n_tokens, 6) AS ttr
        FROM (SELECT {id_col}{cs},
                     n_tokens::BIGINT AS n_tokens,
                     n_types::BIGINT AS n_types,
                     (CAST(round(ln(n_tokens::DOUBLE) * {s}, 0) AS BIGINT)
                      - (2 * _qs + n_tokens) // (2 * n_tokens))::BIGINT
                         AS entropy_micro
              FROM (SELECT {id_col}{cs}, sum(_c) AS n_tokens,
                           count(*) AS n_types,
                           sum(CAST(round(ln(_c::DOUBLE) * {s}, 0) AS BIGINT)
                               * _c) AS _qs
                    FROM (SELECT {id_col}{cs}, _tok, count(*) AS _c
                          FROM (SELECT {id_col}{cs}, unnest({toks}) AS _tok
                                FROM {table})
                          GROUP BY {id_col}{cs}, _tok)
                    GROUP BY {id_col}{cs}))"""


# ---------------------------------------------------------------------------
# Distribution drift: Population Stability Index (exact integer staging)
# ---------------------------------------------------------------------------

def quantile_breakpoints(df: DataFrame, value_col: str,
                         n_bins: int = 10) -> list[int]:
    """Equal-depth bin breakpoints of an integer column — the textbook
    PSI deployment shape: derive the bin edges ONCE from the design-time
    reference distribution, freeze them, and monitor every later
    snapshot against them (:func:`psi_drift` with ``breakpoints=``).

    Breakpoint ``b_k`` (k = 1..n_bins−1) is the smallest value whose
    cumulative count satisfies ``cum·n_bins ≥ k·N`` — SQL-standard
    ``percentile_disc(k/n_bins)``, but stated in CROSS-MULTIPLIED exact
    integers, so the edges are bit-identical across engines with no
    float quantile definition in sight.  Skewed references can repeat a
    breakpoint; the duplicate is kept (deterministic; the resulting
    permanently-empty bin is harmless under add-one smoothing).

    Returns the Python list (a bounded collect by contract: exactly
    ``n_bins − 1`` integers) — edges are design-time constants that
    ship into monitoring jobs, not per-run data.

    Scale shape: one distinct-value aggregation, then a single-column
    cumulative window over the DISTINCT values.  That window is one
    global sort of the value DOMAIN — fine for the bounded-cardinality
    features PSI monitors (lengths, scores, token counts); pre-quantize
    a genuinely continuous column before deriving edges from it.
    """
    from pyspark.sql import Window

    require_columns(df, [value_col])
    if n_bins < 2:
        raise ValueError(f"need n_bins >= 2, got {n_bins}")
    dist = (df.select(F.col(value_col).cast("bigint").alias("_v"))
              .where(F.col("_v").isNotNull())
              .groupBy("_v").agg(F.count(F.lit(1)).alias("_c")))
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    cum = dist.select("_v", F.sum("_c").over(w).alias("_cum"))
    tot = dist.agg(F.sum("_c").alias("_N"))
    ks = df.sparkSession.range(1, n_bins).select(F.col("id").alias("_k"))
    rows = (cum.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(ks))
               .where(F.col("_cum") * n_bins >= F.col("_k") * F.col("_N"))
               .groupBy("_k").agg(F.min("_v").alias("_b"))
               .orderBy("_k").collect())
    if len(rows) != n_bins - 1:
        raise ValueError(
            f"reference has no rows with non-null {value_col!r} — "
            "cannot derive breakpoints")
    return [int(r._b) for r in rows]


def quantile_breakpoints_sql(ref_sel: str, value_col: str,
                             n_bins: int = 10) -> str:
    """DuckDB twin of :func:`quantile_breakpoints` (replay oracle):
    emits ``(k, b)`` rows — the same cross-multiplied integer
    percentile_disc rule, verbatim."""
    return f"""
        WITH _qb_dist AS (
            SELECT CAST({value_col} AS BIGINT) AS _v, count(*) AS _c
            FROM ({ref_sel}) WHERE {value_col} IS NOT NULL GROUP BY 1),
        _qb_cum AS (
            SELECT _v, sum(_c) OVER (ORDER BY _v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cum
            FROM _qb_dist),
        _qb_tot AS (SELECT sum(_c) AS _N FROM _qb_dist),
        _qb_ks AS (SELECT unnest(range(1, {n_bins}))::BIGINT AS _k)
        SELECT _k AS k, min(_v) AS b
        FROM _qb_cum CROSS JOIN _qb_tot CROSS JOIN _qb_ks
        WHERE _cum * {n_bins} >= _k * _N
        GROUP BY _k"""


def _breakpoint_bin_expr(value_col: str, breakpoints) -> str:
    """Bin index under explicit breakpoints — the count of breakpoints
    ≤ value, as a sum of cast comparisons.  Valid in BOTH dialects
    verbatim (NULL values stay NULL and drop out of the bin range in
    both engines); the equal-width form is NOT shared (Spark integer
    division is ``div``, DuckDB's is ``//``) and stays inline at its
    two call sites."""
    terms = " + ".join(
        f"CAST(CAST({value_col} AS BIGINT) >= {int(b)} AS INT)"
        for b in breakpoints)
    return f"({terms})"


def psi_drift(ref: DataFrame, cur: DataFrame, value_col: str,
              lo: int | None = None, hi: int | None = None,
              n_bins: int = 10,
              breakpoints: Sequence[int] | None = None) -> DataFrame:
    """Population Stability Index between a REFERENCE snapshot and a
    CURRENT snapshot of a numeric column — the standard drift monitor a
    continuously-ingesting corpus runs on its feature distributions
    (doc length, quality score, token count): PSI < 0.1 stable,
    0.1–0.25 moderate shift, > 0.25 investigate (the conventional
    credit-scoring thresholds).

    ``PSI = Σ_b (p_b − q_b)·ln(p_b / q_b)`` over ``n_bins`` equal-width
    bins of ``[lo, hi)`` (values clamp into the edge bins, so the
    binning is total — no dropped rows, and the bin index is pure
    INTEGER arithmetic: ``(v − lo)·n_bins div (hi − lo)`` clamped).
    Add-one smoothing (``p_b = (c_b + 1)/(N + n_bins)``) keeps empty
    bins finite — the standard PSI practice — and makes every share a
    single correctly-rounded division of exact integers.

    Pass ``breakpoints=`` (a sorted integer list, typically from
    :func:`quantile_breakpoints` on the design-time reference) instead
    of ``(lo, hi)`` for the textbook EQUAL-DEPTH deployment shape: bin
    index = count of breakpoints ≤ value (``len(breakpoints) + 1``
    bins, still total, still pure integer comparisons).  NULL values
    drop out of both sides in both modes and both engines.

    The only non-correctly-rounded op is one ``ln`` per bin, which is
    immediately quantized: ``psi_term_micro = round((p−q)·ln(p/q)·1e6)``
    (BIGINT).  ``psi_micro`` (the total, identical on every row) is a
    BIGINT sum of those terms — engine-stable, so alerting thresholds
    (``psi_micro > 250_000``) never flip between engines.

    Output: one row per bin — ``bin`` (0-based), ``n_ref``, ``n_cur``,
    ``psi_term_micro``, ``psi_micro`` (total) — empty bins included
    (generated from a literal range, so both engines emit all
    ``n_bins`` rows even for bins neither side populates).

    Scale shape: each side is one projection + one ``n_bins``-row
    aggregation; the bin frames are tiny by construction, so the joins
    and the total are broadcast-class.  Nothing quadratic, nothing
    driver-side.
    """
    require_columns(ref, [value_col])
    require_columns(cur, [value_col])
    if breakpoints is not None:
        if lo is not None or hi is not None:
            raise ValueError("pass EITHER (lo, hi) for equal-width bins "
                             "OR breakpoints=, not both")
        bks = [int(b) for b in breakpoints]
        if len(bks) < 1 or sorted(bks) != bks:
            raise ValueError(f"breakpoints must be a non-empty sorted "
                             f"list, got {breakpoints!r}")
        n_bins = len(bks) + 1
    else:
        if not (isinstance(lo, int) and isinstance(hi, int)) or hi <= lo:
            raise ValueError(f"need integer lo < hi, got {lo!r}, {hi!r}")
        if n_bins < 2:
            raise ValueError(f"need n_bins >= 2, got {n_bins}")
    spark = ref.sparkSession

    def binned(df: DataFrame, out: str) -> DataFrame:
        if breakpoints is not None:
            b = F.expr(_breakpoint_bin_expr(value_col, bks))
        else:
            # integer div, NOT `/` (Spark's `/` on bigints is double
            # division — a misplaced floor at scale); div truncates where
            # DuckDB's // floors, but they only differ below lo, where
            # the clamp-to-0 makes both land in bin 0
            b = F.expr(f"(CAST({value_col} AS BIGINT) - {lo}) * {n_bins}"
                       f" div {hi - lo}")
            b = F.least(F.greatest(b, F.lit(0)), F.lit(n_bins - 1))
        return (df.select(b.cast("int").alias("bin"))
                  .groupBy("bin").agg(F.count(F.lit(1)).alias(out)))

    bins = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    counts = (bins.join(binned(ref, "_nr"), "bin", "left")
                  .join(binned(cur, "_nc"), "bin", "left")
                  .select("bin",
                          F.coalesce("_nr", F.lit(0)).alias("n_ref"),
                          F.coalesce("_nc", F.lit(0)).alias("n_cur")))
    # totals and the PSI sum are aggregates OVER the n_bins-row counts
    # frame: unpartitioned windows over that bounded frame compute them
    # in place (the train_logodds_classifier totals shape) instead of
    # two agg→broadcast-crossJoin round-trips, each of which
    # re-referenced the counts lineage and re-expanded both corpus-side
    # aggregations in the plan.  Same BIGINT sums in the same double
    # expressions — values unchanged; the single-partition window is
    # bounded at n_bins rows by construction.
    from pyspark.sql import Window as _W
    wall = _W.partitionBy()
    p = (F.col("n_ref") + 1).cast("double") \
        / (F.sum("n_ref").over(wall) + n_bins)
    q = (F.col("n_cur") + 1).cast("double") \
        / (F.sum("n_cur").over(wall) + n_bins)
    term = (F.round((p - q) * F.log(p / q) * 1_000_000, 0).cast("bigint")
             .alias("psi_term_micro"))
    terms = counts.select(
        "bin", F.col("n_ref").cast("bigint").alias("n_ref"),
        F.col("n_cur").cast("bigint").alias("n_cur"), term)
    return terms.select(
        "bin", "n_ref", "n_cur", "psi_term_micro",
        F.sum("psi_term_micro").over(wall).cast("bigint")
         .alias("psi_micro"))


def psi_drift_sql(ref_sel: str, cur_sel: str, value_col: str,
                  lo: int | None = None, hi: int | None = None,
                  n_bins: int = 10,
                  breakpoints: Sequence[int] | None = None) -> str:
    """DuckDB twin of :func:`psi_drift` (differential oracle):
    ``ref_sel``/``cur_sel`` are SELECT statements exposing ``value_col``
    — the same integer binning (equal-width or explicit breakpoints),
    add-one smoothing, and micro-quantized term staging, verbatim."""
    if breakpoints is not None:
        bks = [int(x) for x in breakpoints]
        n_bins = len(bks) + 1
        b = _breakpoint_bin_expr(value_col, bks)
    else:
        b = (f"least(greatest((CAST({value_col} AS BIGINT) - {lo})"
             f" * {n_bins} // ({hi - lo}), 0), {n_bins - 1})")
    return f"""
        WITH _psi_bins AS (SELECT unnest(range({n_bins}))::INT AS bin),
        _psi_r AS (SELECT {b}::INT AS bin, count(*) AS _nr
              FROM ({ref_sel}) GROUP BY 1),
        _psi_c AS (SELECT {b}::INT AS bin, count(*) AS _nc
              FROM ({cur_sel}) GROUP BY 1),
        _psi_counts AS (
            SELECT _psi_bins.bin,
                   coalesce(_nr, 0) AS n_ref, coalesce(_nc, 0) AS n_cur
            FROM _psi_bins LEFT JOIN _psi_r USING (bin)
                           LEFT JOIN _psi_c USING (bin)),
        _psi_tot AS (SELECT sum(n_ref) AS _tr, sum(n_cur) AS _tc
                     FROM _psi_counts),
        _psi_terms AS (
            SELECT bin, n_ref::BIGINT AS n_ref, n_cur::BIGINT AS n_cur,
                   CAST(round(((n_ref + 1)::DOUBLE / (_tr + {n_bins})
                               - (n_cur + 1)::DOUBLE / (_tc + {n_bins}))
                              * ln(((n_ref + 1)::DOUBLE / (_tr + {n_bins}))
                                   / ((n_cur + 1)::DOUBLE / (_tc + {n_bins})))
                              * 1000000, 0) AS BIGINT) AS psi_term_micro
            FROM _psi_counts CROSS JOIN _psi_tot)
        SELECT bin, n_ref, n_cur, psi_term_micro,
               (SELECT sum(psi_term_micro)
                FROM _psi_terms)::BIGINT AS psi_micro
        FROM _psi_terms"""


def psi_against_reference(cur: DataFrame, value_col: str,
                          breakpoints: Sequence[int],
                          ref_counts: Sequence[int]) -> DataFrame:
    """PSI of a CURRENT snapshot against a FROZEN reference — the
    monitoring-loop form of :func:`psi_drift`: the reference side is
    not a frame but the design-time constants a monitor ships with
    (edges from :func:`quantile_breakpoints`, bin counts from the same
    design pass), so scoring a snapshot touches ONE pass over the
    current data plus an ``n_bins``-row literal.

    Same staging as :func:`psi_drift` (total integer binning, add-one
    smoothing, micro-quantized terms, BIGINT total) — the two agree
    exactly when handed the same reference.  Returns ONE row:
    ``n_rows`` (BIGINT, non-null current rows binned), ``psi_micro``
    (BIGINT).  An all-NULL or empty current side still returns the row
    (n_rows = 0; PSI of the smoothed-uniform vs the reference).
    """
    require_columns(cur, [value_col])
    # ONE flat conditional aggregation (r13, guide §2.4 — remove
    # shuffles outright): the reference side is all Python constants,
    # so the per-bin current counts are ``n_bins`` conditional sums in
    # a single 2-phase aggregation — no bin groupBy, no spine join, no
    # totals crossJoin (the old plan ran 3 extra tiny exchanges plus a
    # broadcast per MICRO-BATCH).  Values are bit-identical: each
    # bin's (p, q, term) arithmetic is the same expression over the
    # same numbers (the reference total is the literal ``sum(refs)``),
    # and the BIGINT term/count sums are exact regardless of
    # association order.
    binx, agg_cols, with_total, n_rows_col, psi_col = \
        psi_reference_fusion(value_col, breakpoints, ref_counts)
    row = cur.select(binx.alias("_b")).agg(*agg_cols)
    return with_total(row).select(n_rows_col.alias("n_rows"),
                                  psi_col.alias("psi_micro"))


def psi_reference_fusion(value_col: str, breakpoints: Sequence[int],
                         ref_counts: Sequence[int], prefix: str = ""):
    """The pieces of :func:`psi_against_reference` exposed for FUSION
    into a wider single-pass aggregation (``streaming.
    stream_quality_dashboard`` computes entropy + PSI + classifier
    totals in ONE job per micro-batch) — the arithmetic is this
    module's, verbatim, so fused and standalone scores are
    bit-identical by construction.

    Returns ``(bin_col, agg_cols, with_total, n_rows_col, psi_col)``:
    project ``bin_col`` as ``{prefix}_b`` alongside whatever else the
    pass computes, add ``agg_cols`` to the single ``.agg``, pipe the
    1-row result through ``with_total`` (attaches ``{prefix}_tc``),
    then select ``n_rows_col`` / ``psi_col``."""
    bks = [int(b) for b in breakpoints]
    if len(bks) < 1 or sorted(bks) != bks:
        raise ValueError(f"breakpoints must be a non-empty sorted list, "
                         f"got {breakpoints!r}")
    n_bins = len(bks) + 1
    refs = [int(c) for c in ref_counts]
    if len(refs) != n_bins or any(c < 0 for c in refs):
        raise ValueError(
            f"ref_counts must be {n_bins} non-negative bin counts "
            f"(len(breakpoints) + 1), got {ref_counts!r}")
    binx = F.expr(_breakpoint_bin_expr(value_col, bks)).cast("int")
    agg_cols = [
        F.coalesce(F.sum(F.when(F.col(f"{prefix}_b") == F.lit(i), 1)
                          .otherwise(0)),
                   F.lit(0)).cast("long").alias(f"{prefix}_c{i}")
        for i in range(n_bins)]
    tr = sum(refs)
    tc = _reduce(_add, [F.col(f"{prefix}_c{i}") for i in range(n_bins)])

    def with_total(row: DataFrame) -> DataFrame:
        return row.withColumn(f"{prefix}_tc", tc)

    terms = []
    for i in range(n_bins):
        p = ((F.lit(int(refs[i])) + F.lit(1)).cast("double")
             / (F.lit(int(tr)) + F.lit(n_bins)))
        q = ((F.col(f"{prefix}_c{i}") + F.lit(1)).cast("double")
             / (F.col(f"{prefix}_tc") + F.lit(n_bins)))
        terms.append(
            F.round((p - q) * F.log(p / q) * 1_000_000, 0).cast("bigint"))
    n_rows_col = F.col(f"{prefix}_tc").cast("bigint")
    psi_col = _reduce(_add, terms).cast("bigint")
    return binx, agg_cols, with_total, n_rows_col, psi_col


def psi_against_reference_sql(cur_sel: str, value_col: str,
                              breakpoints: Sequence[int],
                              ref_counts: Sequence[int]) -> str:
    """DuckDB twin of :func:`psi_against_reference` (differential
    oracle): the reference constants are inlined as a VALUES table."""
    bks = [int(b) for b in breakpoints]
    refs = [int(c) for c in ref_counts]
    n_bins = len(bks) + 1
    vals = ", ".join(f"({i}, {c})" for i, c in enumerate(refs))
    b = _breakpoint_bin_expr(value_col, bks)
    return f"""
        WITH _par_ref(bin, n_ref) AS (VALUES {vals}),
        _par_cur AS (SELECT {b}::INT AS bin, count(*) AS _nc
                     FROM ({cur_sel}) GROUP BY 1),
        _par_counts AS (
            SELECT _par_ref.bin, n_ref, coalesce(_nc, 0) AS n_cur
            FROM _par_ref LEFT JOIN _par_cur USING (bin)),
        _par_tot AS (SELECT sum(n_ref) AS _tr, sum(n_cur) AS _tc
                     FROM _par_counts)
        SELECT sum(n_cur)::BIGINT AS n_rows,
               sum(CAST(round(((n_ref + 1)::DOUBLE / (_tr + {n_bins})
                               - (n_cur + 1)::DOUBLE / (_tc + {n_bins}))
                              * ln(((n_ref + 1)::DOUBLE / (_tr + {n_bins}))
                                   / ((n_cur + 1)::DOUBLE
                                      / (_tc + {n_bins})))
                              * 1000000, 0) AS BIGINT))::BIGINT
                   AS psi_micro
        FROM _par_counts CROSS JOIN _par_tot"""


def bin_counts(df: DataFrame, value_col: str,
               breakpoints: Sequence[int]) -> list[int]:
    """Reference bin counts under explicit edges — the second design-
    time constant a PSI monitor ships with (the first being the edges
    themselves, :func:`quantile_breakpoints`).  Bounded collect by
    contract: exactly ``len(breakpoints) + 1`` integers.  NULL values
    are excluded (the binning convention everywhere in this module)."""
    require_columns(df, [value_col])
    bks = [int(b) for b in breakpoints]
    if len(bks) < 1 or sorted(bks) != bks:
        raise ValueError(f"breakpoints must be a non-empty sorted list, "
                         f"got {breakpoints!r}")
    rows = (df.select(F.expr(_breakpoint_bin_expr(value_col, bks))
                       .cast("int").alias("bin"))
              .groupBy("bin").agg(F.count(F.lit(1)).alias("_c"))
              .collect())
    out = [0] * (len(bks) + 1)
    for r in rows:
        if r.bin is not None:
            out[r.bin] = int(r._c)
    return out


def bin_counts_sql(sel: str, value_col: str,
                   breakpoints: Sequence[int]) -> str:
    """DuckDB twin of :func:`bin_counts` (replay oracle): emits
    ``(bin, c)`` rows for the POPULATED bins (absent = 0)."""
    b = _breakpoint_bin_expr(value_col, [int(x) for x in breakpoints])
    return (f"SELECT {b}::INT AS bin, count(*) AS c FROM ({sel}) "
            f"WHERE {value_col} IS NOT NULL GROUP BY 1")
