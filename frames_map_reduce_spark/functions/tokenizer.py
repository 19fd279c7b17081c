"""Fixed-inventory subword tokenization for training-data budgets.

``token_count`` (whitespace) is the cheap budget proxy, but real
training-data budgets count TOKENIZER tokens.  This module provides a
deterministic subword encoder over the engine's shared pre-tokenization
(``functions.text.wordish_tokens`` — lowercase ``[a-z0-9]+`` runs or
single symbols, the usual BPE pre-split): each word is encoded by
GREEDY LONGEST-PREFIX MATCH against a fixed subword inventory, with
every single character an implicit fallback token so encoding never
fails.  This is the WordPiece-style greedy encode — the standard
inference-time approximation of a merge-table BPE (a trained BPE's
merge sequence reduces to a vocabulary for encoding; greedy
longest-match over it is how production tokenizers encode at serving
time) — named honestly: it does not replay a specific merge order.

Why this design and not merge-loop BPE at ENCODE time: the encode must
be EXACTLY replayable as a DuckDB oracle.  Greedy longest-match is a
left-to-right scan — one recursive CTE whose step is a closed-form CASE
expression generated from the same inventory
(``subword_step_case_sql``), so both engines execute the identical spec
and the driver can hash-compare results.  A data-dependent merge loop
has no such closed form — so TRAINING (``learn_bpe_merges``, r8) is
proven the other way: the merge sequence is a pure function of the
word-frequency dictionary (``bpe_merge_spec``), and the oracle replays
that function over the dictionary DuckDB computes from the same parquet
(the ivf-centroid replay convention).

Scale shape (Spark side): pre-tokenization is the shared regexp
expression (JVM, codegen); the per-word scan is an Arrow-batched
``mapInPandas`` stage (the one loop Spark expressions cannot express),
linear in characters, no shuffle; the per-doc counts aggregate is the
ordinary 2-phase hash agg.  The inventory ships in the task closure
(tiny, frozen).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frames_map_reduce_spark.functions import text as TX
from frames_map_reduce_spark.schema import require_columns

__all__ = ["SUBWORD_VOCAB", "encode_word_len", "subword_counts",
           "subword_counts_sql", "subword_step_case_sql",
           "encode_word_ids", "encode_ids", "encode_ids_sql",
           "token_id_step_sql", "decode_word_ids", "decode_ids",
           "token_id_decode_sql",
           "bpe_merge_spec", "learn_bpe_merges", "merges_to_inventory",
           "learn_bpe_inventory",
           "bpe_word_counts_sql", "bpe_merges_values_sql"]

#: The fixed multi-character subword inventory (lowercase; single
#: characters are implicit fallback tokens and MUST NOT be listed).
#: Frozen: changing it changes every published token count — treat like
#: a tokenizer release.  Chosen as high-frequency English morphemes +
#: function words + common digrams, the shape a small trained BPE vocab
#: converges to.
SUBWORD_VOCAB: tuple[str, ...] = (
    # 5+ chars: productive morphemes
    "ation", "ition", "ement", "iness", "ingly", "ously", "ative",
    "tional", "ability",
    # 4 chars
    "tion", "ment", "ness", "able", "ible", "ance", "ence", "ship",
    "less", "ward", "wise", "ious", "eous", "ical", "want",
    "that", "this", "with", "from", "have", "were", "ther", "here",
    "ight", "ough", "ould", "ings",
    # 3 chars
    "ing", "ion", "ity", "ive", "ous", "ful", "est", "ize", "ise",
    "the", "and", "for", "are", "not", "was", "all", "can", "had",
    "her", "his", "one", "our", "out", "has", "but", "you", "any",
    "ess", "ent", "ant", "ate", "ers", "ies", "ied", "age", "ure",
    "con", "com", "pre", "pro", "per", "sub", "dis", "mis", "non",
    "ver", "ter", "der", "ble", "ple", "ste", "ain", "ine", "ide",
    # 2 chars
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd", "ti",
    "es", "or", "te", "of", "ed", "is", "it", "al", "ar", "st", "to",
    "nt", "ng", "se", "ha", "as", "ou", "io", "le", "ve", "co", "me",
    "de", "hi", "ri", "ro", "ic", "ne", "ea", "ra", "ce", "li", "ch",
    "ll", "be", "ma", "si", "om", "ur", "un", "el", "la", "do", "so",
    "10", "20", "19", "00",
)

def _index_inventory(
        inventory: tuple[str, ...],
) -> tuple[dict[int, frozenset[str]], tuple[int, ...]]:
    """Length-indexed lookup for the greedy scan.  Validates the
    inventory contract: multi-character entries only (single chars are
    the implicit fallback), no duplicates."""
    by_len: dict[int, set[str]] = {}
    seen: set[str] = set()
    for w in inventory:
        if len(w) < 2:
            raise ValueError(
                f"inventory entry {w!r} is a single character — single "
                f"chars are the implicit fallback and must not be listed")
        if w in seen:
            raise ValueError(f"duplicate inventory entry {w!r}")
        seen.add(w)
        by_len.setdefault(len(w), set()).add(w)
    frozen = {k: frozenset(v) for k, v in by_len.items()}
    return frozen, tuple(sorted(frozen, reverse=True))


_BY_LEN, _LENS_DESC = _index_inventory(SUBWORD_VOCAB)

#: Per-task memo cap for the word-level encode caches (guide §4.5 —
#: amortize per-task work): Zipf repetition makes the DISTINCT word
#: stream far smaller than the token stream, so each Arrow task caches
#: the pure word → encode result and pays the greedy scan once per
#: type, not once per token.  The cap only guards a pathological
#: all-unique vocabulary from growing a task's memo without bound;
#: clearing it changes nothing but speed (the encode is a pure
#: function of the word).
_MEMO_CAP = 1 << 20


def encode_word_len(word: str,
                    inventory: tuple[str, ...] | None = None) -> int:
    """Number of subword tokens the greedy longest-prefix encode emits
    for ``word`` — the executable spec both engines implement.  The
    default inventory is the frozen :data:`SUBWORD_VOCAB`; pass a
    LEARNED one (:func:`merges_to_inventory`) to encode against an
    induced vocabulary.  For batch encoding, index once and reuse
    (:func:`subword_counts` does)."""
    by_len, lens_desc = ((_BY_LEN, _LENS_DESC) if inventory is None
                         else _index_inventory(inventory))
    return _encode_len(word, by_len, lens_desc)


def _encode_len(word: str, by_len: dict[int, frozenset[str]],
                lens_desc: tuple[int, ...]) -> int:
    n = len(word)
    pos = 0
    count = 0
    while pos < n:
        step = 1
        for ln in lens_desc:
            if word[pos:pos + ln] in by_len[ln]:
                step = ln
                break
        pos += step
        count += 1
    return count


def subword_counts(df: DataFrame, text_col: str, id_col: str,
                   inventory: tuple[str, ...] | None = None) -> DataFrame:
    """Per-document subword budget: ``(id_col, n_words, n_subwords)``
    over the shared wordish pre-tokenization; documents with zero
    wordish tokens are absent (the LM-scorer convention).  The scan is
    one Arrow-batched mapInPandas stage; everything before it is JVM
    regexp.

    ``inventory`` defaults to the frozen :data:`SUBWORD_VOCAB`; pass a
    LEARNED inventory (:func:`learn_bpe_inventory`) to close the
    train→apply arc: encode against the vocabulary induced from the
    corpus itself.  The inventory is indexed ONCE here and ships in the
    task closure (tiny, frozen for the job's lifetime)."""
    require_columns(df, [text_col, id_col])
    by_len, lens_desc = ((_BY_LEN, _LENS_DESC) if inventory is None
                         else _index_inventory(inventory))
    # no JVM size("_w") > 0 filter: predicate pushdown substitutes the
    # defining expression, so the wordish regex would run TWICE per
    # document (Filter + Project).  The zero-token docs are skipped
    # inside the Arrow stage instead — mapInPandas may change
    # cardinality, and the output convention (tokenless docs absent)
    # is unchanged.
    toks = df.select(F.col(id_col),
                     TX.wordish_tokens(F.col(text_col)).alias("_w"))
    id_type = toks.schema[id_col].dataType.simpleString()
    out_schema = (f"{id_col} {id_type}, n_words bigint, "
                  f"n_subwords bigint")

    def run(batches) -> Iterator:
        import pandas as pd
        memo: dict[str, int] = {}
        for pdf in batches:
            ids, nw, ns = [], [], []
            for i, words in zip(pdf[id_col], pdf["_w"]):
                if words is None or len(words) == 0:
                    continue   # tokenless docs are absent (contract)
                ids.append(i)
                nw.append(len(words))
                tot = 0
                for w in words:
                    c = memo.get(w)
                    if c is None:
                        if len(memo) >= _MEMO_CAP:
                            memo.clear()
                        c = _encode_len(w, by_len, lens_desc)
                        memo[w] = c
                    tot += c
                ns.append(tot)
            if ids:   # an all-skipped batch has no typed frame to yield
                yield pd.DataFrame({id_col: ids, "n_words": nw,
                                    "n_subwords": ns})

    return toks.mapInPandas(run, schema=out_schema)


def subword_step_case_sql(word_expr: str, pos_expr: str,
                          inventory: tuple[str, ...] | None = None) -> str:
    """The greedy step as a closed-form CASE over the inventory:
    length of the longest inventory entry matching at ``pos_expr``
    (1-indexed), else 1 — generated from the SAME inventory the Spark
    encoder uses (default: the frozen ``SUBWORD_VOCAB``), so the two
    cannot drift.  Entries are quote-escaped: the frozen vocab is
    alphanumeric, but a LEARNED inventory may merge wordish single
    symbols that include a quote."""
    by_len, lens_desc = ((_BY_LEN, _LENS_DESC) if inventory is None
                         else _index_inventory(inventory))
    if not by_len:  # empty LEARNED inventory: every char is a token
        return "1"
    arms = []
    for ln in lens_desc:
        lits = ", ".join("'" + w.replace("'", "''") + "'"
                         for w in sorted(by_len[ln]))
        arms.append(f"WHEN substr({word_expr}, {pos_expr}, {ln}) "
                    f"IN ({lits}) THEN {ln}")
    return "CASE " + " ".join(arms) + " ELSE 1 END"


def subword_counts_sql(table: str, text_col: str, id_col: str,
                       inventory: tuple[str, ...] | None = None) -> str:
    """DuckDB twin of :func:`subword_counts`: same wordish
    pre-tokenization spec, then the greedy scan as a recursive CTE —
    every word instance advances one token per iteration via the same
    generated CASE step; its terminal row (pos past the word) carries
    the token count."""
    words = (f"SELECT {id_col}, unnest(regexp_extract_all("
             f"lower({text_col}), '{TX.WORDISH}')) AS _w FROM {table}")
    step = subword_step_case_sql("_w", "_pos", inventory=inventory)
    return f"""
        WITH RECURSIVE _words AS ({words}),
        _enc({id_col}, _w, _pos, _tk) AS (
            SELECT {id_col}, _w, 1, 0 FROM _words
            UNION ALL
            SELECT {id_col}, _w, _pos + ({step}), _tk + 1
            FROM _enc WHERE _pos <= len(_w))
        SELECT {id_col},
               count(*) AS n_words,
               CAST(sum(_tk) AS BIGINT) AS n_subwords
        FROM _enc WHERE _pos > len(_w)
        GROUP BY {id_col}"""


# ---------------------------------------------------------------------------
# Token-ID emission (r9 verdict #3): the `array<int>` sequences a
# training pipeline actually ships, not just their counts
# ---------------------------------------------------------------------------
#
# The ID space is part of the tokenizer spec, frozen with the
# inventory: entry i of the inventory TUPLE (in its given order — the
# frozen SUBWORD_VOCAB's declaration order, or the sorted order
# merges_to_inventory emits) gets ID i; the single-character fallback
# for codepoint c gets ID len(inventory) + c.  Total-ordered, no
# collisions, and both halves are computable in closed form by either
# engine — no side lookup table ships with the data.

def _id_index(inventory: tuple[str, ...] | None):
    inv = SUBWORD_VOCAB if inventory is None else tuple(inventory)
    by_len, lens_desc = ((_BY_LEN, _LENS_DESC) if inventory is None
                         else _index_inventory(inv))
    return inv, {w: i for i, w in enumerate(inv)}, by_len, lens_desc


def encode_word_ids(word: str,
                    inventory: tuple[str, ...] | None = None) -> list[int]:
    """The token-ID sequence the greedy longest-prefix encode emits for
    ``word`` — the executable spec of the ID space (module section
    comment above).  ``len(encode_word_ids(w)) == encode_word_len(w)``
    by construction."""
    inv, id_of, by_len, lens_desc = _id_index(inventory)
    return _encode_ids(word, id_of, len(inv), by_len, lens_desc)


def _encode_ids(word: str, id_of: dict[str, int], n_inv: int,
                by_len: dict[int, frozenset[str]],
                lens_desc: tuple[int, ...]) -> list[int]:
    n = len(word)
    pos = 0
    out: list[int] = []
    while pos < n:
        step = 1
        tid = -1
        for ln in lens_desc:
            sw = word[pos:pos + ln]
            if sw in by_len[ln]:
                step, tid = ln, id_of[sw]
                break
        if tid < 0:
            tid = n_inv + ord(word[pos])
        out.append(tid)
        pos += step
    return out


def encode_ids(df: DataFrame, text_col: str, id_col: str,
               inventory: tuple[str, ...] | None = None) -> DataFrame:
    """Per-document token-ID emission: ``(id_col, token_ids)`` with
    ``token_ids: array<int>`` — the greedy subword IDs of every wordish
    token in document order, concatenated.  The model-ready form of
    :func:`subword_counts` (which emits only the budget); documents
    with zero wordish tokens are absent (same convention).

    Scale shape: identical to the count form — JVM regexp
    pre-tokenization, then ONE Arrow-batched mapInPandas scan, linear
    in characters, no shuffle; output volume is the token stream itself
    (the irreducible cost of emitting it).  The inventory and its ID
    index ship once in the task closure."""
    require_columns(df, [text_col, id_col])
    inv, id_of, by_len, lens_desc = _id_index(inventory)
    n_inv = len(inv)
    # no JVM size filter — regex would run twice (see subword_counts);
    # zero-token docs are skipped inside the Arrow stage instead
    toks = df.select(F.col(id_col),
                     TX.wordish_tokens(F.col(text_col)).alias("_w"))
    id_type = toks.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, token_ids array<int>"

    def run(batches) -> Iterator:
        import pandas as pd
        memo: dict[str, list[int]] = {}
        for pdf in batches:
            ids, seqs = [], []
            for i, words in zip(pdf[id_col], pdf["_w"]):
                if words is None or len(words) == 0:
                    continue   # tokenless docs are absent (contract)
                ids.append(i)
                flat: list[int] = []
                for w in words:
                    wi = memo.get(w)
                    if wi is None:
                        if len(memo) >= _MEMO_CAP:
                            memo.clear()
                        wi = _encode_ids(w, id_of, n_inv,
                                         by_len, lens_desc)
                        memo[w] = wi
                    flat.extend(wi)
                seqs.append(flat)
            if ids:   # an all-skipped batch has no typed frame to yield
                yield pd.DataFrame({id_col: ids, "token_ids": seqs})

    return toks.mapInPandas(run, schema=out_schema)


def decode_ids(df: DataFrame, ids_col: str, id_col: str,
               inventory: tuple[str, ...] | None = None,
               out_col: str = "decoded") -> DataFrame:
    """Distributed inverse of :func:`encode_ids`: ``(id_col, out_col)``
    with ``out_col`` the concatenated subword strings the document's
    IDs name — by the losslessness law (:func:`decode_word_ids`) that
    is EXACTLY the document's wordish-token stream joined with no
    separator, so ``decode_ids(encode_ids(df))`` reproduces
    ``concat(wordish_tokens(text))`` verbatim (the registry row
    token_ids_roundtrip hash-proves this cross-engine against the
    stream computed directly from the raw text).

    Scale shape: ONE Arrow-batched mapInPandas scan, linear in tokens,
    no shuffle; the inventory ships once in the task closure (the
    :func:`encode_ids` shape, inverted).  Raises on IDs outside the
    space — a decode must never silently drop or alias tokens."""
    require_columns(df, [ids_col, id_col])
    inv, _id_of, _by_len, _lens = _id_index(inventory)
    n_inv = len(inv)
    src = df.select(id_col, ids_col)
    id_type = src.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, {out_col} string"

    def run(batches) -> Iterator:
        import pandas as pd
        for pdf in batches:
            ids, texts = [], []
            for i, seq in zip(pdf[id_col], pdf[ids_col]):
                # encode_ids never emits NULL cells, but decode_ids
                # accepts arbitrary frames (r11 ADVICE): a NULL arrives
                # here as None/NaN and must die with a NAMED error, not
                # an opaque "'NoneType' is not iterable" from the worker
                # (non-NULL cells arrive as list/ndarray — sized; a NULL
                # is None or a float NaN scalar, both unsized)
                if seq is None or not hasattr(seq, "__len__"):
                    raise ValueError(
                        f"decode_ids: NULL {ids_col} for {id_col}={i!r}"
                        " — a decode must never silently drop documents;"
                        " filter NULL sequences upstream")
                parts: list[str] = []
                for tid in seq:
                    tid = int(tid)
                    if 0 <= tid < n_inv:
                        parts.append(inv[tid])
                    elif n_inv <= tid <= n_inv + 0x10FFFF:
                        parts.append(chr(tid - n_inv))
                    else:
                        raise ValueError(
                            f"token id {tid} outside the ID space "
                            f"(inventory size {n_inv})")
                ids.append(i)
                texts.append("".join(parts))
            yield pd.DataFrame({id_col: ids, out_col: texts})

    return src.mapInPandas(run, schema=out_schema)


def decode_word_ids(ids, inventory: tuple[str, ...] | None = None) -> str:
    """Invert :func:`encode_word_ids`: the subword string each ID names,
    concatenated — ``decode_word_ids(encode_word_ids(w)) == w`` for
    every word, the losslessness law of the ID space (greedy encoding
    partitions the word into inventory entries and single chars; IDs
    name them bijectively, so the word reassembles exactly).  Raises on
    an ID outside the space (< 0, or a codepoint past the Unicode
    range)."""
    inv, _id_of, _by_len, _lens = _id_index(inventory)
    n = len(inv)
    out: list[str] = []
    for tid in ids:
        if 0 <= tid < n:
            out.append(inv[tid])
        elif n <= tid <= n + 0x10FFFF:
            out.append(chr(tid - n))
        else:
            raise ValueError(f"token id {tid} outside the ID space "
                             f"(inventory size {n})")
    return "".join(out)


def token_id_decode_sql(id_expr: str,
                        inventory: tuple[str, ...] | None = None) -> str:
    """DuckDB twin of the per-ID half of :func:`decode_word_ids`: the
    subword string for one ID — a CASE over the inventory tuple, else
    ``chr(id - len(inventory))`` (DuckDB's chr is codepoint-correct,
    unlike Spark SQL's mod-256 ``char``, which is why the Spark-side
    decode lives in Python, not an expression)."""
    inv, _id_of, by_len, _lens = _id_index(inventory)
    fallback = f"chr(CAST({id_expr} - {len(inv)} AS INTEGER))"
    if not by_len:
        return fallback
    arms = " ".join(
        f"WHEN {id_expr} = {i} THEN '" + w.replace("'", "''") + "'"
        for i, w in enumerate(inv))
    return f"CASE {arms} ELSE {fallback} END"


def token_id_step_sql(word_expr: str, pos_expr: str,
                      inventory: tuple[str, ...] | None = None) -> str:
    """The matched token's ID at ``pos_expr`` as a closed-form CASE —
    the ID-emitting companion of :func:`subword_step_case_sql`: one arm
    per inventory entry (longest lengths first, mirroring the greedy
    scan), falling back to ``len(inventory) + unicode(char)``.
    Generated from the SAME inventory tuple the Spark encoder indexes,
    so the ID spaces cannot drift."""
    inv, id_of, by_len, lens_desc = _id_index(inventory)
    fallback = (f"{len(inv)} + unicode(substr({word_expr}, {pos_expr}, 1))")
    if not by_len:
        return fallback
    arms = []
    for ln in lens_desc:
        for w in sorted(by_len[ln]):
            lit = "'" + w.replace("'", "''") + "'"
            arms.append(f"WHEN substr({word_expr}, {pos_expr}, {ln}) "
                        f"= {lit} THEN {id_of[w]}")
    return ("CASE " + " ".join(arms)
            + f" ELSE {fallback} END")


def encode_ids_sql(table: str, text_col: str, id_col: str,
                   inventory: tuple[str, ...] | None = None) -> str:
    """DuckDB twin of :func:`encode_ids`: the same recursive-CTE greedy
    scan as :func:`subword_counts_sql`, accumulating the matched IDs
    instead of the count.  Word order is preserved through the indexed
    list_transform (DuckDB has no WITH ORDINALITY) and the final
    ``flatten(list(… ORDER BY _wi))`` — document order is part of the
    spec, token streams are sequences, not bags."""
    words = (f"SELECT {id_col}, _u.x AS _w, _u.i AS _wi FROM "
             f"(SELECT {id_col}, unnest(list_transform("
             f"regexp_extract_all(lower({text_col}), '{TX.WORDISH}'), "
             f"(x, i) -> {{'x': x, 'i': i}})) AS _u FROM {table})")
    step = subword_step_case_sql("_w", "_pos", inventory=inventory)
    tid = token_id_step_sql("_w", "_pos", inventory=inventory)
    return f"""
        WITH RECURSIVE _words AS ({words}),
        _enc({id_col}, _wi, _w, _pos, _ids) AS (
            SELECT {id_col}, _wi, _w, 1, CAST([] AS INTEGER[])
            FROM _words
            UNION ALL
            SELECT {id_col}, _wi, _w, _pos + ({step}),
                   list_append(_ids, CAST(({tid}) AS INTEGER))
            FROM _enc WHERE _pos <= len(_w))
        SELECT {id_col}, flatten(list(_ids ORDER BY _wi)) AS token_ids
        FROM _enc WHERE _pos > len(_w)
        GROUP BY {id_col}"""


# ---------------------------------------------------------------------------
# BPE vocabulary induction (the TRAIN half; the greedy encode above is
# the APPLY half)
# ---------------------------------------------------------------------------

def bpe_merge_spec(word_counts, n_merges: int):
    """The executable BPE-training spec (Sennrich et al., ACL 2016,
    arXiv:1508.07909 — learn merges over a WORD-FREQUENCY DICTIONARY,
    not the raw token stream): starting from single characters, repeat
    ``n_merges`` times — count adjacent symbol pairs weighted by word
    frequency, merge the most frequent pair (ties broken by the
    lexicographically SMALLEST (left, right), so the result is a pure
    function of the dictionary), stop early when no pair occurs twice.

    Pure Python over the BOUNDED dictionary — deterministic by
    construction, shared verbatim by the Spark operator and the oracle
    generator (the ivf-centroid replay convention).  Returns
    ``[(rank, left, right, pair_count), …]``."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    seqs: list[tuple[list[str], int]] = [
        (list(w), int(c)) for w, c in word_counts if w]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(int(n_merges)):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in seqs:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        if cnt < 2:
            break
        merges.append((rank, left, right, cnt))
        joined = left + right
        for syms, _ in seqs:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == left and syms[i + 1] == right:
                    syms[i:i + 2] = [joined]
                else:
                    i += 1
    return merges


def learn_bpe_merges(df: DataFrame, text_col: str,
                     n_merges: int = 48,
                     max_words: int = 50_000) -> DataFrame:
    """Train a BPE merge table ON the corpus — the induction step the
    fixed :data:`SUBWORD_VOCAB` stands in for at apply time.  Returns
    ``(merge_rank, left, right, merged, pair_count)``, one row per
    learned merge in order.

    Scale shape — the 100 TB part is the CORPUS SCAN, and only that
    part is distributed: one wordish pre-tokenization + explode + 2-
    phase count gives the word-frequency dictionary; the top
    ``max_words`` cut (count DESC, word ASC — a total order, so the cap
    is deterministic cross-engine) lowers to TakeOrderedAndProject
    (per-partition partial top-k, never a global single-task sort).
    The merge loop then runs driver-side over the ≤``max_words``-row
    dictionary — the standard BPE-training shape (production trainers
    iterate a counts dict, not the stream; arXiv:1508.07909 §3.2), and
    a bounded collect by contract, not an unbounded one.

    Cross-engine proof: training is data-dependent, so the DuckDB twin
    is generated by REPLAYING :func:`bpe_merge_spec` over the same
    dictionary computed by DuckDB from the same parquet (the
    ivf-centroid replay convention) — hash equality proves both the
    distributed dictionary and the merge sequence."""
    merges = _learn_merges(df, text_col, n_merges, max_words)
    spark = df.sparkSession
    schema = ("merge_rank bigint, left string, right string, "
              "merged string, pair_count bigint")
    data = [(rk, lt, rt, lt + rt, ct) for rk, lt, rt, ct in merges]
    return spark.createDataFrame(data, schema)


def _learn_merges(df: DataFrame, text_col: str, n_merges: int,
                  max_words: int) -> list[tuple[int, str, str, int]]:
    """Shared train internals: distributed dictionary (explode +
    2-phase count + deterministic TakeOrderedAndProject cap), then the
    merge spec over the bounded collect."""
    require_columns(df, [text_col])
    if max_words < 1:
        raise ValueError(f"max_words must be >= 1, got {max_words}")
    counts = (df.select(F.explode(TX.wordish_tokens(F.col(text_col)))
                         .alias("_w"))
                .groupBy("_w").agg(F.count(F.lit(1)).alias("_c"))
                .orderBy(F.col("_c").desc(), F.col("_w"))
                .limit(int(max_words)))
    rows = [(r["_w"], r["_c"]) for r in counts.collect()]
    return bpe_merge_spec(rows, n_merges)


def merges_to_inventory(merges) -> tuple[str, ...]:
    """The greedy-encode inventory a learned merge table induces: the
    set of merged symbols.  A trained BPE's merge sequence reduces to a
    vocabulary for encoding (the module docstring's serving-time
    convention); greedy longest-prefix match depends only on the SET of
    entries, so order is dropped — the tuple is sorted for determinism.
    Deduped (the same merged STRING can arise from different pairs,
    e.g. ('a','bc') and ('ab','c')); every merge of wordish symbols is
    ≥2 chars, satisfying the inventory contract by construction."""
    out: list[str] = []
    seen: set[str] = set()
    for rk, lt, rt, _ct in merges:
        m = lt + rt
        if m not in seen:
            seen.add(m)
            out.append(m)
    return tuple(sorted(out))


def learn_bpe_inventory(df: DataFrame, text_col: str,
                        n_merges: int = 48,
                        max_words: int = 50_000) -> tuple[str, ...]:
    """Train → inventory in one call: :func:`learn_bpe_merges`'
    induction reduced to the greedy-encode vocabulary — feed it to
    :func:`subword_counts`'s ``inventory=`` to encode the corpus with
    the vocabulary induced FROM the corpus (the train→apply arc)."""
    return merges_to_inventory(_learn_merges(df, text_col,
                                             n_merges, max_words))


def bpe_word_counts_sql(table: str, text_col: str,
                        max_words: int = 50_000) -> str:
    """DuckDB twin of the dictionary stage of :func:`learn_bpe_merges`
    (same wordish spec, same deterministic cap order) — the oracle
    generator runs this, feeds the rows to :func:`bpe_merge_spec`, and
    emits the merges as a VALUES literal."""
    return (f"SELECT _w, count(*) AS _c FROM "
            f"(SELECT unnest(regexp_extract_all(lower({text_col}), "
            f"'{TX.WORDISH}')) AS _w FROM {table}) "
            f"GROUP BY _w ORDER BY _c DESC, _w LIMIT {int(max_words)}")


def bpe_merges_values_sql(merges) -> str:
    """Render replayed merges as a standalone DuckDB SELECT with the
    exact output schema of :func:`learn_bpe_merges`."""
    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"
    if not merges:
        return ('SELECT CAST(NULL AS BIGINT) AS merge_rank, '
                'CAST(NULL AS VARCHAR) AS "left", '
                'CAST(NULL AS VARCHAR) AS "right", '
                'CAST(NULL AS VARCHAR) AS merged, '
                'CAST(NULL AS BIGINT) AS pair_count WHERE FALSE')
    vals = ", ".join(
        f"({rk}, {q(lt)}, {q(rt)}, {q(lt + rt)}, {ct})"
        for rk, lt, rt, ct in merges)
    # "left"/"right" are reserved words in DuckDB — quoted throughout
    return (f'SELECT CAST(merge_rank AS BIGINT) AS merge_rank, "left", '
            f'"right", merged, CAST(pair_count AS BIGINT) AS pair_count '
            f'FROM (VALUES {vals}) AS '
            f't(merge_rank, "left", "right", merged, pair_count)')


# ---------------------------------------------------------------------------
# Tokenizer OOV / drift monitor (r12 verdict #6): when to retrain BPE
# ---------------------------------------------------------------------------

def _encode_len_fb(word: str, by_len: dict[int, frozenset[str]],
                   lens_desc: tuple[int, ...]) -> tuple[int, int]:
    """(n_tokens, n_fallback) of the greedy encode — a step is a
    FALLBACK iff NO inventory entry matched at the position (the
    inventory contract bars single-char entries, so fallbacks are
    exactly the single-char steps): the steps that take the
    ``len(inventory) + codepoint`` ID path."""
    n = len(word)
    pos = 0
    count = 0
    fb = 0
    while pos < n:
        step = 1
        matched = False
        for ln in lens_desc:
            if word[pos:pos + ln] in by_len[ln]:
                step = ln
                matched = True
                break
        if not matched:
            fb += 1
        pos += step
        count += 1
    return count, fb


def _fallback_case_sql(word_expr: str, pos_expr: str,
                       inventory: tuple[str, ...] | None = None) -> str:
    """The fallback indicator as a closed-form CASE (0 when any
    inventory entry matches at the position, else 1) — generated from
    the SAME inventory as :func:`subword_step_case_sql`, so the two
    scans cannot drift."""
    by_len, lens_desc = ((_BY_LEN, _LENS_DESC) if inventory is None
                         else _index_inventory(inventory))
    if not by_len:
        return "1"
    arms = []
    for ln in lens_desc:
        lits = ", ".join("'" + w.replace("'", "''") + "'"
                         for w in sorted(by_len[ln]))
        arms.append(f"WHEN substr({word_expr}, {pos_expr}, {ln}) "
                    f"IN ({lits}) THEN 0")
    return "CASE " + " ".join(arms) + " ELSE 1 END"


def tokenizer_oov_stats(df: DataFrame, text_col: str,
                        inventory: tuple[str, ...] | None = None,
                        max_fallback_milli: int = 100) -> DataFrame:
    """Vocabulary-drift monitor for a FROZEN tokenizer inventory — the
    ``ivf_drift_stats`` convention applied to BPE (r12 verdict #6):
    one row of exact-integer corpus accounting telling the caller when
    the inventory stopped fitting the data and BPE should retrain —

    - ``n_docs`` (with ≥1 wordish token — the LM-scorer convention),
      ``n_words``, ``n_subwords``, ``n_fallback`` (emitted tokens that
      took the single-char fallback ID path), ``n_chars``;
    - ``fallback_per_milli`` = ``n_fallback·1000 div n_subwords`` —
      the share of the emitted token stream the inventory could not
      cover (each fallback is one ID of the
      ``len(inventory) + codepoint`` space);
    - ``covered_char_per_milli`` = ``(n_chars − n_fallback)·1000 div
      n_chars`` — encodable character mass (every fallback consumes
      exactly one character);
    - ``needs_retrain`` = ``fallback_per_milli > max_fallback_milli``
      (FALSE on an empty corpus) — an engine-stable integer compare.

    All divisions are single cross-multiplied integer ``div``s —
    bit-identical cross-engine (the drift-monitor discipline).  One
    Arrow scan + one 1-row aggregation; the inventory ships in the
    task closure."""
    from collections.abc import Iterator as _It  # noqa: F401

    require_columns(df, [text_col])
    if max_fallback_milli < 0:
        raise ValueError(
            f"max_fallback_milli must be >= 0, got {max_fallback_milli}")
    by_len, lens_desc = ((_BY_LEN, _LENS_DESC) if inventory is None
                         else _index_inventory(inventory))
    # no JVM size filter — regex would run twice (see subword_counts);
    # zero-token docs are skipped inside the Arrow stage instead
    toks = df.select(TX.wordish_tokens(F.col(text_col)).alias("_w"))

    def run(batches) -> Iterator:
        import pandas as pd
        memo: dict[str, tuple[int, int]] = {}
        for pdf in batches:
            nw, ns, nf, nc = [], [], [], []
            for words in pdf["_w"]:
                if words is None or len(words) == 0:
                    continue   # tokenless docs are absent (contract)
                w_ns = w_nf = w_nc = 0
                for w in words:
                    tf = memo.get(w)
                    if tf is None:
                        if len(memo) >= _MEMO_CAP:
                            memo.clear()
                        tf = _encode_len_fb(w, by_len, lens_desc)
                        memo[w] = tf
                    t, f = tf
                    w_ns += t
                    w_nf += f
                    w_nc += len(w)
                nw.append(len(words))
                ns.append(w_ns)
                nf.append(w_nf)
                nc.append(w_nc)
            if nw:   # an all-skipped batch has no typed frame to yield
                yield pd.DataFrame({"_nw": nw, "_ns": ns, "_nf": nf,
                                    "_nc": nc})

    per_doc = toks.mapInPandas(
        run, schema="_nw bigint, _ns bigint, _nf bigint, _nc bigint")
    agg = per_doc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.coalesce(F.sum("_nw"), F.lit(0)).cast("bigint")
         .alias("n_words"),
        F.coalesce(F.sum("_ns"), F.lit(0)).cast("bigint")
         .alias("n_subwords"),
        F.coalesce(F.sum("_nf"), F.lit(0)).cast("bigint")
         .alias("n_fallback"),
        F.coalesce(F.sum("_nc"), F.lit(0)).cast("bigint")
         .alias("n_chars"))
    return agg.select(
        "*",
        F.when(F.col("n_subwords") > 0,
               F.expr("n_fallback * 1000 div n_subwords"))
         .cast("bigint").alias("fallback_per_milli"),
        F.when(F.col("n_chars") > 0,
               F.expr("(n_chars - n_fallback) * 1000 div n_chars"))
         .cast("bigint").alias("covered_char_per_milli")) \
        .withColumn(
            "needs_retrain",
            F.coalesce(F.col("fallback_per_milli")
                       > F.lit(int(max_fallback_milli)), F.lit(False)))


def tokenizer_oov_stats_sql(table: str, text_col: str, id_col: str,
                            inventory: tuple[str, ...] | None = None,
                            max_fallback_milli: int = 100) -> str:
    """DuckDB twin of :func:`tokenizer_oov_stats`: the same wordish
    pre-tokenization, the greedy scan as a recursive CTE threading the
    token AND fallback counters via the paired generated CASEs, then
    the identical cross-multiplied integer accounting.  ``id_col``
    names a unique row key (views lack rowid) for the doc count."""
    words = (f"SELECT {id_col} AS _d, unnest(regexp_extract_all("
             f"lower({text_col}), '{TX.WORDISH}')) AS _w FROM {table}")
    step = subword_step_case_sql("_w", "_pos", inventory=inventory)
    fb = _fallback_case_sql("_w", "_pos", inventory=inventory)
    return f"""
        WITH RECURSIVE _words AS ({words}),
        _enc(_d, _w, _pos, _tk, _fb) AS (
            SELECT _d, _w, 1, 0, 0 FROM _words
            UNION ALL
            SELECT _d, _w, _pos + ({step}), _tk + 1, _fb + ({fb})
            FROM _enc WHERE _pos <= len(_w)),
        _sums AS (
            SELECT CAST(count(DISTINCT _d) AS BIGINT) AS n_docs,
                   CAST(count(*) AS BIGINT) AS n_words,
                   CAST(coalesce(sum(_tk), 0) AS BIGINT) AS n_subwords,
                   CAST(coalesce(sum(_fb), 0) AS BIGINT) AS n_fallback,
                   CAST(coalesce(sum(len(_w)), 0) AS BIGINT) AS n_chars
            FROM _enc WHERE _pos > len(_w))
        SELECT n_docs, n_words, n_subwords, n_fallback, n_chars,
               CASE WHEN n_subwords > 0 THEN
                    CAST(n_fallback * 1000 // n_subwords AS BIGINT)
               END AS fallback_per_milli,
               CASE WHEN n_chars > 0 THEN
                    CAST((n_chars - n_fallback) * 1000 // n_chars
                         AS BIGINT)
               END AS covered_char_per_milli,
               coalesce(CASE WHEN n_subwords > 0 THEN
                    n_fallback * 1000 // n_subwords
                    > {int(max_fallback_milli)} END, FALSE)
                   AS needs_retrain
        FROM _sums"""
