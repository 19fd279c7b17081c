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

Why this design and not merge-loop BPE: the encode must be EXACTLY
replayable as a DuckDB oracle.  Greedy longest-match is a left-to-right
scan — one recursive CTE whose step is a closed-form CASE expression
generated from the same inventory (``subword_step_case_sql``), so both
engines execute the identical spec and the driver can hash-compare
results.  A data-dependent merge loop has no such closed form.

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
           "subword_counts_sql", "subword_step_case_sql"]

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

_BY_LEN: dict[int, frozenset[str]] = {}
for _w in SUBWORD_VOCAB:
    _BY_LEN.setdefault(len(_w), set()).add(_w)  # type: ignore[arg-type]
_BY_LEN = {k: frozenset(v) for k, v in _BY_LEN.items()}
_LENS_DESC: tuple[int, ...] = tuple(sorted(_BY_LEN, reverse=True))
assert 1 not in _BY_LEN, "single chars are the implicit fallback"
assert len(set(SUBWORD_VOCAB)) == len(SUBWORD_VOCAB), "duplicate entry"


def encode_word_len(word: str) -> int:
    """Number of subword tokens the greedy longest-prefix encode emits
    for ``word`` — the executable spec both engines implement."""
    n = len(word)
    pos = 0
    count = 0
    while pos < n:
        step = 1
        for ln in _LENS_DESC:
            if word[pos:pos + ln] in _BY_LEN[ln]:
                step = ln
                break
        pos += step
        count += 1
    return count


def subword_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document subword budget: ``(id_col, n_words, n_subwords)``
    over the shared wordish pre-tokenization; documents with zero
    wordish tokens are absent (the LM-scorer convention).  The scan is
    one Arrow-batched mapInPandas stage; everything before it is JVM
    regexp."""
    require_columns(df, [text_col, id_col])
    toks = (df.select(F.col(id_col),
                      TX.wordish_tokens(F.col(text_col)).alias("_w"))
              .filter(F.size("_w") > 0))
    id_type = toks.schema[id_col].dataType.simpleString()
    out_schema = (f"{id_col} {id_type}, n_words bigint, "
                  f"n_subwords bigint")

    def run(batches) -> Iterator:
        import pandas as pd
        for pdf in batches:
            ids, nw, ns = [], [], []
            for i, words in zip(pdf[id_col], pdf["_w"]):
                ids.append(i)
                nw.append(len(words))
                ns.append(sum(encode_word_len(w) for w in words))
            yield pd.DataFrame({id_col: ids, "n_words": nw,
                                "n_subwords": ns})

    return toks.mapInPandas(run, schema=out_schema)


def subword_step_case_sql(word_expr: str, pos_expr: str) -> str:
    """The greedy step as a closed-form CASE over the frozen inventory:
    length of the longest inventory entry matching at ``pos_expr``
    (1-indexed), else 1 — generated from the SAME ``SUBWORD_VOCAB`` the
    Spark encoder uses, so the two cannot drift."""
    arms = []
    for ln in _LENS_DESC:
        lits = ", ".join(f"'{w}'" for w in sorted(_BY_LEN[ln]))
        arms.append(f"WHEN substr({word_expr}, {pos_expr}, {ln}) "
                    f"IN ({lits}) THEN {ln}")
    return "CASE " + " ".join(arms) + " ELSE 1 END"


def subword_counts_sql(table: str, text_col: str, id_col: str) -> str:
    """DuckDB twin of :func:`subword_counts`: same wordish
    pre-tokenization spec, then the greedy scan as a recursive CTE —
    every word instance advances one token per iteration via the same
    generated CASE step; its terminal row (pos past the word) carries
    the token count."""
    words = (f"SELECT {id_col}, unnest(regexp_extract_all("
             f"lower({text_col}), '{TX.WORDISH}')) AS _w FROM {table}")
    step = subword_step_case_sql("_w", "_pos")
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
