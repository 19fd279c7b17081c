"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H-Q1-like over the engine's
map-reduce API) at sf0.001.  ``queries()`` exposes one entry per
implemented operator family from SURVEY.md §2 (+ the mandated scale
extensions); ``oracle_sql()`` gives the DuckDB twin for each
SQL-expressible one.

The per-query rigs, their helpers, and the oracle dict live in
``query_rigs.py`` (split r13 — this file was 6.5k LoC and growing);
everything there is re-exported here so existing imports
(``__spark_entry__.q_*`` etc.) keep working.  THIS file owns only the
contract surface: ``entry`` / ``queries`` / ``oracle_sql`` and the
driver proof-window rotation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import query_rigs as _rigs
from query_rigs import *  # noqa: F401,F403 — rig surface re-export

# tests and tools reach rig-internal helpers through this module
# (e.g. _sketch_distinct_full, _SKETCH_RSD); re-export private names too
_g = globals()
for _n in dir(_rigs):
    if _n.startswith("_") and not _n.startswith("__") and _n not in _g:
        _g[_n] = getattr(_rigs, _n)
del _g, _n


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _rigs.q_tpch_q1(spark, "/root/testdata/sf0.001")



#: Round-12 driver window (r11 verdict #2: ingest CORRECTNESS_r11 into
#: PROVENANCE.json, then rotate to the r8-stale remainder + the
#: r9-stale set).  Composition, in priority order:
#: (1) the THREE r8-stale rows — pack_shards, unpivot, pack_sequences —
#:     the head of the rotation queue (every other registry query's
#:     latest proof is r9+, and nothing is never-proven);
#: (2) the NINE r12 debuts: image_near_dup (perceptual aHash + banded
#:     Hamming over real pixel decode — dedup × multimodal, r11 verdict
#:     #4), ann_ivf_extend (the IVF build→extend→probe lifecycle,
#:     oracled as a rebuild replay, r11 verdict #7), ivf_drift (the
#:     retrain trigger closing that arc, full SQL twin),
#:     video_near_dup (the aHash family lifted to MJPEG frames —
#:     per-frame decode digest + matched-frame census, full truth-table
#:     oracle), and audio_near_dup (energy-plane aHash over WAV —
#:     cross-codec PCM16/G.711 duplicate detection, full truth-table
#:     oracle: the perceptual-dedup family now covers text, image,
#:     video, AND audio), and contamination_firewall (the persisted
#:     build→extend→probe decontamination index — the firewall
#:     lifecycle applied to benchmark n-gram screening, oracled by the
#:     recompute-from-scratch union audit via the extend≡rebuild law)
#:     plus decontaminate_corpus (the removal half of that arc:
#:     probe → anti-join → per-source yield, conditional-sum oracle)
#:     and stream_decontaminate (the gate's streaming twin: per-batch
#:     probe via foreachBatch, probe≡recompute LEFT-join oracle), and
#:     token_budget_sample (token-budgeted source mixing — the
#:     deterministic-shuffle-order prefix cut sized in tokens, serial
#:     window twin);
#: (2b) quality_dashboard RE-PROOF: its r11 proof predates the alert
#:     columns added this round (r11 verdict #6) — a schema change
#:     voids the old proof, so it re-enters the window like a debut;
#: (3) 37 of the 48 r9-stale queries.  The ELEVEN displaced to the r13
#:     queue — fold_all, ann_bruteforce_joined, bpe_train,
#:     stream_hourly, sql_revenue, running_total, corpus_report,
#:     stream_ingest_gate, bpe_token_count, bloom_gen_stats,
#:     shuffle_pos — are no-regression re-proofs whose module
#:     paths stay covered inside this window (fold_all_numeric +
#:     fold_all_monoid for the foldAll family; ann_srp + the IVF rows
#:     for ANN scoring; bpe_train_encode strictly composes bpe_train;
#:     stream_sessions/stream_stateful/stream_join for the streaming
#:     fold vocabulary; sql_revenue's _SQL_REVENUE text is shared
#:     verbatim with its oracle; running_total's cumulative window
#:     shape is covered by funnel/sessionize, both proven r10+;
#:     corpus_report composes the shared text specs that text_quality/
#:     quality_score/length_histogram prove independently;
#:     stream_ingest_gate's screen set is a strict subset of
#:     stream_ingest_gate_v2's, in-window; bpe_token_count's greedy
#:     encode path is strictly composed by bpe_train_encode, in-window;
#:     bloom_gen_stats' monitor is replayed verbatim inside
#:     bloom_compact_roundtrip's before-read — same %8 build/extend
#:     splits, same max_read_amp=2 policy read, in-window; shuffle_pos'
#:     hash_unit + contiguous-bucket-offset machinery is exercised
#:     verbatim by the token_budget_sample debut, in-window); debuts
#:     and schema re-proofs outrank no-regression fills (the standing
#:     r10 rule).
#: Every below-window row is still re-proven at sf0.001 by the local
#: parity suite on every pytest run.
_R12_WINDOW = [
    # (1) r8-stale head of queue
    "pack_shards", "unpivot", "pack_sequences",
    # (2) r12 debuts + the alert-schema re-proof
    "image_near_dup", "ann_ivf_extend", "ivf_drift", "video_near_dup",
    "audio_near_dup", "contamination_firewall", "decontaminate_corpus",
    "stream_decontaminate", "token_budget_sample", "quality_dashboard",
    # (3) the r9-stale set (37 of 48)
    "length_histogram", "asof_sliced", "zorder_extents",
    "curate_corpus_v2", "events_json", "weighted_mean",
    "fold_all_numeric", "good_rows", "null_propagating",
    "combine_key_maps", "rollup_revenue", "split_on_data",
    "assign_keys_and_data", "fold_all_monoid", "pandas_fold",
    "frame_concat", "to_frame", "read_csv_permissive", "stream_join",
    "stream_enrich", "stream_dedup", "media_features", "ann_srp",
    "sketch_distinct", "chunk_dedup", "retention",
    "dup_spans", "sketch_quantiles", "weighted_sample",
    "leakage_safe_split", "stream_sessions", "stream_stateful",
    "bpe_train_encode", "dsir_select", "ingest_gate",
    "bloom_compact_roundtrip",
    "stream_ingest_gate_v2",
]



def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Query registry.

    ORDER MATTERS: the driver's correctness harness checks the FIRST 50
    entries only, so proof rotates round-over-round.  PROVENANCE.json
    (regenerated by ``python tools/provenance.py``) is the
    machine-readable query → last-driver-proven-round ledger; the
    window is ``_R12_WINDOW`` above (chosen from that ledger, rationale
    in its comment), applied as a reordering of the stable base dict
    in query_rigs — below-window entries keep their relative order,
    which is the next round's rotation queue."""
    base = _rigs._queries_base()
    window = {k: base[k] for k in _R12_WINDOW}
    assert len(window) == 50, f"window must be exactly 50, got {len(window)}"
    return {**window, **{k: v for k, v in base.items() if k not in window}}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin per SQL-expressible registry query (query_rigs owns
    the dict; this delegation keeps the contract surface here)."""
    return _rigs.oracle_sql()
