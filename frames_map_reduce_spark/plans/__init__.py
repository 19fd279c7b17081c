"""Plan inspection & assertion utilities.

The reference gets its performance properties by construction (fold
fusion, early projection — SURVEY §4); this engine gets them from
Catalyst.  These helpers make those properties *checkable*: tests assert
that a plan pushes filters into the scan, prunes columns, broadcasts the
small side, and aggregates in two phases — so a regression in plan shape
fails CI instead of surfacing as a 100× slowdown at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    """The formatted physical plan as a string (what ``.explain('formatted')``
    prints)."""
    jdf = df._jdf
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        jdf.queryExecution(), "formatted")


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """The filter predicates that reached the data source scan."""
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_formatted(df)):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def partition_filters(df: DataFrame) -> list[str]:
    """Predicates applied at the partition-directory level (partition
    pruning): a filter on a partition column must show up here — meaning
    unmatched directories are never listed, let alone read — rather than
    as a post-scan row filter."""
    out = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", explain_formatted(df)):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def read_schemas(df: DataFrame) -> list[list[str]]:
    """Column lists actually read from each scan (column pruning check)."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", explain_formatted(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def _count_nodes(df: DataFrame, name: str) -> int:
    # count the numbered detail sections "(N) <Op>" — the tree summary at
    # the top would double-count every operator
    return len(re.findall(rf"^\(\d+\) {name}\b", explain_formatted(df),
                          flags=re.MULTILINE))


def count_hash_aggregates(df: DataFrame) -> int:
    """2 per groupBy = partial (map-side) + final — the distributed form of
    the reference's one-pass fold."""
    return _count_nodes(df, "HashAggregate") + _count_nodes(df, "ObjectHashAggregate")


def count_exchanges(df: DataFrame) -> int:
    """Shuffle count — the number that must stay flat as operators compose."""
    return _count_nodes(df, "Exchange")


def has_broadcast_join(df: DataFrame) -> bool:
    plan = explain_formatted(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def has_whole_stage_codegen(df: DataFrame) -> bool:
    """Check on the EXECUTED plan (AQE's pre-execution formatted plan
    doesn't show codegen stages) — triggers an action on THIS df's own
    query execution (count() would plan a different query)."""
    df.collect()
    plan = executed_plan(df)
    # codegen stages print as "*(n) Op" in the simple plan string
    return "WholeStageCodegen" in plan or re.search(r"\*\(\d+\)", plan) is not None


def assert_scan_pruned(df: DataFrame, expect_at_most: int) -> None:
    schemas = read_schemas(df)
    assert schemas, "no file scan found in plan"
    widest = max(len(s) for s in schemas)
    assert widest <= expect_at_most, (
        f"scan reads {widest} columns, expected ≤ {expect_at_most}: {schemas}")


def assert_filter_pushed(df: DataFrame, column: str) -> None:
    pf = pushed_filters(df)
    assert any(column in p for p in pf), (
        f"no pushed filter mentions {column!r}; pushed: {pf}")
