"""Regenerate PROVENANCE.json — the machine-readable query →
last-driver-proven-round ledger (r5 verdict #1: rotation must be
auditable mechanically, not via registry comments).

A query counts as proven in round N iff its CORRECTNESS_r0N.json row is
rows+schema+hash green with no error.  The window is the registry's
first WINDOW_SIZE entries (the driver's per-round check).  Run from the
repo root after adding/reordering registry entries:

    python tools/provenance.py

The committed PROVENANCE.json answers, per query: where does its most
recent driver proof live, is it in the next driver window, and which
queries would go stale if the current window ships as-is.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

WINDOW_SIZE = 50

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    registry = list(entry.queries())
    oracles = set(entry.oracle_sql())

    last: dict[str, int] = {}
    files = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    for path in files:
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            rec = json.load(f)
        for q, row in rec.items():
            if (row.get("rows_match") and row.get("schema_match")
                    and row.get("hash_match") and not row.get("err")):
                last[q] = max(last.get(q, 0), rnd)

    max_round = max(last.values()) if last else 0
    queries = {
        name: {
            "position": i,
            "in_window": i < WINDOW_SIZE,
            "last_proven_round": last.get(name),
            "has_oracle": name in oracles,
        }
        for i, name in enumerate(registry)
    }
    # a query is stale-after-next-round if it is NOT in the upcoming
    # window and its most recent proof predates the latest round;
    # never-proven entries are their own category below, not stale ones
    # (None would coerce to 0 and double-count them here)
    stale = sorted(
        n for n, q in queries.items()
        if not q["in_window"]
        and q["last_proven_round"] is not None
        and q["last_proven_round"] < max_round)
    never = sorted(n for n, q in queries.items()
                   if q["last_proven_round"] is None and not q["in_window"])
    out = {
        "window_size": WINDOW_SIZE,
        "latest_round_seen": max_round,
        "generated_from": [os.path.basename(p) for p in files],
        "stale_after_next_round": stale,
        "never_proven_outside_window": never,
        "queries": queries,
    }
    dest = os.path.join(REPO, "PROVENANCE.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"wrote {dest}: {len(registry)} queries, "
          f"{sum(q['in_window'] for q in queries.values())} in window, "
          f"stale after next round: {stale or 'none'}, "
          f"never-proven outside window: {never or 'none'}")


if __name__ == "__main__":
    main()
