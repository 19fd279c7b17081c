"""One-command release check (r6 verdict #8): chain every gate the
rounds rely on and write a single VERIFY.json, so future rounds (and
the driver) get the whole green wall from one entry point.

    python tools/verify_all.py              # full: all four gates
    python tools/verify_all.py --fast       # skip the sf1.0 scale gate

Gates, in order (each recorded with wall time and pass/fail; a failing
gate does not stop the later ones — the artifact should show the WHOLE
wall, not the first brick):

0. oracle_types — tools/lint_oracle_types.py binds every oracle in
   DuckDB and fails on HUGEINT/DECIMAL/unsigned output columns (the
   r7 label_outliers hash-red class).
1. pytest  — the unit/law/fuzz suite, including the sf0.001 oracle
   parity run of every registry query (tests/test_oracle_parity.py).
2. parity@sf0.01 — the same differential suite at the driver's
   correctness scale (SPARK_GRAFT_TEST_SF_DIR).
3. bench — bench.py at $SPARK_GRAFT_SF_DIR (default sf0.1); records the
   parsed one-line JSON.  NOTE: overwrites BENCH_FULL.json (by design —
   it IS the bench artifact); run from a clean tree or restore after.
4. scale — `bench_scale.py verify` (full value parity at sf1.0,
   generating the /tmp replica if absent) → SCALE_PARITY.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_gate(name: str, cmd: list[str], env: dict | None = None) -> dict:
    print(f"\n=== gate: {name}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    proc = subprocess.run(
        cmd, cwd=REPO, env={**os.environ, **(env or {})},
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    took = round(time.time() - t0, 1)
    tail = "\n".join(proc.stdout.strip().splitlines()[-12:])
    print(tail, flush=True)
    print(f"=== gate {name}: exit={proc.returncode} in {took}s", flush=True)
    return {"cmd": " ".join(cmd), "ok": proc.returncode == 0,
            "seconds": took, "tail": tail}


def provenance_freshness_gate() -> dict:
    """r8 verdict #1: the committed PROVENANCE.json lagged the newest
    CORRECTNESS file three rounds running (the ledger was regenerated
    before the driver emitted the round's file).  Fail the wall unless
    the ledger's ``generated_from`` includes every CORRECTNESS_r*.json
    currently on disk — the fix is one ``python tools/provenance.py``."""
    import glob
    import time as _time
    t0 = _time.time()
    have = sorted(os.path.basename(p) for p in
                  glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    try:
        with open(os.path.join(REPO, "PROVENANCE.json")) as f:
            ledger = json.load(f)
        seen = set(ledger.get("generated_from", []))
        missing = [p for p in have if p not in seen]
        ok = not missing
        tail = ("ledger is fresh" if ok else
                f"PROVENANCE.json lags {missing} — run tools/provenance.py")
    except (OSError, ValueError) as exc:
        ok, tail = False, f"PROVENANCE.json unreadable: {exc}"
    print(f"\n=== gate: provenance_fresh: {tail}", flush=True)
    return {"cmd": "(inline) PROVENANCE.generated_from covers "
                   "CORRECTNESS_r*.json", "ok": ok,
            "seconds": round(_time.time() - t0, 1), "tail": tail}


def main() -> None:
    fast = "--fast" in sys.argv
    gates: dict[str, dict] = {}
    gates["provenance_fresh"] = provenance_freshness_gate()
    gates["oracle_types"] = run_gate(
        "oracle_types", [sys.executable, "tools/lint_oracle_types.py"])
    gates["pytest"] = run_gate(
        "pytest", [sys.executable, "-m", "pytest", "tests/", "-q"])
    gates["parity_sf0.01"] = run_gate(
        "parity_sf0.01",
        [sys.executable, "-m", "pytest", "tests/test_oracle_parity.py", "-q"],
        env={"SPARK_GRAFT_TEST_SF_DIR": "/root/testdata/sf0.01"})
    gates["bench"] = run_gate("bench", [sys.executable, "bench.py"])
    try:
        last = [ln for ln in gates["bench"]["tail"].splitlines()
                if ln.startswith("{")][-1]
        gates["bench"]["record"] = json.loads(last)
    except (IndexError, ValueError):
        gates["bench"]["record"] = None
        gates["bench"]["ok"] = False
    if not fast:
        gates["scale_sf1.0"] = run_gate(
            "scale_sf1.0", [sys.executable, "bench_scale.py", "verify"])
        try:
            with open(os.path.join(REPO, "SCALE_PARITY.json")) as f:
                sp = json.load(f)
            gates["scale_sf1.0"]["summary"] = sp.get("summary", sp)
        except (OSError, ValueError):
            gates["scale_sf1.0"]["summary"] = None
    out = {
        "generated_by": "tools/verify_all.py",
        "fast": fast,
        "all_green": all(g["ok"] for g in gates.values()),
        "gates": gates,
    }
    dest = os.path.join(REPO, "VERIFY.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"\nwrote {dest}: all_green={out['all_green']}")
    sys.exit(0 if out["all_green"] else 1)


if __name__ == "__main__":
    main()
