"""Generate tests/fixtures/pii.csv — deterministic text rows salted with
known PII (emails / phone numbers) so the redaction operator has real
matches to find.  Run once; the output is committed (the driver's oracle
reads the same file).

    python tests/fixtures/gen_pii.py
"""

from __future__ import annotations

import csv
import random
from pathlib import Path

WORDS = ("the quick brown fox jumps over lazy dog while reading training "
         "data quality reports about corpus filtering and deduplication").split()
NAMES = ["alice", "bob", "carol.d", "dave_99", "eve+test", "frank.o"]
DOMAINS = ["example.com", "mail.example.org", "corp.example.net"]


def main() -> None:
    rng = random.Random(7)
    rows = []
    for i in range(400):
        toks = [rng.choice(WORDS) for _ in range(rng.randint(5, 20))]
        for _ in range(rng.randint(0, 3)):
            pos = rng.randint(0, len(toks))
            kind = rng.random()
            if kind < 0.45:
                toks.insert(pos, f"{rng.choice(NAMES)}@{rng.choice(DOMAINS)}")
            elif kind < 0.75:
                toks.insert(pos, f"{rng.randint(200, 999)}-{rng.randint(100, 999)}"
                                 f"-{rng.randint(1000, 9999)}")
            else:
                toks.insert(pos, f"({rng.randint(200, 999)}) {rng.randint(100, 999)}"
                                 f"-{rng.randint(1000, 9999)}")
        rows.append((i, " ".join(toks)))

    out = Path(__file__).parent / "pii.csv"
    with out.open("w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["row_id", "text"])
        w.writerows(rows)
    print(f"wrote {out} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
