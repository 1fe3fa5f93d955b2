"""Regenerate BASELINE.md's per-query table from bench.py JSON output.

Usage:
    python bench.py > /tmp/bench.json
    python tools/update_baseline.py /tmp/bench.json [--note "protocol note"]

Replaces the block of ``| <query> | <sf> | ... |`` rows between the table
header and the first non-table line after it, keeping everything else in
BASELINE.md untouched.  Queries are emitted sorted by name so diffs stay
reviewable round-over-round.
"""

from __future__ import annotations

import argparse
import datetime
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
BASELINE = REPO / "BASELINE.md"
HEADER = "| Query (`queries()` key) | sf | wall-clock (s) | date | notes |"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("bench_json")
    ap.add_argument("--note", default="min of 2 full passes (bench.py protocol)")
    ap.add_argument("--date", default=str(datetime.date.today()))
    args = ap.parse_args()

    bench = json.loads(pathlib.Path(args.bench_json).read_text().strip().splitlines()[-1])
    sf = bench.get("sf", 0.1)
    queries: dict[str, float] = bench["queries"]

    lines = BASELINE.read_text().splitlines()
    try:
        hdr = lines.index(HEADER)
    except ValueError:
        sys.exit(f"table header not found in {BASELINE}")
    # skip the |---| separator, then consume existing table rows
    end = hdr + 2
    while end < len(lines) and lines[end].startswith("|"):
        end += 1

    rows = [
        f"| {name} | {sf} | {queries[name]:.2f} | {args.date} | {args.note} |"
        for name in sorted(queries)
        if queries[name] >= 0
    ]
    errored = sorted(n for n, t in queries.items() if t < 0)
    if errored:
        sys.exit(f"refusing to record baseline with errored queries: {errored}")

    out = lines[: hdr + 2] + rows + lines[end:]
    BASELINE.write_text("\n".join(out) + "\n")
    total = sum(queries.values())
    print(f"wrote {len(rows)} rows (sf={sf}, total {total:.1f}s) to {BASELINE}")


if __name__ == "__main__":
    main()
