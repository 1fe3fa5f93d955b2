"""Per-query ratio report: a bench JSON vs BASELINE.md's recorded rows.

The per-round grading question is always the same — "which queries read
over 2x (weak pending re-measure) or over 1.5x (watch) of their
BASELINE.md row, and what's the median?" — and hand-rolling the
comparison invites parsing the wrong table column (the rows are
``| name | sf | sec | date | note |``; grabbing column 2 compares
against the SCALE FACTOR and makes every query look 10x slow at
sf=0.1).  This tool is the one sanctioned reader, sharing the row
shape with tools/update_baseline.py, the one sanctioned writer.

Usage:
    python tools/bench_ratios.py                 # BENCH_FULL.json
    python tools/bench_ratios.py BENCH_r11.json  # any stamped bench JSON

Prints a human summary plus one machine-readable JSON line:
``{"n": ..., "median": ..., "over_2x": {...}, "over_1p5x": {...},
"missing_in_bench": [...], "missing_in_baseline": [...],
"excluded": {...}}`` — ``excluded`` lists queries present on both
sides but dropped from the ratio set (errored/negative bench time or
a non-positive baseline row), so an errored run can never read as a
clean pass.

Exit status: 1 if any query reads over 2x (so a round-end script can
gate on it), else 0.  Protocol reminder: an over-2x row from a full
suite pass is NOT a regression verdict — re-measure min-of-3 on a
quiet host first (tools/bench_targeted.py) and consult BASELINE.md's
noise registry before touching any kernel.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def baseline_rows(path: str) -> dict[str, float]:
    """``{query: seconds}`` from BASELINE.md's measured-numbers table
    (rows shaped ``| name | sf | sec | date | note |``; column 3 is
    the seconds — column 2 is the scale factor)."""
    rows: dict[str, float] = {}
    for line in open(path, encoding="utf-8"):
        if not line.startswith("|"):
            continue
        cells = [c.strip() for c in line.split("|")]
        # cells[0] is the empty string before the leading pipe
        if len(cells) < 5 or cells[1] in ("Metric", "---", ""):
            continue
        try:
            float(cells[2])  # sf column must be numeric (skips prose rows)
            rows[cells[1]] = float(cells[3])
        except ValueError:
            continue
    return rows


def bench_queries(path: str) -> dict[str, float]:
    """``{query: seconds}`` from a bench JSON: the stamped
    ``{"queries": {...}, ...}`` shape, the driver's ``BENCH_rN.json``
    wrapper (bench stdout under ``"parsed"`` — NOTE: stdout carries
    headline rows only, so coverage gaps vs BASELINE are expected
    there), or a legacy bare mapping."""
    payload = json.load(open(path, encoding="utf-8"))
    if isinstance(payload, dict) and "queries" not in payload and isinstance(
        payload.get("parsed"), dict
    ):
        payload = payload["parsed"]
    q = payload.get("queries", payload) if isinstance(payload, dict) else {}
    return {n: float(t) for n, t in q.items() if isinstance(t, (int, float))}


def main() -> None:
    bench_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH_FULL.json"
    )
    base = baseline_rows(os.path.join(REPO, "BASELINE.md"))
    bench = bench_queries(bench_path)
    if not base:
        sys.exit("no baseline rows parsed from BASELINE.md")
    if not bench:
        sys.exit(f"no query timings parsed from {bench_path}")

    common = sorted(set(base) & set(bench))
    ratios = {
        n: bench[n] / base[n] for n in common if base[n] > 0 and bench[n] >= 0
    }
    # Queries present on BOTH sides but unratioable (zero/negative
    # baseline row, or a negative bench time — the error sentinel) must
    # stay visible: an errored query silently dropped from every list
    # would read as a clean pass, violating the no-silent-caps rule.
    excluded = {
        n: {"baseline": base[n], "bench": bench[n]}
        for n in common
        if n not in ratios
    }
    if not ratios:
        sys.exit("no comparable (positive-baseline, non-errored) queries")
    over2 = {n: round(r, 2) for n, r in ratios.items() if r > 2.0}
    over15 = {
        n: round(r, 2) for n, r in ratios.items() if 1.5 < r <= 2.0
    }
    med = statistics.median(ratios.values())
    worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:5]

    print(f"compared {len(ratios)} queries ({bench_path} vs BASELINE.md)")
    print(f"median ratio: {med:.2f}x")
    print(f"over 2x ({len(over2)}): {over2 or '{}'}")
    print(f"1.5-2x ({len(over15)}): {over15 or '{}'}")
    print("worst 5: " + ", ".join(
        f"{n} {r:.2f}x ({bench[n]:.2f}s vs {base[n]:.2f}s)" for n, r in worst
    ))
    missing_bench = sorted(set(base) - set(bench))
    missing_base = sorted(set(bench) - set(base))
    if missing_bench:
        print(f"in BASELINE but not in bench source ({len(missing_bench)}): "
              f"{missing_bench[:10]}{'...' if len(missing_bench) > 10 else ''}")
    if missing_base:
        print(f"in bench source but not in BASELINE ({len(missing_base)}): "
              f"{missing_base[:10]}{'...' if len(missing_base) > 10 else ''}")
    if excluded:
        print(f"EXCLUDED from ratios — errored bench time or non-positive "
              f"baseline row ({len(excluded)}): {excluded}")
    if over2:
        print("over-2x present: re-measure min-of-3 on a quiet host "
              "(tools/bench_targeted.py) and check BASELINE.md's noise "
              "registry before concluding regression")
    print(json.dumps({
        "n": len(ratios),
        "median": round(med, 3),
        "over_2x": over2,
        "over_1p5x": over15,
        "missing_in_bench": missing_bench,
        "missing_in_baseline": missing_base,
        "excluded": excluded,
    }, sort_keys=True))
    sys.exit(1 if over2 else 0)


if __name__ == "__main__":
    main()
