"""Regenerate BASELINE.md's per-query table from bench JSON output —
the ONLY sanctioned writer of baseline rows, and protocol-aware.

The round-9 lesson, made structural: ``tools/bench_targeted.py``
min-of-3 numbers read systematically QUIETER than the same query inside
a full ``bench.py`` suite pass (less GC/scheduler interference), so a
re-record taken targeted silently tightens the 2x perf gate for future
rounds.  Every other row was recorded from full-suite passes; this tool
now refuses to mix protocols unless the mixing is labeled in the row.

Usage:
    python bench.py            # refreshes BENCH_FULL.json (all queries;
                               # the stdout line keeps headline rows only
                               # and will be refused by the coverage check)
    python tools/update_baseline.py BENCH_FULL.json [--note "..."]

    # re-record only named rows (e.g. after a deliberate plan change),
    # still from a FULL-SUITE pass:
    python tools/update_baseline.py BENCH_FULL.json --rows q1,q2

    # targeted-protocol source (bench_targeted.py): refused unless
    # --allow-targeted, which forces a protocol label into the note:
    python tools/update_baseline.py /tmp/targeted.json --rows q1 \
        --allow-targeted

Rules enforced:
- a FULL rewrite (no --rows) requires a full-suite-protocol source that
  covers every registered query — a targeted JSON would otherwise
  replace the whole table with a handful of rows;
- ``--rows`` updates only the named rows in place and requires the
  source to be full-suite protocol, unless --allow-targeted is given,
  in which case the row's note is forced to carry the
  "targeted min-of-3 (quieter than full-suite)" label;
- errored queries (negative seconds) always abort.

Replaces/edits the block of ``| <query> | <sf> | ... |`` rows between
the table header and the first non-table line after it, keeping
everything else in BASELINE.md untouched.  Queries are emitted sorted
by name so diffs stay reviewable round-over-round.
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
TARGETED_LABEL = "targeted min-of-3 (quieter than full-suite)"


def _registered_names() -> set[str]:
    sys.path.insert(0, str(REPO))
    from kafka_hadoop_loader_spark import registry

    return set(registry.load_all())


def _load_bench(path: str) -> tuple[dict[str, float], float, str]:
    """Returns (queries, sf, protocol); protocol is 'full-suite' for
    bench.py payloads, else the stamped/assumed targeted protocol."""
    text = pathlib.Path(path).read_text().strip()
    try:
        # pretty-printed files (BENCH_FULL.json)
        payload = json.loads(text)
    except json.JSONDecodeError:
        # captured stdout: the JSON line is the last line
        payload = json.loads(text.splitlines()[-1])
    if "queries" not in payload:
        # legacy bench_targeted shape: a bare {name: sec} dict
        return dict(payload), -1.0, "targeted-min3"
    protocol = payload.get(
        "protocol", "full-suite" if "metric" in payload else "targeted-min3"
    )
    if "sf" not in payload:
        # refuse, mirroring the legacy-shape refusal below: assuming
        # sf=0.1 would record rows at a scale the run never measured
        sys.exit(
            "source JSON has a 'queries' stamp but no 'sf' stamp: "
            "refusing to assume sf=0.1 — re-run bench.py or "
            "tools/bench_targeted.py, both of which stamp sf"
        )
    sf = float(payload["sf"])
    if sf <= 0:
        sys.exit(
            f"source JSON carries a non-positive sf stamp ({sf}): the "
            "bench run could not determine its scale factor — fix the "
            "data-dir name (.../sfN.NN) and re-run the bench"
        )
    return dict(payload["queries"]), sf, protocol


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("bench_json")
    ap.add_argument("--note", default="min of 2 full passes (bench.py protocol)")
    ap.add_argument("--date", default=str(datetime.date.today()))
    ap.add_argument(
        "--rows",
        default=None,
        help="comma-separated query names: update only these rows in place",
    )
    ap.add_argument(
        "--allow-targeted",
        action="store_true",
        help="permit a targeted-protocol source for --rows re-records; "
        "the protocol label is forced into the note",
    )
    args = ap.parse_args()

    queries, sf, protocol = _load_bench(args.bench_json)
    if sf < 0:
        sys.exit(
            "source JSON carries no sf stamp (legacy bare {name: sec} "
            "shape): re-run tools/bench_targeted.py, which stamps "
            "protocol and sf"
        )
    errored = sorted(n for n, t in queries.items() if t < 0)
    if errored:
        sys.exit(f"refusing to record baseline with errored queries: {errored}")

    note = args.note
    if protocol != "full-suite":
        if args.rows is None:
            sys.exit(
                f"source protocol is '{protocol}': a full table rewrite "
                "requires a full bench.py suite pass (targeted numbers "
                "read systematically quieter — see module docstring)"
            )
        if not args.allow_targeted:
            sys.exit(
                f"source protocol is '{protocol}': BASELINE.md rows are "
                "recorded from full-suite passes; re-run via bench.py, or "
                "pass --allow-targeted to record WITH a protocol label"
            )
        if TARGETED_LABEL not in note:
            note = (
                f"{TARGETED_LABEL}"
                if note == ap.get_default("note")
                else f"{note}; {TARGETED_LABEL}"
            )

    registered = _registered_names()
    if args.rows is None and not registered <= set(queries):
        missing = sorted(registered - set(queries))
        sys.exit(
            f"full table rewrite requires every registered query; source "
            f"is missing {len(missing)}: {missing[:10]}{'...' if len(missing) > 10 else ''}"
        )

    lines = BASELINE.read_text().splitlines()
    try:
        hdr = lines.index(HEADER)
    except ValueError:
        sys.exit(f"table header not found in {BASELINE}")
    # skip the |---| separator, then consume existing table rows
    end = hdr + 2
    while end < len(lines) and lines[end].startswith("|"):
        end += 1

    def _row(name: str) -> str:
        return f"| {name} | {sf} | {queries[name]:.2f} | {args.date} | {note} |"

    if args.rows is not None:
        wanted = [n.strip() for n in args.rows.split(",") if n.strip()]
        unknown = sorted(set(wanted) - set(queries))
        if unknown:
            sys.exit(f"--rows names absent from the bench source: {unknown}")
        existing = {}
        for i in range(hdr + 2, end):
            existing[lines[i].split("|")[1].strip()] = i
        absent = sorted(set(wanted) - set(existing))
        if absent:
            sys.exit(
                f"--rows names have no existing BASELINE row (new rows come "
                f"from a full rewrite): {absent}"
            )
        for n in wanted:
            lines[existing[n]] = _row(n)
        BASELINE.write_text("\n".join(lines) + "\n")
        print(
            f"re-recorded {len(wanted)} row(s) (sf={sf}, protocol="
            f"{protocol}) in {BASELINE}"
        )
        return

    rows = [_row(name) for name in sorted(queries)]
    out = lines[: hdr + 2] + rows + lines[end:]
    BASELINE.write_text("\n".join(out) + "\n")
    total = sum(queries.values())
    print(f"wrote {len(rows)} rows (sf={sf}, total {total:.1f}s) to {BASELINE}")


if __name__ == "__main__":
    main()
