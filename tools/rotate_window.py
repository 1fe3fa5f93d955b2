"""Recompute registry._DRIVER_WINDOW_PRIORITY for a new round.

The staleness-rotation contract (tests/test_driver_window.py): the
window holds the 50 registered names whose most recent driver-green
CORRECTNESS row is OLDEST, ordered by (latest-green round ascending,
name ascending), counting only GIT-TRACKED CORRECTNESS_r*.json
artifacts.  Run this right after `git add`ing the new round's artifact,
in the same commit (the tripwire test enforces exactly that pairing):

    git add CORRECTNESS_r10.json BENCH_r10.json
    python tools/rotate_window.py          # rewrites registry.py in place
    python -m pytest tests/test_driver_window.py -q
    git add kafka_hadoop_loader_spark/registry.py && git commit ...

The tuple is pure presentation order (queries() emits these 50 first);
names, fns, and oracles are untouched.  The script regenerates both the
tuple literal and the "round-N window" description above it.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REGISTRY_PY = os.path.join(REPO, "kafka_hadoop_loader_spark", "registry.py")
WINDOW = 50


def _tracked_correctness() -> list[str]:
    out = subprocess.run(
        ["git", "-C", REPO, "ls-files", "CORRECTNESS_r*.json"],
        capture_output=True, text=True, timeout=30, check=True,
    ).stdout.split()
    return [os.path.join(REPO, p) for p in out]


def _latest_green_round() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in _tracked_correctness():
        m = re.search(r"CORRECTNESS_r0*(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        rows = json.load(open(path))
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("err") is None and all(
                row.get(k, False)
                for k in ("rows_match", "schema_match", "hash_match")
            ):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> None:
    from kafka_hadoop_loader_spark import registry

    registry.load_all()
    latest = _latest_green_round()
    rounds = [
        int(m.group(1))
        for p in _tracked_correctness()
        if (m := re.search(r"CORRECTNESS_r0*(\d+)\.json$", p))
    ]
    this_round = (max(rounds) + 1) if rounds else 1
    ranked = sorted(registry.REGISTRY, key=lambda n: (latest.get(n, 0), n))
    window = ranked[: min(WINDOW, len(ranked))]

    counts = Counter(latest.get(n, 0) for n in window)
    lines = ["_DRIVER_WINDOW_PRIORITY: tuple[str, ...] = ("]
    prev = None
    for n in window:
        r = latest.get(n, 0)
        if r != prev:
            lines.append(
                f"    # -- latest driver green: round {r} "
                f"({counts[r]} names, name order) --"
            )
            prev = r
        lines.append(f'    "{n}",')
    lines.append(")")
    new_block = "\n".join(lines)

    src = open(REGISTRY_PY).read()
    start = src.index("_DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (")
    # match the tuple's closing paren STRUCTURALLY (a line that is
    # exactly ")"), not the first line that merely ends in ")" — a
    # hand-edited entry ending in ')' inside the tuple must not
    # silently truncate the rewrite
    close = re.search(r"^\)$", src[start:], re.M)
    if close is None:
        sys.exit(
            "could not find the tuple's closing paren (a bare ')' line) "
            "in registry.py — update it by hand"
        )
    end = start + close.end()
    src = src[:start] + new_block + src[end:]

    groups = " plus ".join(
        f"{counts[r]} round-{r} names" for r in sorted(counts)
    )
    src, n_sub = re.subn(
        r"# The tuple below is the round-\d+ window:.*?"
        r"(?=# tests/test_driver_window\.py)",
        f"# The tuple below is the round-{this_round} window: the 50 "
        f"stalest names —\n# the {groups}\n# (latest driver-green round "
        "ascending, name ascending).\n",
        src,
        count=1,
        flags=re.DOTALL,
    )
    if n_sub != 1:
        sys.exit(
            "could not find the window-description comment above the "
            "tuple in registry.py — update it by hand"
        )
    open(REGISTRY_PY, "w").write(src)
    print(
        f"rotated window for round {this_round}: "
        + ", ".join(f"{counts[r]}x r{r}" for r in sorted(counts))
        + f" -> {REGISTRY_PY}"
    )
    print("now run: python -m pytest tests/test_driver_window.py -q")


if __name__ == "__main__":
    main()
