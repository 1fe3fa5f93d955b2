"""Regression guard for the driver-window rotation contract.

The grading driver verifies only a bounded prefix (~50 entries) of
``queries()`` per round, so ``registry._DRIVER_WINDOW_PRIORITY`` must
rotate: every name it promotes must be one the driver has NEVER marked
green in a committed ``CORRECTNESS_r0*.json``.  A name that is already
green wastes a window slot that an untested query needed.

(Exception mechanism: if an operator's semantics change and it must be
re-verified, list it in ``_REVERIFY_OK`` below with a comment saying
why — the test then allows it.)
"""

from __future__ import annotations

import glob
import json
import os
import subprocess

from kafka_hadoop_loader_spark import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _correctness_files() -> list[str]:
    """Committed CORRECTNESS artifacts only.

    The driver drops ``CORRECTNESS_r{N}.json`` into the working tree at
    round end, BEFORE the builder has a chance to rotate the window — so
    an untracked artifact must not redden an otherwise-correct tree.
    The contract is: the rotation happens in the same commit that tracks
    the artifact.  Fall back to all files if git is unavailable."""
    try:
        out = subprocess.run(
            ["git", "-C", REPO, "ls-files", "CORRECTNESS_r0*.json"],
            capture_output=True, text=True, timeout=30, check=True,
        ).stdout.split()
        return [os.path.join(REPO, p) for p in out]
    except (OSError, subprocess.SubprocessError):
        return glob.glob(os.path.join(REPO, "CORRECTNESS_r0*.json"))

# Names allowed in the window despite an existing green row (deliberate
# re-verification after a behavior change).  Keep empty unless needed.
_REVERIFY_OK: frozenset[str] = frozenset()
# (Round 6 used this for the three star-contraction consumers whose
# schema gained the convergence certificate; their re-verification rows
# landed green in CORRECTNESS_r06.json, so the set is empty again.)


def _driver_green() -> set[str]:
    """Names with at least one PASSING driver row.  A name that only
    ever appeared red (err set, or any match flag false — as happened
    to 8 queries in round 2) is NOT green: the rotation contract
    requires re-promoting it, so it must stay eligible for the
    window."""
    green: set[str] = set()
    for path in _correctness_files():
        try:
            rows = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("err") is None and all(
                row.get(k, False)
                for k in ("rows_match", "schema_match", "hash_match")
            ):
                green.add(name)
    return green


def test_window_contains_no_already_green_name():
    green = _driver_green() - _REVERIFY_OK
    stale = [n for n in registry._DRIVER_WINDOW_PRIORITY if n in green]
    assert not stale, (
        f"driver window wastes slots on already-green queries: {stale}; "
        "rotate them out of _DRIVER_WINDOW_PRIORITY"
    )


def test_window_names_exist_and_are_unique():
    registry.load_all()
    prio = registry._DRIVER_WINDOW_PRIORITY
    assert len(prio) == len(set(prio)), "duplicate names in driver window"
    unknown = [n for n in prio if n not in registry.REGISTRY]
    assert not unknown, f"driver window names not in registry: {unknown}"


def test_window_is_the_queries_prefix():
    reg = registry.load_all()
    prio = registry._DRIVER_WINDOW_PRIORITY
    assert list(reg)[: len(prio)] == list(prio)
