"""Standalone-import guard: every operator module must import in a
FRESH interpreter with no sibling pre-imported.

registry.load_all()'s fixed import order masks missing cross-module
dependencies in oracle late-binds (round 7 found exactly this in
graph.py: its {mh} late-bind read dedup_minhash_lsh's registry entry
without importing dedup — KeyError on any standalone import).  Each
module is probed in its own subprocess so one module's import can't
satisfy another's hidden dependency.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

def _pkg_modules(*rel: str) -> list[str]:
    out = []
    for r in rel:
        d = os.path.join(REPO, "kafka_hadoop_loader_spark", *r.split("."))
        if os.path.isdir(d):
            out += [
                f"kafka_hadoop_loader_spark.{r}.{f[:-3]}"
                for f in os.listdir(d)
                if f.endswith(".py") and f != "__init__.py"
            ]
        elif os.path.isfile(d + ".py"):
            out.append(f"kafka_hadoop_loader_spark.{r}")
    return sorted(out)


_MODULES = _pkg_modules(
    "operators", "sources", "streaming", "plans", "functions",
    "catalog", "registry", "session",
)


@pytest.mark.parametrize("mod", _MODULES)
def test_operator_module_imports_standalone(mod):
    proc = subprocess.run(
        [sys.executable, "-c", f"import {mod}"],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-800:]
