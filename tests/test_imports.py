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

_MODULES = sorted(
    f[:-3]
    for f in os.listdir(
        os.path.join(REPO, "kafka_hadoop_loader_spark", "operators")
    )
    if f.endswith(".py") and f != "__init__.py"
)


@pytest.mark.parametrize("mod", _MODULES)
def test_operator_module_imports_standalone(mod):
    proc = subprocess.run(
        [sys.executable, "-c",
         f"import kafka_hadoop_loader_spark.operators.{mod}"],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-800:]
