"""Generate OPERATORS.md: one row per registered query, from the live
registry (name, defining module, oracle status, first doc sentence).
Run after adding operators; CI-style check: the committed file must
match the registry (tests/test_catalog.py asserts row count parity).
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from kafka_hadoop_loader_spark.registry import load_all  # noqa: E402


def first_sentence(doc: str) -> str:
    doc = " ".join((doc or "").split())
    m = re.match(r"(.+?[.!?])(\s|$)", doc)
    s = m.group(1) if m else doc
    s = s.replace("|", "\\|")  # literal pipes would split the md table row
    return s if len(s) <= 180 else s[:177] + "..."


def main() -> None:
    reg = load_all()
    rows = []
    for name, q in sorted(reg.items()):
        mod = q.fn.__module__.replace("kafka_hadoop_loader_spark.", "")
        rows.append(
            f"| `{name}` | {mod} | {'yes' if q.oracle else 'rows-only'} | "
            f"{first_sentence(q.doc)} |"
        )
    out = [
        "# OPERATORS — registered query catalog (auto-generated)",
        "",
        f"{len(reg)} queries registered in "
        "`kafka_hadoop_loader_spark.registry`; regenerate with "
        "`python tools/gen_catalog.py`.  Every row is driver-executable "
        "via `__spark_entry__.queries()[name](spark, sf_dir)` and "
        "hash-compared against its DuckDB oracle.",
        "",
        "| query | module | oracle | what it demonstrates |",
        "|---|---|---|---|",
        *rows,
        "",
    ]
    with open(os.path.join(REPO, "OPERATORS.md"), "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote OPERATORS.md ({len(reg)} rows)")


if __name__ == "__main__":
    main()
