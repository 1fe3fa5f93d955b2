"""Capture .explain("formatted") for named queries to
plans/$SPARK_GRAFT_PLANS_DIR (default r14)/<name>_<tag>.txt.

    python tools/capture_plans.py <tag> name [name...]

Build-only (no jobs run): registry construction is job-free by the
test_plans.py audit, so this is safe to run alongside other work.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        raise SystemExit("usage: capture_plans.py <tag> name [name...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from kafka_hadoop_loader_spark import registry
    from kafka_hadoop_loader_spark.session import get_spark

    reg = registry.load_all()
    unknown = [n for n in names if n not in reg]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = get_spark("capture-plans", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(
        REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_DIR", "r14")
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = reg[name].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
