"""Targeted min-of-3 baseline timing for named queries, using the exact
bench.py protocol (same session confs, same warmups, noop sink) so the
recorded number is comparable with BASELINE.md rows.

    python tools/bench_targeted.py name [name...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: bench_targeted.py name [name...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = _sf_of(sf_dir)
    if sf <= 0:
        # fail BEFORE spinning Spark, with the SAME threshold as
        # update_baseline.py (<= 0): a dir named .../sf0 would pass a
        # `< 0` pre-flight, burn a full min-of-3 run, then be refused
        # at baseline-update time anyway
        raise SystemExit(
            f"cannot parse a positive scale factor from "
            f"SPARK_GRAFT_SF_DIR={sf_dir!r} (expected a path ending in "
            "sfN.NN, N > 0): rename the data dir or point at one of "
            "/root/testdata/sf*"
        )

    from kafka_hadoop_loader_spark import registry
    from kafka_hadoop_loader_spark.session import get_spark

    reg = registry.load_all()
    unknown = [n for n in names if n not in reg]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = get_spark("bench-targeted", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # bench.py's warmups: JVM + parquet footers, Python worker pool
    reg["events_hourly"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    def _ident(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        import pyarrow  # noqa: F401

        for b in batches:
            yield b

    spark.range(0, int(cpus) * 4, 1, int(cpus)).mapInPandas(
        _ident, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    # bench.py's memoized-ANN-index warmup (see bench.py for why): one
    # untimed build of the IVF assignment / PQ long view / LSH buckets
    # so a targeted run of any consumer measures the serving path,
    # exactly as the full-suite run does.
    for warm in ("knn_cosine_ivf", "knn_pq_adc", "knn_cosine_lsh"):
        reg[warm].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    times: dict[str, float] = {}
    for _pass in range(3):
        for name in names:
            t0 = time.time()
            reg[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.time() - t0, 3)
            times[name] = min(times.get(name, dt), dt)
    # protocol stamped so update_baseline.py can refuse/label these
    # numbers: targeted min-of-3 reads systematically QUIETER than the
    # same query inside a full bench.py suite pass (less GC/scheduler
    # interference — the round-9 lesson), so BASELINE.md rows must come
    # from full-suite passes unless explicitly labeled
    print(json.dumps({
        "protocol": "targeted-min3",
        "sf": sf,
        "queries": times,
    }))


def _sf_of(sf_dir: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)/?$", sf_dir)
    if not m:
        return -1.0
    try:
        return float(m.group(1))
    except ValueError:
        # the regex admits digit-free matches like ".../sf." whose
        # group float() rejects — report "unparseable", don't crash
        return -1.0


if __name__ == "__main__":
    main()
