"""Source/sink round-trips: JSON/CSV scans match the oracle on the
original parquet; the partitioned sink's read-back actually prunes."""

from __future__ import annotations

import os

from tests.conftest import SF_DIR, assert_matches_oracle


def test_scan_json_matches_oracle(spark, duck):
    from kafka_hadoop_loader_spark import registry

    q = registry.load_all()["scan_json"]
    assert_matches_oracle(q.fn(spark, SF_DIR), q.oracle, duck)


def test_scan_csv_matches_oracle(spark, duck):
    from kafka_hadoop_loader_spark import registry

    q = registry.load_all()["scan_csv"]
    assert_matches_oracle(q.fn(spark, SF_DIR), q.oracle, duck)


def test_sink_partitioned_matches_oracle(spark, duck):
    from kafka_hadoop_loader_spark import registry

    q = registry.load_all()["sink_partitioned"]
    assert_matches_oracle(q.fn(spark, SF_DIR), q.oracle, duck)


def test_partitioned_sink_layout_and_pruning(spark, tmp_path):
    """The sink writes Hive-style d=/h= directories and a day-filtered
    read touches only that day's files (Catalyst partition pruning)."""
    from pyspark.sql import functions as F

    from kafka_hadoop_loader_spark.catalog import table

    e = table(spark, SF_DIR, "events").select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd").alias("d"),
        F.format_string("%02d", F.hour("ts")).alias("h"),
    )
    first3 = e.where(F.col("d") <= "2024-01-03")
    out = str(tmp_path / "by_dh")
    first3.repartition("d", "h").write.partitionBy("d", "h").parquet(out)

    day_dirs = [p for p in os.listdir(out) if p.startswith("d=")]
    assert sorted(day_dirs) == ["d=2024-01-01", "d=2024-01-02", "d=2024-01-03"]
    hour_dirs = os.listdir(os.path.join(out, "d=2024-01-01"))
    assert all(h.startswith("h=") for h in hour_dirs)

    back = spark.read.parquet(out)
    pruned = back.where(F.col("d") == "2024-01-02")
    # inputFiles() lists the relation pre-pruning; the scan node's plan
    # string is where pruning is visible (PartitionFilters + a
    # PartitionCount covering only the selected day's hour buckets).
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "2024-01-02" in plan, plan[:800]
    # and the filter really does cut the row count to one day's worth
    assert pruned.count() == first3.where(F.col("d") == "2024-01-02").count()

    # one file per (d, h) bucket thanks to the pre-write repartition
    files_in_bucket = [
        f
        for f in os.listdir(os.path.join(out, "d=2024-01-01", hour_dirs[0]))
        if f.endswith(".parquet")
    ]
    assert len(files_in_bucket) == 1


def test_compaction_reduces_files_per_day(spark):
    """The fragmented copy must really be fragmented (8 hashed writer
    tasks -> >1 file in at least one day directory) and the compacted
    rewrite must land exactly one data file per day."""
    import glob
    import os

    from kafka_hadoop_loader_spark.operators.layout import _compact_dirs
    from tests.conftest import SF_DIR

    frag, compact = _compact_dirs(spark, SF_DIR)

    def files_per_day(root):
        return {
            os.path.basename(d): len(glob.glob(os.path.join(d, "*.parquet")))
            for d in glob.glob(os.path.join(root, "d=*"))
        }

    frag_counts = files_per_day(frag)
    compact_counts = files_per_day(compact)
    assert frag_counts and compact_counts
    assert max(frag_counts.values()) > 1
    assert set(compact_counts.values()) == {1}
    assert sum(1 for v in frag_counts.values() if v > 1) >= 1
