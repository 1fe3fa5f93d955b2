"""CLI entry point — R10 parity with the reference's job driver
[pub: src/main/java/io/amient/kafka/hadoop/HadoopJob.java], which parses
(topics, zookeeper, target path, offset reset, compression, local/remote
mode) and submits one bounded load.  Here the same vocabulary drives one
``trigger(availableNow)`` Structured Streaming run:

    python -m kafka_hadoop_loader_spark \
        --source files --input /data/in \
        --target /data/out --checkpoint /data/ckpt \
        --topics events --timestamp-field ts --timestamp-unit us \
        --offset-reset earliest --compression snappy

Re-running with the same --checkpoint loads only new data (the
checkpoint's offsets/commit logs replace the reference's ZooKeeper
watermarks, R2/R9) — and the parquet sink's transaction log makes the
run exactly-once rather than the reference's at-least-once.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="kafka_hadoop_loader_spark",
        description="Incremental stream -> time-bucketed partitioned parquet",
    )
    p.add_argument("--source", choices=["files", "kafka"], default="files",
                   help="'kafka' needs a broker; 'files' streams JSON lines")
    p.add_argument("--input", default="", help="files source: input directory")
    p.add_argument("--bootstrap", default="", help="kafka source: bootstrap servers")
    p.add_argument("--topics", default="events", help="comma-separated topics")
    p.add_argument("--target", required=True, help="output root directory")
    p.add_argument("--checkpoint", required=True, help="checkpoint (watermark) dir")
    p.add_argument("--timestamp-field", default="ts", help="JSON event-time field (R6)")
    p.add_argument("--timestamp-unit", choices=["s", "ms", "us"], default="us")
    p.add_argument("--offset-reset", choices=["earliest", "latest"], default="earliest")
    p.add_argument("--compression", default="snappy", help="output codec (R8)")
    p.add_argument("--output-format", choices=["parquet", "text", "json"],
                   default="parquet",
                   help="'text' = the reference's raw-payload-lines shape")
    p.add_argument("--payload-schema", default=None,
                   help="DDL schema of the JSON payload (default: events shape)")
    p.add_argument("--max-files-per-trigger", type=int, default=None,
                   help="bound each micro-batch (backfill in increments)")
    p.add_argument("--master", default=None, help="Spark master (default local[*])")
    p.add_argument("--dry-run", action="store_true",
                   help="validate the whole config + plan and exit: prints "
                        "the validate_config report as JSON, starts no "
                        "streaming query, writes no checkpoint state; exit "
                        "code 0 iff the config is valid")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.source == "files" and not args.input:
        print("--input is required with --source files", file=sys.stderr)
        return 2
    if args.source == "kafka" and not args.bootstrap:
        print("--bootstrap is required with --source kafka", file=sys.stderr)
        return 2

    from kafka_hadoop_loader_spark.session import get_spark
    from kafka_hadoop_loader_spark.streaming.loader import LoaderConfig, run_loader

    cfg_kwargs = dict(
        source=args.source,
        input_path=args.input,
        kafka_bootstrap=args.bootstrap,
        topics=args.topics,
        target_path=args.target,
        checkpoint_path=args.checkpoint,
        timestamp_field=args.timestamp_field,
        timestamp_unit=args.timestamp_unit,
        offset_reset=args.offset_reset,
        compression=args.compression,
        output_format=args.output_format,
        max_files_per_trigger=args.max_files_per_trigger,
    )
    if args.payload_schema:
        cfg_kwargs["payload_schema"] = args.payload_schema

    from pyspark.sql import SparkSession

    # get_spark is getOrCreate: stop the session only if WE created it
    # (an embedding process — tests, a notebook — keeps its own alive).
    preexisting = SparkSession.getActiveSession() is not None
    spark = get_spark("khl-loader", master=args.master)
    try:
        if args.dry_run:
            from kafka_hadoop_loader_spark.streaming.loader import validate_config

            report = validate_config(spark, LoaderConfig(**cfg_kwargs))
            print(json.dumps(report))
            return 0 if report["ok"] else 1
        metrics = run_loader(spark, LoaderConfig(**cfg_kwargs))
    finally:
        if not preexisting:
            spark.stop()
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
