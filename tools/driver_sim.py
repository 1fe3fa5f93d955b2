"""Simulate the grading driver exactly: vanilla SparkSession (no engine
confs), import ``__spark_entry__``, run t1 smoke (entry at sf0.001) and
t2 correctness (queries vs oracle_sql via DuckDB at sf0.01, comparing
row count + column names + order-insensitive value hash).

Usage: python tools/driver_sim.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def vhash(rows, cols) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(repr(tuple(r[i] for i in order)) for r in rows)
    return hashlib.sha256("\n".join(canon).encode()).hexdigest()[:12]


def pandas_canon(rows, cols):
    """Mirror the grading driver's canonicalization: build a pandas frame,
    column-sort, then sort_values over every column.  Columns holding
    unhashable values (numpy arrays, lists, dicts) make pandas'
    lexsort/factorize raise TypeError — exactly the failure
    CORRECTNESS_r01 recorded for multimodal_decode — so running this on
    every result (rows-only included) reproduces that class locally."""
    import pandas as pd

    pdf = pd.DataFrame(list(rows), columns=list(cols))
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    # Adversarial-parallelism knobs: results must be invariant to the
    # cluster shape (partition counts, task parallelism) — the property
    # a 1000-executor deployment relies on.  Defaults replicate the
    # grading driver exactly (local[8], no shuffle conf = Spark's 200);
    # a periodic sweep runs e.g. --master local[3] --shuffle 7 and must
    # still read ALL MATCH.
    ap.add_argument("--master", default="local[8]")
    ap.add_argument("--shuffle", type=int, default=None)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master(args.master)
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
    )
    if args.shuffle is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(args.shuffle))
    spark = builder.getOrCreate()
    import __spark_entry__ as E

    df = E.entry(spark)
    n = df.count()
    print(f"T1 SMOKE: rows={n} schema={df.schema.simpleString()}")
    assert n > 0, "entry() returned no rows"

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    qs, osql = E.queries(), E.oracle_sql()
    names = args.names or sorted(qs)
    print(f"T2: {len(names)} queries, {sum(1 for q in names if q in osql)} with oracles")
    # Build-action audit (standing gate, mirrors
    # tests/test_plans.py::test_query_construction_runs_no_spark_jobs):
    # constructing a query must not run Spark jobs except for the
    # documented materializer classes (DDL/file setup, generated
    # file-source fixtures, lazy-localCheckpoint lineage cuts whose
    # stages AQE finalizes in toRdd).  Warm the fixture schema cache
    # first so first-touch footer jobs aren't charged to a query.
    from kafka_hadoop_loader_spark.catalog import load_tables

    load_tables(spark, args.sf)
    build_materializers = {
        "compact_small_files", "insert_overwrite_day", "sink_partitioned",
        "sql_ctas_insert", "join_bucketed_colocated", "join_dpp_partitioned",
        "fk_orphan_check", "reference_loader_parity", "observe_metrics_audit",
        "scan_corrupt_records", "scan_binary_files", "scan_csv", "scan_json", "scan_orc",
        "scan_python_datasource", "scan_text_lines", "scan_xml",
        "dedup_clusters", "dedup_clusters_star", "graph_connected_components",
        "graph_label_propagation", "orders_rfm_segments", "ann_recall_audit",
        "text_bigram_kneser_ney", "graph_kcore", "spatial_dbscan_grid",
        "graph_link_prediction", "kmeans_seed_farthest",
        "ml_isotonic_calibration",
        "orders_abc_classification",
        # r13 lineage cuts (see OPTIMIZATION_r13.md)
        "dedup_simhash", "pca_power_component", "ml_logreg_rational",
        "ml_calibration_ece", "kmeans_embeddings", "graph_pagerank",
        "pipeline_corpus_build", "dedup_ngram_jaccard",
        "knn_pq_adc", "ann_pq_recall_audit",
        "bpe_train_merges", "bpe_encode_corpus", "tokenizer_fertility",
        "conformal_interval_coverage", "basket_part_affinity",
    }
    sc = spark.sparkContext
    failures = []
    for name in names:
        try:
            sc.setJobGroup(f"build:{name}", name)
            sdf = qs[name](spark, args.sf)
            build_jobs = len(
                sc.statusTracker().getJobIdsForGroup(f"build:{name}")
            )
            sc.setJobGroup(None, None)
            if build_jobs and name not in build_materializers:
                print(f"  {name}: BUILD-ACTION {build_jobs} job(s) at construction")
                failures.append(name)
                continue
            srows = [tuple(r) for r in sdf.collect()]
            pandas_canon(srows, sdf.columns)  # driver canonicalizes everything
            if name not in osql:
                status = f"rows-only, {len(srows)} rows"
                if len(srows) == 0:
                    failures.append(name)
                    status += "  !! 0 ROWS"
                print(f"  {name}: {status}")
                continue
            res = con.execute(osql[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            # Typed-schema gate: the grading driver hashes *typed* values
            # (Arrow/pandas), so a family mismatch (e.g. DuckDB HUGEINT
            # from an un-CAST SUM vs Spark BIGINT) is a driver hash-fail
            # even when repr() values agree.  Reproduce that here.
            from typecanon import oracle_arrow_schema, type_mismatches

            tmis = type_mismatches(sdf.schema, oracle_arrow_schema(con, osql[name]))
            sh, oh = vhash(srows, sdf.columns), vhash(orows, ocols)
            match = (
                len(srows) == len(orows)
                and sorted(sdf.columns) == sorted(ocols)
                and sh == oh
                and not tmis
            )
            if tmis:
                print(f"  {name}: TYPE MISMATCH {tmis}")
        except Exception as e:  # noqa: BLE001
            print(f"  {name}: EXCEPTION {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        if not match:
            failures.append(name)
        print(
            f"  {name}: rows {len(srows)}/{len(orows)} "
            f"cols={'ok' if sorted(sdf.columns) == sorted(ocols) else 'MISMATCH'} "
            f"hash {sh}/{oh} -> {'MATCH' if match else 'MISMATCH'}"
        )
    print("T2 RESULT:", "ALL MATCH" if not failures else f"FAILURES: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
