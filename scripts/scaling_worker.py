#!/usr/bin/env python
"""Run one scaling job at a given parallelism; print one JSON line.

Usage: python scripts/scaling_worker.py <cpus> <job> [rows]
jobs:
  feature_sketch — grouped DDSketch build over the 40M-row narrow feature
                   table (compute-dominated: measures the sketch engine).
  e2e_pages      — end-to-end: scan the wide pages table (text column),
                   extract length, build grouped sketches (scan-dominated:
                   measures the whole pipeline including the JVM parquet
                   string path).

The same deterministic input is used at every parallelism level. Each job
does one warmup run (spawns the python worker pool, faults pages into cache)
and reports the median of 3 timed runs — cluster-size scaling efficiency is a
steady-state property.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FEATS_PATH = os.environ.get("SCALING_FEATS", "/root/repo/.cache/feats160m")
PAGES_ROWS = 4_000_000


def main() -> None:
    cpus = int(sys.argv[1])
    job = sys.argv[2] if len(sys.argv) > 2 else "feature_sketch"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from sketches_rust_spark.functions.ddsketch_spark import (
        SketchConfig,
        ddsketch_aggregate,
        make_quantile_udf,
    )
    from sketches_rust_spark.sources.pages import pages_table

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"scaling-{job}-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(8, cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.files.maxPartitionBytes", str(64 * 1024 * 1024))
        .getOrCreate()
    )
    spark.range(1000).selectExpr("sum(id)").collect()

    cfg = SketchConfig("logarithmic_collapsing_lowest_dense", 0.01, 2048)
    p99 = make_quantile_udf(0.99)

    if job == "feature_sketch":
        feats = spark.read.parquet(FEATS_PATH)

        def run_once():
            t0 = time.perf_counter()
            agg = ddsketch_aggregate(feats, "text_len", ["lang", "day"], cfg)
            out = agg.select("lang", "day", p99("sketch").alias("p99"), "rows_in").collect()
            return time.perf_counter() - t0, out
    elif job == "sql_build":
        from sketches_rust_spark.functions.ddsketch_sql import ddsketch_aggregate_sql
        feats = spark.read.parquet(FEATS_PATH)

        def run_once():
            t0 = time.perf_counter()
            agg = ddsketch_aggregate_sql(feats, "text_len", ["lang", "day"], cfg)
            out = agg.select("lang", "day", p99("sketch").alias("p99"), "rows_in").collect()
            return time.perf_counter() - t0, out
    elif job == "multi_feature_sketch":
        from sketches_rust_spark.functions.ddsketch_sql import ddsketch_aggregate_multi
        feats = spark.read.parquet(FEATS_PATH)

        def run_once():
            t0 = time.perf_counter()
            agg = ddsketch_aggregate_multi(
                feats, ["text_len", "token_count", "html_bytes"], ["lang"], cfg)
            out = agg.select("feature", "lang", p99("sketch").alias("p99"),
                             "rows_in").collect()
            return time.perf_counter() - t0, out
    elif job == "weighted_sql_build":
        # round-2 native weighted path: bucket + sum(weight) in Tungsten
        from sketches_rust_spark.functions.ddsketch_spark import (
            ddsketch_aggregate_weighted,
        )
        feats = spark.read.parquet(FEATS_PATH).withColumn(
            "w", (F.col("token_count") % 5 + 1).cast("double"))
        n_input = feats.count()

        def run_once():
            t0 = time.perf_counter()
            agg = ddsketch_aggregate_weighted(feats, "text_len", "w",
                                              ["lang", "day"], cfg)
            # rows_in here is the accepted WEIGHT SUM (the sketch count) —
            # reported as-is; n_input goes out as a separate field so input
            # rows/sec stays comparable to the unweighted jobs
            out = agg.select("lang", "day", p99("sketch").alias("p99"),
                             "rows_in").collect()
            return time.perf_counter() - t0, out
    elif job == "sql_e2e_pages":
        from sketches_rust_spark.functions.ddsketch_sql import ddsketch_aggregate_sql
        pages = pages_table(spark, PAGES_ROWS)
        feats = pages.select(
            "lang", F.to_date("warc_ts").alias("day"),
            F.length("text").cast("double").alias("text_len"),
        )

        def run_once():
            t0 = time.perf_counter()
            agg = ddsketch_aggregate_sql(feats, "text_len", ["lang", "day"], cfg)
            out = agg.select("lang", "day", p99("sketch").alias("p99"), "rows_in").collect()
            return time.perf_counter() - t0, out
    elif job in ("extract_pages", "extract_pages_pandas"):
        # the full north-star pipeline from RAW HTML: extraction
        # (operators/extraction.py) + 3-feature unpivot + grouped sketch.
        # 'extract_pages' = jvm regexp chain (whole-stage codegen, the scale
        # path); '_pandas' = Arrow pandas-UDF engine (the parser seam) to
        # quantify the Arrow crossing toll at scale.
        from sketches_rust_spark.functions.ddsketch_sql import ddsketch_aggregate_multi
        from sketches_rust_spark.operators.extraction import page_features
        engine = "jvm" if job == "extract_pages" else "pandas"
        pages = pages_table(spark, PAGES_ROWS)
        feats = page_features(pages, engine=engine, keep_cols=("lang",))

        def run_once():
            t0 = time.perf_counter()
            agg = ddsketch_aggregate_multi(
                feats, ["text_len", "token_count", "html_bytes"], ["lang"], cfg)
            out = agg.select("feature", "lang", p99("sketch").alias("p99"),
                             "rows_in").collect()
            return time.perf_counter() - t0, out
    elif job == "e2e_pages":
        pages = pages_table(spark, PAGES_ROWS)
        feats = pages.select(
            "lang", F.to_date("warc_ts").alias("day"),
            F.length("text").cast("double").alias("text_len"),
        )

        def run_once():
            t0 = time.perf_counter()
            agg = ddsketch_aggregate(feats, "text_len", ["lang", "day"], cfg)
            out = agg.select("lang", "day", p99("sketch").alias("p99"), "rows_in").collect()
            return time.perf_counter() - t0, out
    else:
        raise SystemExit(f"unknown job {job}")

    warm_dt, out = run_once()
    times = sorted(run_once()[0] for _ in range(3))
    dt = statistics.median(times)

    total_rows = sum(r["rows_in"] for r in out)
    payload = {
        "job": job,
        "cpus": cpus,
        "rows": total_rows,
        "seconds": round(dt, 3),
        "rows_per_sec": round(total_rows / dt, 1),
        "cold_seconds": round(warm_dt, 3),
        "all_timed_runs": [round(t, 3) for t in times],
        "groups": len(out),
    }
    if job == "weighted_sql_build":
        # rows/rows_per_sec above are the accepted weight sum (sketch count);
        # n_input is the raw input row count for cross-job comparability
        payload["n_input"] = n_input
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
