#!/usr/bin/env python
"""Extra benchmarking harness for optimization work (bench.py is FROZEN for
driver measurement; this file holds the builder-side instrumentation).

Usage:
    python bench_extra.py q1 q2 ...        # time named queries (3 runs each)
    python bench_extra.py --plans q1 ...   # also dump .explain("formatted")
    python bench_extra.py --runs 5 q1      # change repeat count
    python bench_extra.py --all            # every registered query once

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
(default 32). Timing methodology matches bench.py (collect() on the query's
DataFrame, perf_counter), with the same JVM/Python/scan warmups, so numbers
are comparable; additionally each query is labeled via setJobDescription.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPO = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", action="store_true",
                    help="dump .explain('formatted') to plans/r06/<q>_cur.txt")
    ap.add_argument("--plans-suffix", default="cur")
    args = ap.parse_args()

    from bench import build_spark
    import __spark_entry__ as entry_mod

    spark = build_spark(CPUS)
    spark.range(1000).selectExpr("sum(id)").collect()

    def _warm(batches):
        import numpy  # noqa: F401
        import sketches_rust_spark.kernel.sketch  # noqa: F401
        for b in batches:
            yield b
    spark.range(int(CPUS) * 2, numPartitions=int(CPUS)).mapInPandas(
        _warm, "id long").count()
    for t in ("documents", "embeddings", "events", "lineitem"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()

    qs = entry_mod.queries()
    names = sorted(qs) if args.all else args.queries
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    out: dict[str, list[float]] = {}
    for name in names:
        if args.plans:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            pdir = os.path.join(REPO, "plans", "r06")
            os.makedirs(pdir, exist_ok=True)
            with open(os.path.join(
                    pdir, f"{name}_{args.plans_suffix}.txt"), "w") as f:
                f.write(plan)
        runs = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).collect()
            runs.append(round(time.perf_counter() - t0, 4))
        spark.sparkContext.setJobDescription(None)
        out[name] = runs
        print(f"## {name}: min={min(runs):.3f} runs={runs}", file=sys.stderr)

    print(json.dumps({"sf": SF_DIR, "cpus": int(CPUS), "runs": out,
                      "mins": {k: min(v) for k, v in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
