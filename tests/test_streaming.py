"""Structured Streaming sketch aggregation tests (file source, availableNow)."""

import glob
import os

import pytest

from pyspark.sql import functions as F

from sketches_rust_spark.functions.ddsketch_spark import SketchConfig
from sketches_rust_spark.functions.ddsketch_sql import ddsketch_aggregate_sql
from sketches_rust_spark.kernel.sketch import DDSketch
from sketches_rust_spark.streaming.sketch_stream import (
    merged_stream_result,
    stateful_sketch_stream,
    stream_sketch_partials,
    windowed_sketch_histogram,
)

CFG = SketchConfig("logarithmic_unbounded_size_dense_store", 0.01, 0)


@pytest.fixture()
def events_stream_dir(spark, tmp_path):
    """events split into 4 files to simulate stream arrivals."""
    src = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    path = str(tmp_path / "stream_src")
    src.repartition(4).write.parquet(path)
    return path


def _read_stream(spark, path):
    schema = spark.read.parquet(path).schema
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path))


def test_stream_partials_merge_equals_batch(spark, tmp_path, events_stream_dir):
    stream = _read_stream(spark, events_stream_dir).select(
        "event_type", F.col("value").cast("double").alias("v"))
    sink = str(tmp_path / "sink")
    q = stream_sketch_partials(stream, "v", ["event_type"], CFG, sink,
                               str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    # one partial blob row per (batch, group)
    n_batches = len({os.path.basename(f) for f in glob.glob(sink + "/*.parquet")})
    assert n_batches >= 2  # maxFilesPerTrigger=1 over 4 files -> >= 2 batches

    merged = merged_stream_result(spark, sink, ["event_type"], CFG)
    got = {r["event_type"]: bytes(r["sketch"]) for r in merged.collect()}

    batch_df = spark.read.parquet(events_stream_dir).select(
        "event_type", F.col("value").cast("double").alias("v"))
    want = {r["event_type"]: bytes(r["sketch"]) for r in
            ddsketch_aggregate_sql(batch_df, "v", ["event_type"], CFG).collect()}
    assert got == want  # streaming merge-on-read == batch build, byte-identical


def test_stateful_sketch_stream(spark, tmp_path, events_stream_dir):
    stream = _read_stream(spark, events_stream_dir).select(
        F.col("event_type").alias("key"), F.col("value").cast("double").alias("v"))
    out = stateful_sketch_stream(stream, "v", "key", CFG, quantile=0.9)
    q = (out.writeStream.format("memory").queryName("running_sketches")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    result = spark.sql(
        "SELECT key, max(count) AS count FROM running_sketches GROUP BY key")
    got = {r["key"]: r["count"] for r in result.collect()}
    want = {r["event_type"]: float(r["n"]) for r in
            spark.read.parquet(events_stream_dir)
            .groupBy("event_type").agg(F.count("value").alias("n")).collect()}
    assert got == want  # final running state saw every row exactly once


def test_windowed_histogram_stream(spark, tmp_path, events_stream_dir):
    stream = _read_stream(spark, events_stream_dir).select(
        F.col("ts").cast("timestamp").alias("ts"),  # source is TIMESTAMP_NTZ
        "event_type", F.col("value").cast("double").alias("v"))
    hist = windowed_sketch_histogram(stream, "v", ["event_type"], CFG,
                                     ts_col="ts", window_duration="7 days",
                                     watermark="0 seconds")
    q = (hist.writeStream.format("memory").queryName("win_hist")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ckpt3"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    total = spark.sql("SELECT CAST(sum(c) AS BIGINT) AS n FROM win_hist").collect()[0]["n"]
    assert total == spark.read.parquet(events_stream_dir).count()
    # at least one window per 7-day span and buckets carry counts per group
    groups = spark.sql("SELECT count(DISTINCT event_type) AS g FROM win_hist").collect()[0]["g"]
    assert groups == 5


def test_merge_on_read_idempotent_under_batch_retry(spark, tmp_path,
                                                    events_stream_dir):
    """foreachBatch is at-least-once: simulate a retried micro-batch by
    appending the same batch's partials twice — merged_stream_result must
    not double-count."""
    batch_df = spark.read.parquet(events_stream_dir).select(
        "event_type", F.col("value").cast("double").alias("v"))
    sink = str(tmp_path / "retry_sink")
    partials = (ddsketch_aggregate_sql(batch_df, "v", ["event_type"], CFG)
                .withColumn("batch_id", F.lit(0)))
    partials.write.mode("append").parquet(sink)
    partials.write.mode("append").parquet(sink)  # the retry

    merged = merged_stream_result(spark, sink, ["event_type"], CFG)
    got = {r["event_type"]: DDSketch.decode(bytes(r["sketch"])).get_count()
           for r in merged.collect()}
    want = {r["event_type"]: r["n"] for r in
            batch_df.groupBy("event_type").agg(F.count("v").alias("n")).collect()}
    assert got == {k: float(v) for k, v in want.items()}


def test_windowed_histogram_weighted(spark, tmp_path, events_stream_dir):
    """Weighted streaming histogram: per-bucket c = sum(weight), matching
    the batch weighted histogram over the same data."""
    from sketches_rust_spark.functions.ddsketch_sql import ddsketch_histogram

    stream = _read_stream(spark, events_stream_dir).select(
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type", F.col("value").cast("double").alias("v"),
        (F.col("user_id") % 3 + 1).cast("double").alias("w"))
    hist = windowed_sketch_histogram(stream, "v", ["event_type"], CFG,
                                     ts_col="ts", window_duration="365 days",
                                     watermark="0 seconds", weight_col="w")
    q = (hist.writeStream.format("memory").queryName("win_hist_w")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ckptw"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    batch = spark.read.parquet(events_stream_dir).select(
        "event_type", F.col("value").cast("double").alias("v"),
        (F.col("user_id") % 3 + 1).cast("double").alias("w"))
    want = {(r["event_type"], r["side"], r["idx"]): r["c"] for r in
            ddsketch_histogram(batch, "v", ["event_type"], CFG, "w").collect()}
    got = {(r["event_type"], r["side"], r["idx"]): r["c"] for r in
           spark.sql("SELECT event_type, side, idx, c FROM win_hist_w").collect()}
    assert got == want


def test_stateful_eviction_bounds_state_and_reinitializes(spark, tmp_path):
    """The timeout-eviction variant must (1) evict idle keys — emitting a
    final evicted=true row and dropping their state — and (2) RE-INITIALIZE
    an evicted key from empty when it reappears (count restarts instead of
    continuing), proving state size is bounded under key churn rather than
    one-blob-per-key forever."""
    import time

    from sketches_rust_spark.streaming.sketch_stream import (
        stateful_sketch_stream_with_eviction)

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def write_file(name, rows):
        spark.createDataFrame(rows, ["key", "v"]).coalesce(1) \
            .write.mode("append").parquet(src)

    sink = str(tmp_path / "sink")

    def run_phase(phase, expect):
        """Run the stream against the shared checkpoint until the sink holds
        the ``expect``ed {(key, evicted): count} rows for this phase, then
        stop. Memory sinks cannot recover from a checkpoint (state must
        survive across the three runs), so update rows append via
        foreachBatch; a processing-time-timeout query under availableNow
        keeps polling timer batches instead of self-terminating, so the
        test polls the sink and stops the query explicitly."""
        schema = spark.read.parquet(src).schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 100).parquet(src))
        out = stateful_sketch_stream_with_eviction(
            stream, "v", "key", CFG, quantile=0.5, timeout_ms=3_000)

        def write(batch_df, batch_id):
            (batch_df.withColumn("phase", F.lit(phase))
             .write.mode("append").parquet(sink))

        q = (out.writeStream.foreachBatch(write)
             .outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        try:
            got = set()
            for _ in range(300):  # <= 30 s
                try:
                    got = {(r["key"], r["evicted"], r["count"])
                           for r in spark.read.parquet(sink)
                           .where(F.col("phase") == phase).collect()}
                except Exception:
                    got = set()  # sink dir not written yet
                if expect <= got:
                    return got
                time.sleep(0.1)
            raise AssertionError(
                f"phase {phase}: wanted {expect}, sink has {got}")
        finally:
            q.stop()

    # phase 1: k1 gets 10 rows, k2 gets 5; stop before the 3 s timers fire
    write_file("a", [("k1", float(i)) for i in range(10)]
               + [("k2", float(i)) for i in range(5)])
    run_phase("p1", {("k1", False, 10.0), ("k2", False, 5.0)})

    # both keys idle past the timeout (wall-clock), then k2 receives new
    # data: the restarted query fires the expired timers — k1's eviction
    # marker carries its final count — and k2, whose blob was dropped,
    # RE-INITIALIZES from empty (count 3, not 5 + 3)
    time.sleep(5.0)
    write_file("b", [("k2", float(i)) for i in range(3)])
    run_phase("p2", {("k1", True, 10.0), ("k2", False, 3.0)})

    # k1 reappears after its eviction: fresh state again (4 rows, not 14)
    time.sleep(5.0)
    write_file("c", [("k1", float(i)) for i in range(4)])
    run_phase("p3", {("k1", False, 4.0)})
