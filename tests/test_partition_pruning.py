"""Partition pruning: a day-partitioned pages layout must let Catalyst skip
non-matching partitions entirely (the Iceberg-table access pattern; hive-
style parquet partitioning is the sandbox stand-in)."""

import pytest

from pyspark.sql import functions as F

from sketches_rust_spark.functions.ddsketch_spark import SketchConfig
from sketches_rust_spark.functions.ddsketch_sql import ddsketch_quantiles_sql
from sketches_rust_spark.sources.pages import pages_table

CFG = SketchConfig("logarithmic_unbounded_size_dense_store", 0.01, 0)


@pytest.fixture(scope="module")
def partitioned_pages(spark, tmp_path_factory):
    cache = str(tmp_path_factory.mktemp("pages_cache"))
    pages = pages_table(spark, 20_000, cache_dir=cache)
    path = str(tmp_path_factory.mktemp("pages_by_day"))
    (pages.withColumn("day", F.date_format(F.to_date("warc_ts"), "yyyy-MM-dd"))
     .write.partitionBy("day").parquet(path, mode="overwrite"))
    return spark.read.parquet(path)


def test_day_filter_prunes_partitions(partitioned_pages):
    one_day = partitioned_pages.where(F.col("day") == "2025-01-05") \
        .select("lang", F.length("text").alias("v"))
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(day" in plan
    # the data filter list must NOT contain the day predicate (it is
    # resolved at planning time against the partition index)
    assert "PushedFilters: []" in plan


def test_per_day_sketch_on_pruned_partition_matches_full_scan(spark, partitioned_pages):
    pruned = partitioned_pages.where(F.col("day") == "2025-01-05").select(
        "lang", F.length("text").cast("double").alias("v"))
    full = partitioned_pages.select(
        "day", "lang", F.length("text").cast("double").alias("v"))
    a = ddsketch_quantiles_sql(pruned, "v", ["lang"], {"p50": 0.5}, CFG) \
        .toPandas().set_index("lang")["p50"].to_dict()
    b = ddsketch_quantiles_sql(full.where(F.col("day") == "2025-01-05"),
                               "v", ["lang"], {"p50": 0.5}, CFG) \
        .toPandas().set_index("lang")["p50"].to_dict()
    assert a == b


def test_incremental_dedup_prunes_corpus_to_probed_buckets(spark, tmp_path):
    """Incremental dedup must read ONLY the corpus signature partitions the
    new shard's probe buckets touch: the signature-partitioned corpus scan
    carries a dynamic-pruning PartitionFilter (no full corpus rescan), and
    the surviving set equals the brute-force recomputation."""
    from sketches_rust_spark.operators.similarity import (
        incremental_near_dup_filter,
        with_lsh_signature,
        write_partitioned_signatures,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = emb.where(F.pmod(F.col("vec_id"), F.lit(10)) != 7)
    shard = emb.where(F.pmod(F.col("vec_id"), F.lit(10)) == 7)
    table = "inc_dedup_prune_test"
    write_partitioned_signatures(corpus, str(tmp_path / "corpus"), table,
                                 "embedding", dim=64, nbits=6)
    out = incremental_near_dup_filter(shard, spark.table(table), 0.3,
                                      dim=64, nbits=6, multi_probe=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the corpus scan's partition filter is resolved at RUNTIME from the
    # broadcast of the shard's probe buckets
    assert "dynamicpruning" in plan.lower()
    assert "PartitionFilters" in plan

    # correctness: same survivors as a non-persisted (recompute) corpus run
    fresh = incremental_near_dup_filter(
        shard, with_lsh_signature(corpus, "embedding", 64, 6),
        0.3, dim=64, nbits=6, multi_probe=1)
    assert sorted(r.vec_id for r in out.collect()) == \
        sorted(r.vec_id for r in fresh.collect())
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_incremental_simhash_text_never_rescans_corpus_text(spark, tmp_path):
    """The TEXT variant of incremental dedup: the corpus contributes only
    its persisted (_id, simhash) table (16 bytes/doc); every scan of the
    documents parquet in the plan must carry the SHARD filter — the corpus
    text is never re-read. Survivors must equal a fresh-signature run."""
    from sketches_rust_spark.operators.dedup import (
        incremental_simhash_filter, simhash_signatures)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.where(F.pmod(F.col("doc_id"), F.lit(10)) != 7)
    shard = docs.where(F.pmod(F.col("doc_id"), F.lit(10)) == 7)
    sig_dir = str(tmp_path / "sigs")
    simhash_signatures(corpus).write.parquet(sig_dir)

    out = incremental_simhash_filter(shard, spark.read.parquet(sig_dir),
                                     max_hamming=3, n_blocks=6)
    plan = out._jdf.queryExecution().executedPlan().toString()
    doc_scan_lines = [ln for ln in plan.splitlines()
                      if "documents.parquet" in ln]
    assert doc_scan_lines  # the shard text pass exists
    # every documents scan must carry the SHARD equality filter — a corpus
    # rescan would show the negated predicate (NOT (pmod(...) = 7)), which
    # a bare 'pmod(doc_id' substring check would NOT catch
    assert all("= 7)" in ln for ln in doc_scan_lines)
    assert not any("NOT (pmod" in ln for ln in doc_scan_lines)
    assert "sigs" in plan  # the persisted signature table is the corpus side

    fresh = incremental_simhash_filter(shard, simhash_signatures(corpus),
                                       max_hamming=3, n_blocks=6)
    assert sorted(r.doc_id for r in out.collect()) == \
        sorted(r.doc_id for r in fresh.collect())
