"""Corpus-curation operators: deterministic rebalancing, context-window
packing, vocabulary stats."""

import pytest

from pyspark.sql import functions as F

from sketches_rust_spark.operators.curation import (
    pack_context_windows,
    rebalance_stats,
    threshold_sample,
    vocab_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet")


def test_threshold_sample_deterministic_and_partition_invariant(spark, docs):
    fracs = {"en": 0.25, "zh": 0.8}
    a = sorted(r.doc_id for r in
               threshold_sample(docs.repartition(1), fracs).select("doc_id").collect())
    b = sorted(r.doc_id for r in
               threshold_sample(docs.repartition(13), fracs).select("doc_id").collect())
    assert a == b                      # the kept SET is a function of ids only
    assert 0 < len(a) < docs.count()   # non-degenerate


def test_threshold_sample_respects_fractions(spark, docs):
    stats = {r.lang: (r.n_total, r.n_kept) for r in
             rebalance_stats(docs, {"en": 0.25, "zh": 0.8}).collect()}
    n_en, k_en = stats["en"]
    assert k_en < n_en                       # dominant lang really capped
    # Bernoulli(0.25) over n_en docs: allow a wide deterministic band
    assert 0.10 * n_en <= k_en <= 0.45 * n_en
    for lang, (n, k) in stats.items():
        if lang not in ("en", "zh"):
            assert k == n                    # default frac 1.0 keeps all
    # sample is the filter the stats count
    kept = threshold_sample(docs, {"en": 0.25, "zh": 0.8}) \
        .groupBy("lang").count().collect()
    assert {r.lang: r["count"] for r in kept} == {
        lang: k for lang, (n, k) in stats.items()}


def test_pack_context_windows_budget_bound(spark, docs):
    budget = 2048
    toks = docs.select(
        "lang", F.size(F.split("text", " ")).cast("long").alias("t"))
    max_doc = toks.agg(F.max("t")).collect()[0][0]
    packed = pack_context_windows(docs, budget=budget).collect()
    per_lang_total = {r.lang: r.t for r in
                      toks.groupBy("lang").agg(F.sum("t").alias("t")).collect()}
    got_totals: dict = {}
    for r in packed:
        # budget-quantized packing: every chunk holds <= budget + max_doc
        assert r.sum_tokens <= budget + max_doc
        got_totals[r.lang] = got_totals.get(r.lang, 0) + r.sum_tokens
        assert r.n_docs >= 1
    assert got_totals == per_lang_total      # every token lands in a chunk
    # chunks are dense from 0 per lang
    by_lang: dict = {}
    for r in packed:
        by_lang.setdefault(r.lang, []).append(r.chunk)
    for lang, chunks in by_lang.items():
        assert sorted(chunks) == list(range(len(chunks)))


def test_vocab_stats_sanity(spark, docs):
    rows = {r.lang: r for r in vocab_stats(docs).collect()}
    for lang, r in rows.items():
        assert 0 < r.n_vocab <= r.n_tokens
        assert 0 <= r.n_hapax <= r.n_vocab
    # cross-check one group exactly in pandas
    import collections
    texts = [r.text for r in docs.where("lang = 'de'").select("text").collect()]
    counter = collections.Counter(t for x in texts for t in x.split(" "))
    assert rows["de"].n_tokens == sum(counter.values())
    assert rows["de"].n_vocab == len(counter)
    assert rows["de"].n_hapax == sum(1 for c in counter.values() if c == 1)


def test_pack_context_windows_adversarial_doc_sizes(spark):
    """Edge shapes: a doc far over the budget, single-token docs, and a
    budget-exact doc. The bound (chunk <= budget + max_doc) and total
    coverage must hold; chunk ids may legitimately skip after an oversize
    doc (quantized packing never splits a doc)."""
    budget = 100
    sizes = [1, 99, 100, 350, 1, 1, 1, 200, 50]
    rows = [(i, "w " * (n - 1) + "w", "xx") for i, n in enumerate(sizes)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    packed = pack_context_windows(docs, budget=budget).collect()
    assert sum(r.sum_tokens for r in packed) == sum(sizes)
    for r in packed:
        assert r.sum_tokens <= budget + max(sizes)
    # the 350-token doc sits alone in its chunk span (never split)
    chunk_of = {}
    for r in packed:
        chunk_of[r.chunk] = r
    big_chunks = [r for r in packed if r.sum_tokens >= 350]
    assert any(r.n_docs == 1 and r.sum_tokens == 350 for r in big_chunks)
