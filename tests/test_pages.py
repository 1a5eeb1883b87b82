"""Synthetic pages-table fixtures (FIXTURES.md §1/§5): determinism, skew,
grouped sketching, merge invariance, salting identity on the real input
shape from BASELINE.json input_hint."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from sketches_rust_spark.functions.ddsketch_spark import (
    SketchConfig,
    ddsketch_aggregate,
    ddsketch_aggregate_salted,
)
from sketches_rust_spark.functions.ddsketch_sql import ddsketch_quantiles_sql
from sketches_rust_spark.sources.pages import LANGS, _block_arrays, pages_table

CFG = SketchConfig("logarithmic_unbounded_size_dense_store", 0.01, 0)


@pytest.fixture(scope="module")
def pages(spark, tmp_path_factory):
    cache = str(tmp_path_factory.mktemp("pages_cache"))
    return pages_table(spark, 20_000, cache_dir=cache)


def test_schema_matches_input_hint(pages):
    assert [(f.name, f.dataType.simpleString()) for f in pages.schema.fields] == [
        ("url", "string"), ("warc_ts", "timestamp"),
        ("html", "binary"), ("text", "string"), ("lang", "string")]


def test_generation_deterministic_per_url():
    """input_hint per-row invariant: byte-identical text per url, every run."""
    a = _block_arrays(0, 1000)
    b = _block_arrays(0, 1000)
    assert a[0] == b[0]            # urls
    assert a[3] == b[3]            # texts
    assert a[2] == b[2]            # html bytes


def test_lang_and_host_skew(pages):
    counts = {r["lang"]: r["n"] for r in
              pages.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert counts["en"] / total > 0.35  # zipfian head
    assert set(counts) <= set(LANGS.tolist())
    hosts = (pages.select(F.regexp_extract("url", r"https://(host\d+)", 1).alias("h"))
             .groupBy("h").count().orderBy(F.desc("count")).limit(1).collect())
    assert hosts[0]["count"] / total > 0.02  # hot host exists


def test_html_derives_from_text(pages):
    row = pages.select("text", "html").first()
    assert bytes(row["html"]) == f"<html><body>{row['text']}</body></html>".encode()


def test_grouped_sketch_per_lang_and_day(spark, pages):
    feats = pages.select(
        "lang", F.date_format(F.to_date("warc_ts"), "yyyy-MM-dd").alias("day"),
        F.length("text").cast("double").alias("v"))
    out = ddsketch_quantiles_sql(feats, "v", ["lang", "day"],
                                 {"p50": 0.5, "p99": 0.99}, CFG).toPandas()
    assert out["day"].nunique() == 30
    assert set(out["lang"].unique()) <= set(LANGS.tolist())
    # error bound vs exact per the biggest group
    pdf = feats.toPandas()
    grp = pdf[(pdf.lang == "en")]
    biggest_day = grp.groupby("day").size().idxmax()
    vals = np.sort(grp[grp.day == biggest_day]["v"].to_numpy())
    est = float(out[(out.lang == "en") & (out.day == biggest_day)]["p50"].iloc[0])
    exact = vals[int(0.5 * (len(vals) - 1))]
    assert abs(est - exact) / exact <= CFG.new().index_mapping.relative_accuracy * 1.01


def test_salted_equals_unsalted_on_skewed_pages(spark, pages):
    """The north-rule skew story on the real input shape: explicit
    deterministic salting of the zipfian lang key is lossless."""
    feats = pages.select("lang", F.length("text").cast("double").alias("v"),
                         "url")
    plain = ddsketch_aggregate(feats, "v", ["lang"], CFG)
    salted = ddsketch_aggregate_salted(feats, "v", ["lang"], CFG,
                                       num_salts=16, salt_from="url")
    a = {r["lang"]: bytes(r["sketch"]) for r in plain.collect()}
    b = {r["lang"]: bytes(r["sketch"]) for r in salted.collect()}
    assert a == b


def test_merge_invariance_across_repartition(spark, pages):
    feats = pages.select("lang", F.length("text").cast("double").alias("v"))
    blobs = []
    for k in (1, 4, 16):
        agg = ddsketch_aggregate(feats.repartition(k), "v", ["lang"], CFG)
        blobs.append({r["lang"]: bytes(r["sketch"]) for r in agg.collect()})
    assert blobs[0] == blobs[1] == blobs[2]
