"""Overlapping-window chunking (operators/curation.py
split_overlapping_chunks): hand cases, containment-drop rule, and the
reconstruction property on random docs."""

import pytest
from pyspark.sql import functions as F

from sketches_rust_spark.operators.curation import split_overlapping_chunks


def _chunks(spark, texts, chunk, overlap):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string")
    out = split_overlapping_chunks(df, chunk_tokens=chunk,
                                   overlap_tokens=overlap)
    rows = out.orderBy("doc_id", "chunk_id").collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    return by_doc


def test_hand_case(spark):
    # 10 tokens, chunk=4, overlap=1 -> stride 3: starts 0,3,6 (9 dropped:
    # its only content is token j, already the tail of the 6-chunk)
    doc = "a b c d e f g h i j"
    got = _chunks(spark, [doc], 4, 1)[0]
    assert [r["chunk_text"] for r in got] == ["a b c d", "d e f g", "g h i j"]
    assert [r["chunk_id"] for r in got] == [0, 1, 2]
    assert [r["n_chunk_tokens"] for r in got] == [4, 4, 4]


def test_short_doc_single_chunk(spark):
    got = _chunks(spark, ["x y"], 4, 1)[0]
    assert [r["chunk_text"] for r in got] == ["x y"]
    assert got[0]["n_chunk_tokens"] == 2


def test_contained_trailing_chunk_dropped(spark):
    # 7 tokens, chunk=6, overlap=2 -> stride 4: start 4 has 4+2<7 -> kept
    # (adds token g). 8 tokens, chunk=6, overlap=4 -> stride 2: starts 4
    # and 6 both have start+overlap >= 8, i.e. ZERO new tokens beyond the
    # previous chunk's tail -> dropped; token h is already covered by the
    # start-2 chunk.
    got = _chunks(spark, ["a b c d e f g"], 6, 2)[0]
    assert [r["chunk_text"] for r in got] == ["a b c d e f", "e f g"]
    got2 = _chunks(spark, ["a b c d e f g h"], 6, 4)[0]
    assert [r["chunk_text"] for r in got2] == [
        "a b c d e f", "c d e f g h"]


def test_reconstruction_property(spark):
    """chunk0 + (each later chunk minus its first `overlap` tokens)
    rebuilds the exact original text."""
    import random
    rng = random.Random(7)
    texts = [" ".join(f"w{rng.randrange(50)}" for _ in range(n))
             for n in [1, 3, 9, 10, 11, 31, 64, 100, 257]]
    for chunk, overlap in [(4, 1), (8, 3), (16, 0), (256, 32)]:
        by_doc = _chunks(spark, texts, chunk, overlap)
        for i, text in enumerate(texts):
            parts = []
            for r in by_doc[i]:
                ts = r["chunk_text"].split(" ")
                parts.extend(ts if r["chunk_id"] == 0 else ts[overlap:])
            assert " ".join(parts) == text, (chunk, overlap, i)


def test_param_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id int, text string")
    with pytest.raises(ValueError):
        split_overlapping_chunks(df, chunk_tokens=4, overlap_tokens=4)


def test_no_shuffle(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    plan = (split_overlapping_chunks(df, 4, 1)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_chunk_stats_matches_duckdb_oracle(spark):
    """chunk_stats and its from-scratch DuckDB recomputation must agree on
    adversarial sizes (single-token, exact-boundary, drop-rule-triggering,
    long docs) — the same pair the driver compares on the documents table."""
    import random

    import duckdb

    from sketches_rust_spark.operators.curation import (
        chunk_stats,
        chunk_stats_oracle_sql,
    )

    rng = random.Random(11)
    texts = [" ".join(f"w{rng.randrange(40)}" for _ in range(n))
             for n in [1, 7, 8, 9, 15, 16, 17, 23, 24, 25, 31, 32, 33,
                       48, 100, 257]]
    rows = [(i, t) for i, t in enumerate(texts)] + [(999, None)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = (chunk_stats(df, chunk_tokens=24, overlap_tokens=8)
           .orderBy("n_chunks").toPandas())

    con = duckdb.connect()
    con.register("docs_df", df.toPandas())
    want = con.execute(
        chunk_stats_oracle_sql("docs_df", chunk_tokens=24, overlap_tokens=8)
        + " ORDER BY n_chunks").df()
    assert got.shape == want.shape and len(got) >= 3
    for c in got.columns:
        assert list(got[c]) == list(want[c]), c


def test_null_text_yields_no_chunks(spark):
    """NULL-text docs vanish from the exploded output (documented) —
    previously they produced a phantom chunk with n_chunk_tokens ==
    chunk_tokens."""
    df = spark.createDataFrame([(1, None), (2, "a b c")],
                               "doc_id int, text string")
    rows = split_overlapping_chunks(df, 4, 1).collect()
    assert {r["doc_id"] for r in rows} == {2}
