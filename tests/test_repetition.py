"""Intra-document repetition metrics (operators/text.py repetition_stats):
hand-computed ratios on crafted docs, short-doc edges, plan purity."""

import pytest

from sketches_rust_spark.operators.text import repetition_stats

# (doc_id, text, dup_line_frac, dup_token_frac, top_ngram_char_frac)
_CASES = [
    # 4 lines, "same line" twice -> 1/4 dup lines
    (1, "same line\nother a\nsame line\nlast b",
     0.25, None, None),
    # "spam ham" repeated 4x: 8 tokens, 2 distinct -> dup_token 6/8;
    # top 2-gram: "spam ham" freq 4, len 8 -> 32 of 35 chars
    (2, "spam ham spam ham spam ham spam ham",
     0.0, 0.75, round(32 / 35, 6)),
    # all-unique tokens: zero dups; the freq x length rule picks the
    # LONGEST 2-gram when all frequencies are 1 ("gamma delta", 11 chars)
    (3, "alpha beta gamma delta",
     0.0, 0.0, round(len("gamma delta") / len("alpha beta gamma delta"), 6)),
    # single token: no 2-grams at all
    (4, "solo", 0.0, 0.0, 0.0),
    (5, "", None, None, 0.0),
]


@pytest.fixture(scope="module")
def rows(spark):
    df = spark.createDataFrame([(i, t) for i, t, *_ in _CASES],
                               "doc_id int, text string")
    return {r["doc_id"]: r for r in repetition_stats(df).collect()}


def test_dup_line_frac(rows):
    assert rows[1]["dup_line_frac"] == 0.25
    assert rows[2]["dup_line_frac"] == 0.0


def test_dup_token_frac(rows):
    assert rows[2]["dup_token_frac"] == 0.75
    assert rows[3]["dup_token_frac"] == 0.0


def test_top_ngram_char_frac(rows):
    assert rows[2]["top_ngram_char_frac"] == round(32 / 35, 6)
    assert rows[3]["top_ngram_char_frac"] == round(11 / 22, 6)
    assert rows[4]["top_ngram_char_frac"] == 0.0  # shorter than the n-gram
    assert rows[5]["top_ngram_char_frac"] == 0.0  # empty text


def test_pure_projection(spark):
    df = spark.createDataFrame([(1, "a b a b")], "doc_id int, text string")
    plan = (repetition_stats(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_null_text_propagates(spark):
    """NULL text -> all three metrics NULL (module NULL discipline; the
    DuckDB oracle side returns NULL for missing docs too)."""
    df = spark.createDataFrame([(1, None), (2, "a b")],
                               "doc_id int, text string")
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert rows[1]["dup_line_frac"] is None
    assert rows[1]["dup_token_frac"] is None
    assert rows[1]["top_ngram_char_frac"] is None
    assert rows[2]["dup_token_frac"] == 0.0


def test_overlapping_self_repeat_can_exceed_one(spark):
    """'a a a a a a' (11 chars): bigram 'a a' occurs 5x overlapping ->
    freq x len = 15 -> ratio 15/11 > 1, by documented design (maximal
    repetition signal; consumers must not clamp)."""
    df = spark.createDataFrame([(1, "a a a a a a")], "doc_id int, text string")
    r = repetition_stats(df).collect()[0]
    assert r["top_ngram_char_frac"] == round(15 / 11, 6)
