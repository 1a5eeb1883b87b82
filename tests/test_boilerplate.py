"""Line-level boilerplate removal (operators/text.py): threshold edge,
order preservation, all-boilerplate docs, and the broadcast-anti-join
plan shape."""

from pyspark.sql import functions as F

from sketches_rust_spark.operators.text import remove_boilerplate_lines

_DOCS = [
    # "BOILER" appears in 3 docs (> max_line_df=2) -> removed everywhere;
    # "EDGE" appears in exactly 2 docs (== max) -> KEPT (cap is inclusive)
    (1, "alpha one\nBOILER\nbeta two"),
    (2, "BOILER\ngamma three\nEDGE"),
    (3, "BOILER"),                      # every line boilerplate -> ''
    (4, "delta four\nEDGE"),
    (5, "epsilon five\nepsilon five"),  # intra-doc duplicate, df=1 -> kept twice
]


def _clean(spark, max_line_df=2):
    df = spark.createDataFrame(_DOCS, "doc_id int, text string")
    out = remove_boilerplate_lines(df, max_line_df)
    return {r["doc_id"]: r for r in out.collect()}


def test_removal_and_order(spark):
    rows = _clean(spark)
    assert rows[1]["cleaned"] == "alpha one\nbeta two"
    assert rows[1]["lines_kept"] == 2
    assert rows[2]["cleaned"] == "gamma three\nEDGE"


def test_threshold_is_inclusive(spark):
    rows = _clean(spark)
    assert "EDGE" in rows[4]["cleaned"]


def test_all_boilerplate_doc_survives_empty(spark):
    rows = _clean(spark)
    assert rows[3]["cleaned"] == ""
    assert rows[3]["lines_kept"] == 0
    assert len(rows) == len(_DOCS)      # no doc dropped


def test_intra_doc_duplicates_kept(spark):
    rows = _clean(spark)
    assert rows[5]["cleaned"] == "epsilon five\nepsilon five"
    assert rows[5]["lines_kept"] == 2


def test_broadcast_anti_join_plan(spark):
    """Scale property: the corpus is never shuffled on the line key — the
    boilerplate set is broadcast and removed with a LeftAnti join."""
    df = spark.createDataFrame(_DOCS, "doc_id int, text string")
    plan = (remove_boilerplate_lines(df, 2)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
