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
    """Scale property: the boilerplate set is removed with a LeftAnti join
    whose build side is the (small) boilerplate set; at this size AQE
    converts it to a broadcast at RUNTIME (the hint is deliberately not
    forced — an unconditional broadcast would OOM on a whole-crawl corpus
    where the set grows with the number of sites; past the threshold the
    shuffled anti-join is the correct plan)."""
    df = spark.createDataFrame(_DOCS, "doc_id int, text string")
    out = remove_boilerplate_lines(df, 2)
    out.collect()  # materialize so AQE finalizes the join strategy
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan  # AQE's runtime choice at this size


def test_shuffled_anti_join_regime_same_output(spark):
    """The documented 100-TB behavior, actually executed: when the
    boilerplate set exceeds autoBroadcastJoinThreshold (here lowered to
    1 byte so ANY build side exceeds it), the anti-join must fall back to
    a SHUFFLED join — and produce byte-identical output to the broadcast
    regime. This is the regime a whole-crawl corpus (boilerplate set grows
    with #sites) actually runs in."""
    df = spark.createDataFrame(_DOCS, "doc_id int, text string")

    out_b = remove_boilerplate_lines(df, 2)
    want = {(r["doc_id"], r["cleaned"], r["lines_kept"])
            for r in out_b.collect()}

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1b")
    try:
        out_s = remove_boilerplate_lines(df, 2)
        got = {(r["doc_id"], r["cleaned"], r["lines_kept"])
               for r in out_s.collect()}
        plan = out_s._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    # post-execution (AQE-final) plan: anti join present, NOT broadcast
    anti_lines = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
    assert anti_lines, plan
    assert all("Broadcast" not in ln for ln in anti_lines), anti_lines
    assert got == want


def test_null_text_propagates(spark):
    """NULL text stays NULL (distinguishable from an all-boilerplate doc,
    which comes back as '')."""
    df = spark.createDataFrame(
        [(1, None), (2, "x\nBOILER"), (3, "BOILER"), (4, "BOILER")],
        "doc_id int, text string")
    rows = {r["doc_id"]: r
            for r in remove_boilerplate_lines(df, 2).collect()}
    assert rows[1]["cleaned"] is None and rows[1]["lines_kept"] is None
    assert rows[3]["cleaned"] == "" and rows[3]["lines_kept"] == 0
