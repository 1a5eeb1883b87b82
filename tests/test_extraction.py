"""HTML -> text extraction (operators/extraction.py): the input_hint
per-row invariant (byte-identical extracted text per url), JVM/pandas
engine equivalence on adversarial html, and the north-star feature triple
computed from raw html."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sketches_rust_spark.operators.extraction import (
    _normalize_html_series,
    extract_text_from_html,
    page_features,
)
from sketches_rust_spark.sources.pages import pages_table


@pytest.fixture(scope="module")
def pages(spark, tmp_path_factory):
    cache = str(tmp_path_factory.mktemp("pages_cache"))
    return pages_table(spark, 20_000, cache_dir=cache)


@pytest.mark.parametrize("engine", ["jvm", "pandas"])
def test_extraction_byte_identical_per_url(pages, engine):
    """input_hint invariant: extract(html) == stored reference text for
    EVERY url, checked engine-side (no row transfer)."""
    ext = extract_text_from_html("html", engine=engine)
    mismatches = pages.where(~(ext.eqNullSafe(F.col("text")))).count()
    assert mismatches == 0


# (html, expected extracted text) — the deterministic normalization spec
_CASES = [
    (b"<html><body>plain words here</body></html>", "plain words here"),
    # adjacent tags must not merge tokens
    (b"<p>alpha</p><p>beta</p>", "alpha beta"),
    # script/style content dropped, case-insensitive, with attributes
    (b"<SCRIPT type='x'>var a = '<p>not text</p>';</SCRIPT>kept", "kept"),
    (b"<style>.c{color:red}</style><div>body text</div>", "body text"),
    # entities, incl the double-escape trap: &amp;lt; is LITERAL "&lt;"
    (b"a &lt;b&gt; &quot;c&quot; &#39;d&#39; &amp; e &amp;lt;", 'a <b> "c" \'d\' & e &lt;'),
    # &nbsp; and whitespace runs collapse to single spaces
    (b"x&nbsp;&nbsp;y\n\n\t z", "x y z"),
    # malformed utf-8 -> U+FFFD in both engines
    (b"ok \xff\xfe end", "ok �� end"),
    (b"", ""),
    (b"   \n\t  ", ""),
    (b"<br><br/>just<hr>breaks", "just breaks"),
    # Unicode whitespace must collapse IDENTICALLY in both engines (Java
    # \\s is ASCII-only; the explicit _WS_CLASS closes the gap): ideographic
    # space U+3000, line separator U+2028, NEL U+0085, en-space U+2002
    ("a\u3000b\u2028c\u0085d\u2002e".encode("utf-8"), "a b c d e"),
    ("\u3000<p>zh\u3000ja</p>\u3000".encode("utf-8"), "zh ja"),
    (None, None),
]


def test_engines_agree_on_adversarial_html(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(_CASES)], "i int, html binary")
    out = (df.select(
        "i",
        extract_text_from_html("html", engine="jvm").alias("j"),
        extract_text_from_html("html", engine="pandas").alias("p"))
        .orderBy("i").collect())
    for row, (_, expected) in zip(out, _CASES):
        assert row["j"] == expected, f"jvm case {row['i']}"
        assert row["p"] == expected, f"pandas case {row['i']}"


def test_pandas_engine_full_entity_coverage():
    """Beyond the JVM subset: numeric/hex/exotic named entities resolve in
    the pandas engine (the parser seam) — documented divergence, so these
    inputs are NOT in the cross-engine agree-set."""
    s = pd.Series([b"x &#x27;quoted&#x27; &eacute; &#8212; y"])
    assert _normalize_html_series(s).iloc[0] == "x 'quoted' é — y"


def test_page_features_from_raw_html_match_stored_text(pages):
    """The north-star feature triple computed FROM html equals the same
    features over the stored reference text, for every row."""
    feats = page_features(pages, engine="jvm", keep_cols=("url", "lang"))
    ref = pages.select(
        "url",
        F.length("text").cast("double").alias("r_text_len"),
        F.size(F.split("text", " ")).cast("double").alias("r_token_count"),
        F.length("html").cast("double").alias("r_html_bytes"))
    joined = feats.join(ref, "url")
    bad = joined.where(
        (F.col("text_len") != F.col("r_text_len"))
        | (F.col("token_count") != F.col("r_token_count"))
        | (F.col("html_bytes") != F.col("r_html_bytes"))).count()
    assert bad == 0
    assert feats.count() == pages.count()


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False

if _HAVE_HYPOTHESIS:
    _word = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1,
                    max_size=8)

    @given(st.data())
    @settings(max_examples=60, deadline=None)
    def test_normalizer_recovers_text_property(data):
        """Property: ANY word sequence survives arbitrary block-tag
        segmentation, attribute noise, script/style insertions, and
        inter-tag whitespace runs (incl. U+3000/NBSP) — extraction returns
        exactly the single-space-joined words (the canonicalizing spec)."""
        words = data.draw(st.lists(_word, min_size=1, max_size=40))
        parts, i = [], 0
        while i < len(words):
            j = data.draw(st.integers(min_value=i + 1,
                                      max_value=len(words)))
            tag = data.draw(st.sampled_from(["p", "div", "span", "li", "h1"]))
            attr = data.draw(st.sampled_from(["", " class='x'", " id=\"y\""]))
            ws = data.draw(st.sampled_from(
                ["", " ", "\n", "\t\t", "\u3000", "\xa0"]))
            noise = data.draw(st.sampled_from(
                ["", "<script>var x = '<b>no</b>';</script>",
                 "<style>.a{}</style>"]))
            parts.append(f"<{tag}{attr}>{' '.join(words[i:j])}</{tag}>"
                         f"{ws}{noise}")
            i = j
        html = f"<html><body>{''.join(parts)}</body></html>".encode()
        out = _normalize_html_series(pd.Series([html])).iloc[0]
        assert out == " ".join(words)
else:  # pragma: no cover - surface the gap as a VISIBLE skip, never silence
    @pytest.mark.skip(reason="hypothesis not installed")
    def test_normalizer_recovers_text_property():
        pass


def test_jvm_extraction_stays_in_codegen(pages):
    """Scale property: the jvm engine adds ZERO Python operators — the
    plan has no ArrowEvalPython / BatchEvalPython node."""
    plan = (pages.select(extract_text_from_html("html", engine="jvm"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan
