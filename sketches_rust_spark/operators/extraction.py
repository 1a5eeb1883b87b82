"""HTML -> text extraction over the Common-Crawl-style ``pages`` table.

North-star coverage (BASELINE.json): the flagship sketches summarize
per-document numeric features — *extracted* text length, token count, html
byte size — so the pipeline must include the extraction stage itself, not
just read a pre-extracted ``text`` column. input_hint pins the per-row
invariant: byte-identical extracted text per url. The driver query
(``pages_extract_features_quantiles``) runs this extractor over the raw
``html`` binary while its DuckDB oracle reads the fixture's stored ``text``
column; the value-hash match is therefore an end-to-end proof that the
extractor reproduces the reference text byte-for-byte.

Two engines, same normalized output:

- ``engine='jvm'`` (default): a chained ``regexp_replace`` pipeline that
  stays entirely inside whole-stage codegen — zero Python crossings, so
  extraction fuses with the downstream feature projection and sketch build
  into one codegen stage per task.
- ``engine='pandas'``: an Arrow-batched pandas UDF (input_hint: vectorized
  pandas/Arrow UDFs, never per-row Python) using ``html.unescape`` for full
  entity coverage. This is the seam where a real DOM parser
  (selectolax / trafilatura / resiliparse) plugs in on a cluster that has
  the dependency; the sandbox keeps the pure-stdlib normalizer so the two
  engines are provably equivalent on the supported subset (pytest
  ``test_extraction.py::test_engines_agree``).

Normalization rule (deterministic, the "extraction spec"):
  1. decode UTF-8, malformed bytes -> U+FFFD (both engines);
  2. drop <script>/<style> elements including their content;
  3. drop all remaining tags, each replaced by one space (so adjacent
     text nodes never merge into one token);
  4. unescape entities (jvm: the common named five + &nbsp;; pandas: full
     html.unescape — identical on the common subset, covered by tests);
  5. collapse runs of the explicit whitespace class ``_WS_CLASS``
     (ASCII ws + NEL + NBSP + Unicode Zs/Zl/Zp) to one space and trim.

Steps 3+5 mean the extractor is *canonicalizing*: reference texts that are
already single-space-normalized (the pages fixture, and Common-Crawl WET
text) round-trip byte-identically; that is exactly the input_hint contract.

Measured (BENCH/BASELINE.md, 4M pages, taskset 2 vs 8 cores): BOTH engines
clear the >=0.8 scaling bar — jvm 0.88, pandas 0.92 — and the pandas engine
is ~20% FASTER absolutely (Python's compiled regex beats java.util.regex on
this pattern mix by more than the Arrow crossing costs). Choose jvm when
the cluster's Python workers are the bottleneck or to keep the stage fused;
choose pandas for raw extraction throughput or when swapping in a real
parser.
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Whitespace is matched by an EXPLICIT character class, never backslash-s:
# Java's \s is ASCII-only while Python's is full-Unicode, so a shared "\s"
# pattern string would make the two engines diverge on U+3000 (ideographic
# space -- ubiquitous in zh/ja pages), U+2028, U+0085, ... . Python expands
# the escapes below, so BOTH regex dialects receive the same literal
# characters (ASCII ws + NEL + NBSP + U+1680 + Unicode Zs/Zl/Zp) and match
# identically (locked by test_engines_agree_on_adversarial_html).
_WS_CLASS = ("[\t\n\x0b\f\r \x1c\x1d\x1e\x1f\x85\xa0"
             "\u1680\u2000-\u200a\u2028\u2029\u202f\u205f\u3000]")

# one space per tag so "a</p><p>b" keeps two tokens; collapsed later
_SCRIPT_STYLE = r"(?is)<(script|style)\b[^>]*>.*?</\1" + _WS_CLASS + "*>"
_TAG = r"(?s)<[^>]*>"
_WS = _WS_CLASS + "+"

# named entities the JVM chain handles; &amp; must be LAST so that
# "&amp;lt;" correctly becomes the literal "&lt;" (double-escape safety)
_JVM_ENTITIES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "),
    ("&amp;", "&"),
]

_SCRIPT_STYLE_RE = re.compile(_SCRIPT_STYLE)
_TAG_RE = re.compile(_TAG)
_WS_RE = re.compile(_WS)


def extract_text_from_html(col: Column | str, engine: str = "jvm") -> Column:
    """Extracted text column from an html ``binary`` column.

    jvm: whole-stage-codegen regexp chain (scale path).
    pandas: Arrow-batched UDF with stdlib html.unescape (parser seam).
    """
    c = F.col(col) if isinstance(col, str) else col
    if engine == "jvm":
        # decode() throws MALFORMED_CHARACTER_CODING on bad bytes in Spark 4;
        # cast + make_valid_utf8 gives Python bytes.decode('utf-8','replace')
        # semantics (one U+FFFD per maximal invalid subpart) — verified
        # against the pandas engine in test_engines_agree_on_adversarial_html
        s = F.make_valid_utf8(c.cast("string"))
        # two passes, mirroring the pandas engine. A fused single-pass
        # alternation (_SCRIPT_STYLE + "|" + _TAG) is semantically
        # identical (verified 0/20k mismatches) but measured NO faster at
        # 4M pages — the saved string scan is repaid in per-tag alternation
        # attempts — so the structurally-parallel form is kept
        s = F.regexp_replace(s, _SCRIPT_STYLE, " ")
        s = F.regexp_replace(s, _TAG, " ")
        for ent, rep in _JVM_ENTITIES:
            s = F.replace(s, F.lit(ent), F.lit(rep))
        return F.trim(F.regexp_replace(s, _WS, " "))
    if engine == "pandas":
        return _extract_pandas(c)
    raise ValueError(f"engine must be 'jvm' or 'pandas', got {engine!r}")


def _normalize_html_series(s: pd.Series) -> pd.Series:
    txt = s.map(lambda b: b.decode("utf-8", "replace")
                if b is not None else None)
    txt = txt.str.replace(_SCRIPT_STYLE_RE, " ", regex=True)
    txt = txt.str.replace(_TAG_RE, " ", regex=True)
    txt = txt.map(lambda t: _html.unescape(t) if t is not None else None)
    return txt.str.replace(_WS_RE, " ", regex=True).str.strip()


def _extract_pandas(c: Column) -> Column:
    # udf created at call time: the decorator parses the return-type DDL
    # against the ACTIVE session, so it cannot run at module import
    @F.pandas_udf("string")
    def _extract(s: pd.Series) -> pd.Series:
        return _normalize_html_series(s)

    return _extract(c)


def page_features(pages: DataFrame, engine: str = "jvm",
                  keep_cols: tuple[str, ...] = ("url", "lang")) -> DataFrame:
    """The north-star per-document feature triple, computed from raw html.

    Output: keep_cols + (text_len, token_count, html_bytes) as doubles —
    the exact columns the flagship grouped sketches consume. token_count
    matches the repo-wide whitespace-token convention
    (multi_feature_query / DuckDB ``len(string_split(text, ' '))``:
    empty text counts 1).

    ENGINE DIVERGENCE (choose deliberately): the two engines agree on the
    fixture's entity subset (locked by tests) but NOT on arbitrary crawl
    HTML — ``jvm`` unescapes only the six ``_JVM_ENTITIES`` named forms
    with mandatory semicolons, while ``pandas`` uses stdlib
    ``html.unescape`` (~2k named entities, plus semicolon-less legacy
    forms like ``&amp`` / ``&lt``). On organic pages containing e.g.
    ``&mdash;`` or a bare ``&amp``, text_len/token_count differ between
    engines. When cross-engine determinism matters, pick ONE engine for
    the whole pipeline (or pre-normalize entities upstream).
    """
    ext = extract_text_from_html("html", engine=engine).alias("_t")
    return (pages
            .select(*keep_cols, ext, F.col("html"))
            .select(
                *keep_cols,
                F.length("_t").cast("double").alias("text_len"),
                F.size(F.split("_t", " ")).cast("double").alias("token_count"),
                F.length("html").cast("double").alias("html_bytes"),
            ))
