"""PII detection + redaction — a first-class training-data curation stage.

Web-scale corpora ship emails, phone numbers, IPs and URLs that must be
scrubbed before training. This operator does it entirely JVM-side: one
chained ``regexp_count`` + ``regexp_replace`` pipeline per kind, fused into
whole-stage codegen with whatever projection follows — zero Python
crossings, no extra shuffle (it is a pure map).

Redaction order matters and is fixed (``PII_KINDS``): URLs first (greedy to
whitespace, may contain digits/dots that would otherwise look like IPs),
then emails, then IPv4s, then phone numbers. Counts are taken on the
*progressively redacted* text, so a span can only ever be counted once.

Correctness strategy (the fixture has no organic PII — digits and '@' are
absent from ``documents.text`` by construction, see FIXTURES.md): the
driver query plants deterministic PII spans derived from ``doc_id`` and the
DuckDB oracle recomputes the expected counts AND the exact post-redaction
length arithmetic from the planting rule alone — no regex on the oracle
side. An over-match (regex eats a neighboring word) or under-match (a
planted span survives) changes ``len_after`` and breaks the hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java-regex flavor (Spark's regexp_* functions). Order is semantic — see
# module docstring.
#
# Precision notes (matters on ORGANIC corpora, not the planted fixture):
# ipv4 octets are range-checked (0-255), so 999.999.999.999 is NOT an IP —
# but syntactically-valid dotted quads that are semantically version
# strings ("release 1.2.3.4") still match; no regex can tell them apart,
# so redaction deliberately over-matches there (safe direction for PII).
# phone is the NANP-ish 3-3-4 shape only; international formats
# (+44 20 7946 0958) are out of scope and pass through un-redacted.
# leading zeros allowed (a real IP renders as 192.168.001.100 in padded
# logs); the VALUE is still range-checked to 0-255
_OCTET = r"0*(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
PII_KINDS: list[tuple[str, str, str]] = [
    ("url", r"https?://[^\s]+", "[URL]"),
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9-]+(\.[a-zA-Z0-9-]+)+", "[EMAIL]"),
    ("ipv4", rf"\b({_OCTET}\.){{3}}{_OCTET}\b", "[IP]"),
    ("phone", r"\b\d{3}[- ]\d{3}[- ]\d{4}\b", "[PHONE]"),
]


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = "redacted") -> DataFrame:
    """Adds ``out_col`` (redacted text) and one ``n_<kind>`` count column
    per PII kind. Pure projection: no shuffle, no Python."""
    cur: Column = F.col(text_col)
    counts = []
    for kind, pat, token in PII_KINDS:
        counts.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{kind}"))
        cur = F.regexp_replace(cur, pat, token)
    return df.select("*", *counts, cur.alias(out_col))
