"""URL canonicalization — the dedup key of every web-crawl pipeline.

Crawls see the same page under many spellings (case-insensitive scheme and
host, explicit default ports, fragments, tracking parameters, shuffled
query-parameter order). Canonicalizing before URL-level dedup or host
aggregation is therefore a core curation stage.

Everything is built-in Spark column expressions — regexp piece-extraction
plus higher-order array functions (`filter` / `array_sort` / `array_join`)
for the query string — so the operator stays inside whole-stage codegen:
a pure projection, zero Python, zero shuffles.

Canonicalization rule (deterministic):
  1. scheme and host lowercase;
  2. default port stripped (http:80 / https:443), other ports kept;
  3. fragment (#...) dropped;
  4. tracking parameters dropped (utm_*, gclid, fbclid, msclkid, ref);
  5. remaining query parameters sorted bytewise and re-joined with '&'
     (query dropped entirely if nothing remains);
  6. empty path becomes '/'.

Correctness: the driver query (`url_canonicalize_stats`) plants
deterministic noisy variants of the already-canonical pages urls (upper
case, :443, fragments, tracking params, shuffled param order) and the
DuckDB oracle computes the EXPECTED canonical form per planting class with
plain string arithmetic — no URL logic on the oracle side — so an over- or
under-normalization breaks the hash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# dropped query parameters: the ad-tech tracking set
_TRACKING_RE = "^(?i)(utm_[^=]*|gclid|fbclid|msclkid|ref)(=|$)"


def canonicalize_url(col: Column | str) -> Column:
    """Canonical form of a URL column per the module's rule; pure codegen
    projection.

    Scope: absolute URLs (``scheme://...``). Inputs WITHOUT a scheme
    (protocol-relative ``//host/x``, bare ``host/x``) pass through
    UNCHANGED — mangling them into garbage keys would be worse than not
    canonicalizing; normalize relative hrefs against their base before
    calling this. Userinfo (``user:pass@host``) is stripped, and IPv6
    bracket literals keep their brackets with the port parsed after
    ``]``."""
    c = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(c, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    rest = F.regexp_replace(rest, r"#.*$", "")          # 3. fragment
    authority = F.regexp_extract(rest, r"^([^/?]+)", 1)
    pathq = F.regexp_replace(rest, r"^[^/?]+", "")
    # strip userinfo (no '/' can appear in authority by construction)
    hostport = F.regexp_replace(authority, r"^[^@]*@", "")
    is_v6 = hostport.startswith("[")
    host = F.lower(F.when(
        is_v6, F.regexp_extract(hostport, r"^(\[[^\]]*\])", 1)
    ).otherwise(F.regexp_extract(hostport, r"^([^:]+)", 1)))
    port = F.when(
        is_v6, F.regexp_extract(hostport, r"\]:(\d+)$", 1)
    ).otherwise(F.regexp_extract(hostport, r"^[^:]*:(\d+)$", 1))
    port_part = F.when(
        (port == F.lit(""))
        | ((scheme == F.lit("http")) & (port == F.lit("80")))
        | ((scheme == F.lit("https")) & (port == F.lit("443"))),
        F.lit("")).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != F.lit("")) & ~p.rlike(_TRACKING_RE))
    qstr = F.when(F.size(kept) > 0,
                  F.concat(F.lit("?"), F.array_join(F.array_sort(kept), "&"))
                  ).otherwise(F.lit(""))
    path_norm = F.when(path == F.lit(""), F.lit("/")).otherwise(path)
    canon = F.concat(scheme, F.lit("://"), host, port_part, path_norm, qstr)
    # schemeless input -> passthrough (see docstring)
    return F.when(scheme == F.lit(""), c).otherwise(canon)
