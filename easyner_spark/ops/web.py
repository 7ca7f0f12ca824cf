"""Web-corpus column functions: URL canonicalization and host/domain parsing.

The north-star input is an Iceberg table of Common-Crawl-style pages
keyed by url; before any dedup or latest-crawl-wins logic the url must
be canonicalized (tracking params, casing, default ports, trailing
slashes all produce distinct keys for the same page). The reference
repo never faces this (it ingests PubMed ids), so these are new-in-
target, mandated by the web-scale tier.

Everything here is a pure JVM ``Column`` expression chain — regexes run
inside whole-stage codegen, no Python crosses the row path. Each rule
is mirrored 1:1 in the SQL oracles (DuckDB ``regexp_replace`` needs the
``'g'`` flag to match Spark's global-by-default semantics, and
replacement backreferences are avoided entirely because the two engines
spell them differently: ``$1`` vs ``\\1``).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_SCHEME_HOST = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL. Rules, in order:

    1. drop the fragment;
    2. drop ``utm_*`` tracking params (mid-list, first-with-more, only);
    3. lowercase the scheme+authority, strip default ports :80/:443;
    4. drop a trailing slash (also directly before ``?``);
    5. drop a dangling ``?`` / ``&``.
    """
    u = F.regexp_replace(url, "#.*$", "")
    u = F.regexp_replace(u, "&utm_[^&]*", "")
    u = F.regexp_replace(u, "\\?utm_[^&]*&", "?")
    u = F.regexp_replace(u, "\\?utm_[^&]*$", "")
    sh = F.regexp_extract(u, _SCHEME_HOST, 0)
    rest = F.regexp_replace(u, _SCHEME_HOST, "")
    u = F.concat(F.regexp_replace(F.lower(sh), ":(80|443)$", ""), rest)
    u = F.regexp_replace(u, "/\\?", "?")
    u = F.regexp_replace(u, "/$", "")
    return F.regexp_replace(u, "[?&]$", "")


def url_host(url: Column) -> Column:
    """Lowercased hostname (authority without port)."""
    return F.lower(F.regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)", 1))


def registered_domain(host: Column) -> Column:
    """Naive registered domain: the last two dot-labels (a real
    deployment swaps in the public-suffix list; the plumbing — group
    keys, partitioning — is identical)."""
    return F.regexp_extract(host, "[^.]+\\.[^.]+$", 0)
