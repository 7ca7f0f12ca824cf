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
    2. drop ``utm_*`` tracking params — applied to the query string
       only (split off at the first ``?``), never to the path: a
       literal ``&utm_`` in a path segment (legal per RFC 3986
       sub-delims) must not truncate it;
    3. lowercase the scheme+authority; strip the default port only for
       its own scheme (https :443 / http :80 — http-on-443 is a
       DIFFERENT resource and keeps its port);
    4. drop a trailing slash (also directly before ``?``);
    5. drop a dangling ``?`` / ``&``.
    """
    u = F.regexp_replace(url, "#.*$", "")
    path = F.regexp_replace(u, "\\?.*$", "")
    q = F.regexp_extract(u, "\\?.*$", 0)
    # query-only rules: utm params, then a dangling ?/& — never touch
    # slashes or ampersands inside query VALUES
    q = F.regexp_replace(q, "&utm_[^&]*", "")
    q = F.regexp_replace(q, "^\\?utm_[^&]*&", "?")
    q = F.regexp_replace(q, "^\\?utm_[^&]*$", "")
    q = F.regexp_replace(q, "[?&]$", "")
    # path-only rule: trailing slash (the path ends where '?' began, so
    # this also covers the slash-before-query case without a global
    # '/\\?' rewrite that would corrupt values like ?next=/dir/?x=1)
    path = F.regexp_replace(path, "/$", "")
    sh = F.lower(F.regexp_extract(path, _SCHEME_HOST, 0))
    rest = F.regexp_replace(path, _SCHEME_HOST, "")
    # scheme-aware default port: parse the port segment exactly (the
    # digits after the LAST ':') so userinfo colons, IPv6 brackets and
    # numeric hosts don't confuse a suffix regex, and :8443 never
    # half-matches :443
    scheme = F.regexp_extract(sh, "^([a-z][a-z0-9+.-]*)://", 1)
    port = F.regexp_extract(sh, ":([0-9]+)$", 1)
    sh = (
        F.when(
            ((scheme == "https") & (port == "443"))
            | ((scheme == "http") & (port == "80")),
            F.regexp_replace(sh, ":[0-9]+$", ""),
        )
        .otherwise(sh)
    )
    return F.concat(sh, rest, q)


_HOST_RE = (
    "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?(\\[[^\\]]*\\]|[^/?#:@]+)"
)


def url_host(url: Column) -> Column:
    """Lowercased hostname: userinfo stripped (``user:pw@`` would
    otherwise satisfy a naive up-to-colon match), IPv6 bracket literals
    returned whole, port excluded."""
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def registered_domain(host: Column) -> Column:
    """Naive registered domain: the last two dot-labels (a real
    deployment swaps in the public-suffix list; the plumbing — group
    keys, partitioning — is identical)."""
    return F.regexp_extract(host, "[^.]+\\.[^.]+$", 0)
