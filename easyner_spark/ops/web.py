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


# Embedded public-suffix subset: the high-traffic TWO-LABEL public
# suffixes (publicsuffix.org). Bounded literal set → stays a pure JVM
# expression (array_contains over a literal array, whole-stage
# codegen); a full-PSL deployment swaps this for the complete list
# (still a literal/broadcast lookup — the plan shape is unchanged).
_TWO_LABEL_PUBLIC_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
    "gr.jp", "lg.jp",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "geek.nz",
    "co.za", "org.za", "net.za", "gov.za", "ac.za", "web.za",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.mx", "org.mx", "net.mx", "gob.mx", "edu.mx",
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in",
    "ac.in", "edu.in", "res.in", "gov.in", "nic.in",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "web.tr",
    "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw", "idv.tw",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "co.id", "or.id", "ac.id", "go.id", "web.id", "sch.id", "my.id",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    "com.ru", "net.ru", "org.ru", "msk.ru", "spb.ru",
    "co.th", "in.th", "ac.th", "go.th", "or.th", "net.th",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke",
)


def registered_domain(host: Column, psl: bool = True) -> Column:
    """Registered (eTLD+1) domain of a lowercased hostname.

    ``psl=True`` (default): public-suffix aware over the embedded
    two-label suffix subset — ``news.bbc.co.uk`` → ``bbc.co.uk``,
    ``www.example.com`` → ``example.com``. A bare public suffix
    (``co.uk``) has no registrable part and is returned as-is.

    ``psl=False``: the naive last-two-labels rule (kept for the
    SQL-oracle-gated contract query, whose DuckDB twin mirrors the same
    expression)."""
    last2 = F.regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    if not psl:
        return last2
    last3 = F.regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    return F.when(
        last2.isin(*_TWO_LABEL_PUBLIC_SUFFIXES) & (last3 != ""), last3
    ).otherwise(last2)
