"""URL canonicalization — pure Catalyst expressions, no Python in the path.

Common-Crawl-style corpora (BASELINE.json input_hint: ``url`` column) carry
the same page under many spellings: scheme/host case, default ports,
fragments, tracking parameters, unsorted query strings, doubled slashes,
trailing slashes.  Canonicalizing BEFORE content dedup collapses crawl
revisits for free (an exact groupBy — no signatures needed) and is the
web analog of the reference's path normalization ahead of cache keying
(``processing_fs_cache.rs`` keys on canonical absolute paths).

Canonicalization rules (deliberately conservative — reversible-safe only):

1. scheme and host lowercased;
2. default ports stripped (``:80`` for http, ``:443`` for https);
3. fragment dropped;
4. tracking query parameters dropped (``utm_*``, ``fbclid``, ``gclid``,
   ``ref``);
5. remaining query parameters sorted (order never changes server routing);
6. runs of ``/`` in the path collapsed, trailing slash dropped (root stays
   ``/``; an empty path becomes ``/``).

Everything is ``regexp_*`` / array expressions inside whole-stage codegen —
the canonical form of 10^12 URLs costs one projection over the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TRACKING = r"^(utm_[^=]*|fbclid|gclid|ref)(=|$)"


def canonical_url(col) -> Column:
    """Canonical form of an absolute http(s) URL (see module rules).

    Non-URL strings (no ``scheme://``) pass through lowercase-trimmed, so
    the expression is total — never null on weird input, garbage groups
    only with identical garbage.
    """
    u = F.trim(col if isinstance(col, Column) else F.col(col))
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    # authority = up to the first /, ?, or #; the userinfo part (user:pass@)
    # is CASE-SENSITIVE per RFC 3986 and keeps its case — only the
    # host[:port] part lowercases
    authority_raw = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    userinfo = F.regexp_extract(authority_raw, r"^([^/?#]*@)", 1)
    authority = F.concat(
        userinfo, F.lower(F.regexp_replace(authority_raw, r"^[^/?#]*@", ""))
    )
    host = (
        F.when(scheme == "http", F.regexp_replace(authority, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(authority, r":443$", ""))
        .otherwise(authority)
    )
    tail = F.regexp_extract(rest, r"^[^/?#]*(.*)$", 1)  # path + query + fragment
    no_frag = F.regexp_replace(tail, r"#.*$", "")
    path = F.regexp_extract(no_frag, r"^([^?]*)", 1)
    query = F.regexp_extract(no_frag, r"\?(.*)$", 1)

    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.regexp_replace(path, r"(.)/$", "$1")
    path = F.when(path == "", F.lit("/")).otherwise(path)

    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING),
    )
    qcanon = F.array_join(F.array_sort(params), "&")

    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qcanon == "", F.lit("")).otherwise(F.concat(F.lit("?"), qcanon)),
    )
    return F.when(scheme == "", F.lower(u)).otherwise(canon)
