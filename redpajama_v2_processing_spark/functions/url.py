"""URL canonicalization as native Spark Column expressions.

Web-scale pipelines dedup and group by URL before anything touches page
content (CCNet groups shards by URL; RefinedWeb applies URL-level dedup
and filtering as its first stage; the reference keys every per-document
signal on the page url, e.g. /root/reference/src/minhashlsh_pipeline.py's
id column). Raw crawl URLs are noisy — scheme/host case, default ports,
``www.`` prefixes, session/tracking query parameters, fragments and
trailing slashes all vary across recrawls of the same resource — so a
deterministic canonical form is what the dedup key must be.

Canonical rule (documented contract, mirrored bit-for-bit by the DuckDB
oracle twin in ``oracle.q_url_canonicalize``):

1. trim surrounding whitespace; strip the ``#fragment``;
2. scheme lowercased; userinfo (``user:pass@``) dropped;
3. host lowercased; default port stripped (``:80`` for http, ``:443``
   for https); leading ``www.`` stripped (optional, default on);
4. path case PRESERVED (paths are case-sensitive); trailing ``/`` runs
   stripped; empty path becomes ``/``;
5. query parameters split on ``&``; empties and tracking parameters
   dropped (``utm_*`` prefix plus the exact keys in
   ``TRACKING_KEYS``); survivors sorted lexicographically and
   rejoined — parameter order never distinguishes two URLs.

Percent-encoding normalization and IDN/punycode are out of scope (they
need a real URL library; the rule above is the portable, engine-exact
core that covers the crawl-noise variants that actually produce
duplicate keys).

Everything is regexp/split/array expressions — no Python per row. The
``filter``/``array_sort`` higher-order functions run on small per-URL
query-param arrays (not corpus-length arrays), JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# exact-match tracking/session parameter keys (the utm_ family is
# matched by prefix); the list is the widely-published ad/analytics set
TRACKING_KEYS = (
    "fbclid", "gclid", "msclkid", "dclid", "igshid",
    "mc_cid", "mc_eid", "ref", "ref_src", "spm",
)

_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://"


def canonicalize_url(col: Column | str, strip_www: bool = True) -> Column:
    """Canonical URL string per the module contract. URLs without a
    ``scheme://`` prefix pass through with only trim + fragment strip
    (nothing to decompose)."""
    u = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(F.trim(u), r"#.*$", "")

    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    # authority = up to the first /, ? (fragment already gone)
    auth = F.regexp_extract(rest, r"^([^/?]*)", 1)
    host = F.lower(F.regexp_replace(auth, r"^[^@]*@", ""))  # drop userinfo
    host = (
        F.when(scheme == "http", F.regexp_replace(host, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, r":443$", ""))
        .otherwise(host)
    )
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")

    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)

    query = F.when(
        pathq.contains("?"), F.regexp_replace(pathq, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    keep = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~F.regexp_extract(p, r"^([^=]*)", 1).startswith("utm_")
        & ~F.regexp_extract(p, r"^([^=]*)", 1).isin(*TRACKING_KEYS),
    )
    qcanon = F.array_join(F.array_sort(keep), "&")

    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qcanon == "", F.lit("")).otherwise(F.concat(F.lit("?"), qcanon)),
    )
    return F.when(scheme == "", u).otherwise(canon)


def url_dedup_keep(df, url_col: str, id_col: str, strip_www: bool = True):
    """DF(id): one survivor (min id) per canonical URL — the URL-level
    exact-dedup stage real pipelines run before any content pass.

    One grouped min over the canonical key: map-side combinable, one
    shuffle of one row per distinct canonical URL. At 100 TB this is the
    cheapest dedup tier (no content is read beyond the url column, which
    parquet column pruning serves alone)."""
    return (
        df.select(
            canonicalize_url(F.col(url_col), strip_www).alias("_curl"),
            F.col(id_col).alias("id"),
        )
        .groupBy("_curl")
        .agg(F.min("id").alias("id"))
        .select("id")
    )


def url_blocklist_filter(df, patterns, url_col: str = "url"):
    """Drop rows whose url matches ANY of the regex ``patterns`` (the
    UT1-style URL-pattern tier that complements the domain blocklist in
    ``operators/sampling.domain_blocklist_filter``).

    The patterns fold into ONE alternation evaluated in a single
    codegen-friendly rlike pass — a narrow filter, no joins, no shuffle;
    at scale the predicate runs at the scan. Patterns must stay in the
    regex subset Java and RE2 share (literals, classes, alternation,
    anchors) so the DuckDB oracle twin is exact."""
    if not patterns:
        return df
    alternation = "|".join(f"(?:{p})" for p in patterns)
    return df.where(~F.col(url_col).rlike(alternation))
