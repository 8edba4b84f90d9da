"""URL canonicalization for web-corpus dedup (C4 / RefinedWeb style).

The standard first dedup stage of a web-scale training pipeline operates
on the URL, not the text: strip tracking noise, normalize the surface
form, and collapse recrawls of the same logical page BEFORE any content
hashing happens. Everything here is a pure Column expression — at 100 TB
it runs inside WholeStageCodegen over the scan with zero shuffle and
zero Python.

Canonical form (documented contract, mirrored 1:1 by the DuckDB oracle):

1. trim; drop the scheme (``https://`` vs ``http://`` recrawls are the
   same page — RefinedWeb normalizes scheme away) and the ``#fragment``
2. host: lowercased, leading ``www.`` stripped, default ports ``:80`` /
   ``:443`` stripped (non-default ports are load-bearing and kept)
3. path: duplicate slashes collapsed, trailing slash stripped (so the
   bare-host root path becomes empty); case is PRESERVED — unlike
   hosts, URL paths are case-sensitive per RFC 3986
4. query: split on ``&``, empty params and tracking params dropped
   (default set ``utm_*``, ``gclid``, ``fbclid``, ``mc_cid``,
   ``mc_eid``; the key set is a parameter — see ``TRACKING_KEY_RE``
   vs ``TRACKING_KEY_RE_AGGRESSIVE`` below), the survivors sorted
   (param order never distinguishes pages) and re-joined; an emptied
   query drops its ``?``

Percent-decoding and IDN normalization are deliberately out of scope
(they need a real URL parser; at that point use a pandas_udf over
``urllib.parse`` — the fingerprint contract downstream is unchanged).

Extends the reference's F13 URL/path normalization
(app/templates/search.html:90-131, static-prefix + extension-swap) from
single-site asset paths to the open-web form a crawl pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# anchored key-only regexes: matched against the part BEFORE '=' of
# each query param. The DEFAULT set is conservative — utm_*, google /
# facebook click ids and mailchimp ids are tracking-only everywhere.
# Bare ``ref`` is NOT in the default: on several major hosts it is
# content-bearing (GitLab / Bitbucket file views use ``?ref=<branch>``),
# so stripping it collapses distinct pages to one canonical URL and
# url_dedup would then DELETE all but one of them. Crawls that know
# their hosts use referral ``ref`` as tracking (news/social shares) can
# opt in via ``TRACKING_KEY_RE_AGGRESSIVE`` or any custom regex — every
# function here takes ``tracking_key_re=``.
#
# BEHAVIOR CHANGE (r9): bare ``ref`` was removed from the DEFAULT set
# (it was stripped pre-r9). Canonical URLs computed with the default
# regex differ across the upgrade for any URL carrying ``?ref=...``:
# pre-r9 those recrawl variants collapsed to one canonical key and
# ``url_dedup`` kept a single survivor; post-r9 they survive as
# distinct pages. Callers persisting canonical-URL keys across the
# upgrade must either re-canonicalize their stored keys or pass
# ``tracking_key_re=TRACKING_KEY_RE_AGGRESSIVE``, which restores the
# old election exactly. (Mirrors the merge.py r8 tie-break note.)
TRACKING_KEY_RE = r"^(utm_[a-z0-9_]*|gclid|fbclid|mc_cid|mc_eid)$"
TRACKING_KEY_RE_AGGRESSIVE = r"^(utm_[a-z0-9_]*|gclid|fbclid|ref|mc_cid|mc_eid)$"

_SCHEME_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def url_host(c: Column | str) -> Column:
    """Canonical host only: lowercase, no www., no default port — the
    grouping key for per-host caps and host-level stats."""
    bare = F.regexp_replace(
        F.regexp_replace(F.trim(_col(c)), _SCHEME_RE, ""), r"#.*", "")
    host = F.substring_index(F.substring_index(bare, "?", 1), "/", 1)
    host = F.lower(host)
    host = F.regexp_replace(host, r"^www\.", "")
    return F.regexp_replace(host, r":(80|443)$", "")


def canonicalize_url(c: Column | str,
                     tracking_key_re: str = TRACKING_KEY_RE) -> Column:
    """Canonical URL string per the module contract — the dedup key of
    ``operators.dedup.url_dedup``. NULL in → NULL out.

    ``tracking_key_re`` selects which query-param KEYS are dropped as
    tracking noise (anchored regex over the part before ``=``). Default
    is the conservative set; pass ``TRACKING_KEY_RE_AGGRESSIVE`` to also
    strip bare ``ref`` — see the module-level note on the collision risk
    (``?ref=<branch>`` is content-bearing on GitLab/Bitbucket)."""
    bare = F.regexp_replace(
        F.regexp_replace(F.trim(_col(c)), _SCHEME_RE, ""), r"#.*", "")
    hostpath = F.substring_index(bare, "?", 1)
    host = url_host(c)
    raw_path = F.when(hostpath.contains("/"),
                      F.regexp_replace(hostpath, r"^[^/]*", "")
                      ).otherwise(F.lit(""))
    path = F.regexp_replace(F.regexp_replace(raw_path, r"/{2,}", "/"),
                            r"/$", "")
    # query = everything after the FIRST '?'; '' when absent
    query = F.when(bare.contains("?"),
                   F.regexp_replace(bare, r"^[^?]*\?", "")
                   ).otherwise(F.lit(""))
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~F.substring_index(p, "=", 1).rlike(tracking_key_re))
    canon_q = F.array_join(F.array_sort(kept), "&")
    return F.when(_col(c).isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(host, path,
                 F.when(canon_q == "", F.lit(""))
                 .otherwise(F.concat(F.lit("?"), canon_q))))
