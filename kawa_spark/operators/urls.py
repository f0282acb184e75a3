"""URL canonicalization (SURT) as native Spark SQL expressions.

Common-Crawl-scale corpora key almost everything by URL (the reference
pipeline's documents are url-keyed throughout, e.g. its per-url
checkpoint records), and raw crawl URLs are noisy: scheme/case
variants, ``www.`` prefixes, default ports, session-id and tracking
query params, fragments, and unsorted param order all alias the same
resource. The Internet Archive's SURT (Sort-friendly URI Reordering
Transform — public spec, used by the Common Crawl URL index) fixes
this by lowercasing, dropping scheme/userinfo/port/fragment, reversing
host labels comma-separated (``com,example``) so a sorted key column
clusters by registered domain, and normalizing the query string.

Everything here is a *Column builder* over built-in functions — the
whole transform is one narrow JVM-side projection (no Python, no
shuffle; the higher-order param filter makes it interpreted-expression
rather than codegen, which is still orders of magnitude from a UDF),
so canonicalizing 10^12 URLs is a map-only pass. The same
logic is expressible in ANSI-ish SQL for the DuckDB oracle (see
``surt_host_stats`` in ``__spark_entry__``).

Scope notes (documented, deliberate):

* hosts are treated as registry-agnostic label lists — no public-suffix
  list (that is a lookup-table join, not a string transform);
* IDN/punycode left as-is (SURT does too);
* dropped query params: the session-id/tracking families
  (``jsessionid``, ``phpsessid``, ``sid``, ``utm_*``, ``fbclid``,
  ``gclid``); remaining params are sorted bytewise.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# regex fragments shared by the Spark path, the oracle SQL and the
# pure-Python test reference (tests/test_urls.py)
SCHEME_RE = r"^[a-z][a-z0-9+.-]*://"
USERINFO_RE = r"^[^/@?#]*@"
DROP_PARAM_RE = r"^(jsessionid|phpsessid|sid|fbclid|gclid|utm_[a-z]*)="


def _authority_and_rest(url: Column) -> tuple[Column, Column]:
    """Split a lowercased, fragment/scheme/userinfo-stripped URL into
    (authority, path-plus-query)."""
    lowered = F.lower(F.trim(url))
    no_frag = F.substring_index(lowered, "#", 1)
    no_scheme = F.regexp_replace(no_frag, SCHEME_RE, "")
    no_user = F.regexp_replace(no_scheme, USERINFO_RE, "")
    authority = F.substring_index(F.substring_index(no_user, "/", 1), "?", 1)
    rest = F.substring(no_user, F.length(authority) + F.lit(1), F.lit(1 << 20))
    return authority, rest


def host_key(url: Column) -> Column:
    """Comma-joined reversed host labels: ``https://www.News.Example.org/x``
    -> ``org,example,news``. ``www.`` is dropped (one leading label only,
    the crawl-dedup convention); the port is dropped regardless of value
    (host identity, not endpoint identity)."""
    authority, _ = _authority_and_rest(url)
    host = F.substring_index(authority, ":", 1)
    host = F.regexp_replace(host, r"^www\.", "")
    return F.concat_ws(",", F.reverse(F.split(host, r"\.")))


def surt_key(url: Column) -> Column:
    """Full SURT form: ``host_key + ')' + path + normalized query``.

    Path: trailing ``/`` stripped (so ``/a/`` == ``/a``; bare ``/``
    becomes the host root). Query: params split on ``&``,
    session/tracking params dropped (``DROP_PARAM_RE``), the rest
    sorted bytewise and re-joined; an emptied query disappears
    entirely. All ports (default or not) are dropped by
    :func:`host_key`.
    """
    _, rest = _authority_and_rest(url)
    path = F.regexp_replace(F.substring_index(rest, "?", 1), r"/+$", "")
    raw_q = F.when(rest.contains("?"), F.substring_index(rest, "?", -1))
    query = F.array_join(
        F.array_sort(
            F.filter(
                F.split(raw_q, "&"),
                lambda p: (p != "") & ~p.rlike(DROP_PARAM_RE),
            )
        ),
        "&",
    )
    return F.concat(
        host_key(url),
        F.lit(")"),
        path,
        F.when(
            query.isNotNull() & (query != ""),
            F.concat(F.lit("?"), query),
        ).otherwise(F.lit("")),
    )


def with_surt(df, url_col: str = "url", out_col: str = "surt"):
    """Add a SURT key column (one narrow codegen projection)."""
    return df.withColumn(out_col, surt_key(F.col(url_col)))


def dedup_canonical(df, url_col: str = "url", ts_col: str = "warc_ts"):
    """Crawl-alias dedup: keep ONE page per SURT key — the latest crawl
    wins (max ``ts_col``), bytewise-max URL breaks timestamp ties, so
    the survivor set is deterministic under any partitioning.

    Scale shape: winner election runs on a NARROW (surt, ts, url)
    projection — one partial-agg max(struct) shuffle of three small
    columns — and a left-semi equi-join on (url, ts) fans the winners
    back to the wide rows, so the heavy columns (html) cross the wire
    once in the join and never through the aggregate.

    Precondition: (url, ts) identifies a crawl record (the WARC
    contract); exact-duplicate rows are untouched — they are upstream
    ingest bugs, not URL aliases.
    """
    keyed = with_surt(df.select(url_col, ts_col), url_col)
    winners = (
        keyed.groupBy("surt")
        .agg(F.max(F.struct(ts_col, url_col)).alias("w"))
        .select(f"w.{ts_col}", f"w.{url_col}")
    )
    return df.join(winners, [url_col, ts_col], "left_semi")
