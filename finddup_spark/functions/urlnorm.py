"""URL canonicalization + canonical-URL dedup — pure JVM built-ins.

The web-crawl generalization of the reference's searchpath normalization
(``finddup.py:693-736``: realpath each root, set-dedup, drop roots nested
in other roots): a crawl sees the same page under many raw URL spellings
(scheme/host case, ``www.`` prefix, default ports, tracking parameters,
fragments, trailing slashes), and the corpus-scale analog of "realpath +
set-dedup" is canonicalize-then-group-by.

Every rule is a ``regexp_replace``/``regexp_extract`` chain of built-in
``pyspark.sql.functions`` — whole-stage codegen, no UDFs — written in the
RE2-compatible regex subset (no lookaround, no backreferences in the
PATTERN) so the DuckDB oracle can run the byte-identical semantics.

Rules (applied in order; each is a no-op when its pattern is absent):

1. trim surrounding whitespace;
2. strip the fragment (``#...`` to end);
3. lowercase the scheme+authority head only (path/query case is
   significant per RFC 3986 §6.2.2.1);
4. drop a ``www.`` host prefix;
5. drop scheme-default ports (``http://h:80``, ``https://h:443``);
6. drop tracking query parameters (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``) wherever they sit in the query string;
7. drop a now-dangling ``?``/``&`` tail;
8. drop trailing slashes.

Deliberately NOT done (documented non-goals): percent-decoding and query
parameter re-ordering — both change equality semantics in ways that need
a per-site policy, and neither is expressible identically in Java regex
and RE2 without a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tracking query parameters removed by rule 6 (shared with the oracle SQL)
TRACKING_PARAMS = r"utm_[^=&]*|fbclid|gclid|msclkid"

#: scheme+authority matcher for rule 3 (everything before path/query/#)
_HEAD = r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)"


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def canonicalize_url(url: str | Column = "url") -> Column:
    """Canonical form of a raw URL (see module docstring for the rules)."""
    u = F.trim(_col(url))
    # 2. fragment (URLs are single-line: '.' never meets a newline)
    u = F.regexp_replace(u, r"#.*", "")
    # 3. lowercase scheme+authority only
    head = F.regexp_extract(u, _HEAD, 1)
    u = F.concat(F.lower(head), F.substring(u, F.length(head) + 1, F.lit(2**31 - 1)))
    # 4. www. prefix (after lowercasing, so WWW. is covered)
    u = F.regexp_replace(u, r"^(https?://)www\.", r"$1")
    # 5. default ports; group 2 always participates (alternation with $)
    u = F.regexp_replace(u, r"^(http://[^/?#:]+):80([/?#].*|$)", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/?#:]+):443([/?#].*|$)", r"$1$2")
    # 6. tracking params: non-leading first, then a leading one with a
    # follower, then a lone one (three passes cover every position)
    u = F.regexp_replace(u, rf"&({TRACKING_PARAMS})=[^&]*", "")
    u = F.regexp_replace(u, rf"\?({TRACKING_PARAMS})=[^&]*&", "?")
    u = F.regexp_replace(u, rf"\?({TRACKING_PARAMS})=[^&]*$", "")
    # 7. dangling '?'/'&' left by rule 6 on an all-tracking query string
    u = F.regexp_replace(u, r"[?&]+$", "")
    # 8. trailing slashes ('https://host/' == 'https://host')
    u = F.regexp_replace(u, r"/+$", "")
    return u


def canonical_url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """(canonical_url, keep_id, n_variants, n_raw_urls) — one keep row per
    canonical URL: ``keep_id`` = min id (deterministic, the engine-wide
    cluster-id convention), ``n_variants`` = member count,
    ``n_raw_urls`` = distinct raw spellings collapsed.

    One hash-aggregate shuffle over (canonical_url, id, url) rows —
    canonicalization itself is map-side codegen, so at 100 TB the cost is
    the one groupBy any URL-keyed dedup needs. Skewed canonical URLs
    (a host's error page crawled millions of times) are a count-style
    aggregate, not a collect_list — no per-group memory blowup.
    """
    c = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(url_col).alias("__raw"),
        canonicalize_url(url_col).alias("canonical_url"),
    )
    return c.groupBy("canonical_url").agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("n_variants"),
        F.countDistinct("__raw").alias("n_raw_urls"),
    )
