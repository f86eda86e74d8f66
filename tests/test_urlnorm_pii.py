"""URL canonicalization + PII scrubbing: hand-pinned cases (engine side)
and engine↔DuckDB regex-parity checks on adversarial strings."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from finddup_spark.functions.pii import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    pii_counts,
    scrub_pii,
)
from finddup_spark.functions.urlnorm import (
    TRACKING_PARAMS,
    canonical_url_dedup,
    canonicalize_url,
)

URL_CASES = [
    # (raw, canonical)
    ("https://Example.COM/Path", "https://example.com/Path"),
    ("  https://example.com/a  ", "https://example.com/a"),
    ("https://example.com/a#frag", "https://example.com/a"),
    ("HTTPS://WWW.Example.com:443/a/", "https://example.com/a"),
    ("http://example.com:80/x?q=1", "http://example.com/x?q=1"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    ("https://example.com/x?utm_source=f&utm_medium=e", "https://example.com/x"),
    ("https://example.com/x?a=1&utm_source=f&b=2", "https://example.com/x?a=1&b=2"),
    ("https://example.com/x?utm_a=1&b=2", "https://example.com/x?b=2"),
    ("https://example.com/x?fbclid=abc", "https://example.com/x"),
    ("https://example.com/", "https://example.com"),
    ("https://example.com///", "https://example.com"),
    # path/query case is significant and preserved
    ("https://example.com/A?Q=V", "https://example.com/A?Q=V"),
    # no scheme: head extract matches nothing, string passes through
    ("example.com/a/", "example.com/a"),
    # port elision only for the scheme-default pairing
    ("https://example.com:80/x", "https://example.com:80/x"),
]


def test_canonicalize_url_pinned(spark):
    df = spark.createDataFrame([(r,) for r, _ in URL_CASES], "url string")
    got = [r[0] for r in df.select(canonicalize_url("url")).collect()]
    want = [c for _, c in URL_CASES]
    assert got == want


def test_canonicalize_url_duckdb_parity(spark):
    """The oracle's RE2 chain produces byte-identical canonical forms."""
    raws = [r for r, _ in URL_CASES] + [
        "https://example.com/x?utm_source=a&utm_b=c&gclid=z",
        "http://WWW.HOST.COM:80/?utm_x=1",
        "https://h.io/p?msclkid=7&keep=2&utm_q=3#f",
    ]
    df = spark.createDataFrame([(r,) for r in raws], "url string")
    got = [r[0] for r in df.select(canonicalize_url("url")).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(r,) for r in raws])
    oracle = con.execute(_CANON_SQL).fetchall()
    assert got == [r[0] for r in oracle]


# kept in lockstep with __spark_entry__'s url_dedup oracle
_CANON_SQL = r"""
WITH s1 AS (SELECT regexp_replace(trim(url), '#.*', '', 'g') AS u FROM t),
s2 AS (SELECT u, regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)', 1) AS h FROM s1),
s3 AS (SELECT lower(h) || substr(u, length(h) + 1) AS u FROM s2),
s4 AS (SELECT regexp_replace(u, '^(https?://)www\.', '\1') AS u FROM s3),
s5 AS (SELECT regexp_replace(regexp_replace(u,
        '^(http://[^/?#:]+):80([/?#].*|$)', '\1\2'),
        '^(https://[^/?#:]+):443([/?#].*|$)', '\1\2') AS u FROM s4),
s6 AS (SELECT regexp_replace(regexp_replace(regexp_replace(u,
        '&(utm_[^=&]*|fbclid|gclid|msclkid)=[^&]*', '', 'g'),
        '\?(utm_[^=&]*|fbclid|gclid|msclkid)=[^&]*&', '?'),
        '\?(utm_[^=&]*|fbclid|gclid|msclkid)=[^&]*$', '') AS u FROM s5),
s7 AS (SELECT regexp_replace(regexp_replace(u, '[?&]+$', ''), '/+$', '') AS u FROM s6)
SELECT u FROM s7
"""


def test_canonical_url_dedup(spark):
    rows = [
        (1, "https://example.com/a"),
        (2, "HTTPS://WWW.example.com/a/"),
        (3, "https://example.com/a?utm_source=x#top"),
        (4, "https://example.com/b"),
        (5, "https://example.com/b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {
        r["canonical_url"]: r
        for r in canonical_url_dedup(df).collect()
    }
    a = out["https://example.com/a"]
    assert (a["keep_id"], a["n_variants"], a["n_raw_urls"]) == (1, 3, 3)
    b = out["https://example.com/b"]
    assert (b["keep_id"], b["n_variants"], b["n_raw_urls"]) == (4, 2, 1)


PII_CASES = [
    (
        "mail me at alice.smith+x@sub.example.co.uk or call +14155551234",
        (1, 0, 1),
        f"mail me at {'<EMAIL>'} or call {'<PHONE>'}",
    ),
    ("server at 10.0.255.3:8080", (0, 1, 0), "server at <IP>:8080"),
    # version strings: only 4 word-bounded octets match
    ("v1.2.3 and 1.2.3.4.5", (0, 1, 0), "v1.2.3 and <IP>.5"),
    ("no pii here", (0, 0, 0), "no pii here"),
    # short +digits is not a phone (E.164 floor is 9)
    ("+12345678 is not, +123456789 is", (0, 0, 1), "+12345678 is not, <PHONE> is"),
    ("two mails: a@b.io c@d.org", (2, 0, 0), "two mails: <EMAIL> <EMAIL>"),
]


def test_pii_pinned(spark):
    df = spark.createDataFrame([(t,) for t, _, _ in PII_CASES], "text string")
    got = df.select(*pii_counts("text"), scrub_pii("text").alias("s")).collect()
    for row, (_, counts, scrubbed) in zip(got, PII_CASES):
        assert (row["n_emails"], row["n_ipv4"], row["n_phones"]) == counts
        assert row["s"] == scrubbed


def test_pii_duckdb_parity(spark):
    """regexp_count / regexp_replace agree between Java regex and RE2 on
    adversarial inputs (boundaries, greedy bounded repetition)."""
    texts = [t for t, _, _ in PII_CASES] + [
        "x+123456789012345678 overlong run",
        "a@b.c a@b.co 999.999.999.999 0.0.0.0",
        "email-with-dash@ex-ample.com, _under@x.io",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = df.select(*pii_counts("text"), scrub_pii("text").alias("s")).collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE t(text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(t,) for t in texts])
    oracle = con.execute(rf"""
        SELECT len(regexp_extract_all(text, '{EMAIL_RE}')),
               len(regexp_extract_all(text, '{IPV4_RE}')),
               len(regexp_extract_all(text, '{PHONE_RE}')),
               regexp_replace(regexp_replace(regexp_replace(text,
                   '{EMAIL_RE}', '<EMAIL>', 'g'),
                   '{PHONE_RE}', '<PHONE>', 'g'),
                   '{IPV4_RE}', '<IP>', 'g')
        FROM t
    """).fetchall()
    for row, orc in zip(got, oracle):
        assert (row["n_emails"], row["n_ipv4"], row["n_phones"]) == orc[:3]
        assert row["s"] == orc[3]


def test_tracking_params_shared():
    """The oracle SQL embeds the same alternation the engine uses."""
    assert TRACKING_PARAMS in _CANON_SQL.replace("\\?", "?") or (
        TRACKING_PARAMS == "utm_[^=&]*|fbclid|gclid|msclkid"
    )
