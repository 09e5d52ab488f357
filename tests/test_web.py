"""URL canonicalization / domain curation (operators.web)."""

import pytest
from pyspark.sql import functions as F

from margaret_spark.operators.web import (
    canonicalize_url,
    domain_stats,
    filter_blocked_domains,
    registered_domain,
    url_host,
    url_path,
    url_port,
    url_query,
    url_scheme,
    with_url_columns,
)


def _one(spark, url, col):
    return (
        spark.createDataFrame([(url,)], "url string")
        .select(col(F.col("url")).alias("v"))
        .collect()[0]["v"]
    )


@pytest.mark.parametrize(
    "url,canon",
    [
        # lowercase scheme+host, default port stripped, '' path -> '/'
        ("HTTPS://Example.COM:443", "https://example.com/"),
        ("http://Example.com:80/a", "http://example.com/a"),
        # non-default port survives
        ("http://example.com:8080/a", "http://example.com:8080/a"),
        # fragment dropped
        ("https://example.com/a#sec", "https://example.com/a"),
        # tracking params dropped, the rest sorted
        (
            "https://example.com/a?utm_source=x&b=2&a=1&gclid=z",
            "https://example.com/a?a=1&b=2",
        ),
        # all params tracking -> no '?'
        ("https://example.com/a?utm_campaign=x", "https://example.com/a"),
        # userinfo stripped from the host, kept out of the canon form
        ("https://user:pw@Example.com/a", "https://example.com/a"),
        # empty query string -> no '?'
        ("https://example.com/a?", "https://example.com/a"),
    ],
)
def test_canonicalize_cases(spark, url, canon):
    assert _one(spark, url, canonicalize_url) == canon


def test_canonicalize_unparseable_is_null(spark):
    assert _one(spark, "not a url", canonicalize_url) is None
    assert _one(spark, "/relative/path", canonicalize_url) is None


def test_url_parts(spark):
    u = "HTTP://u@News.Example.COM:8080/x/y?a=1#f"
    assert _one(spark, u, url_scheme) == "http"
    assert _one(spark, u, url_host) == "news.example.com"
    assert _one(spark, u, url_port) == "8080"
    assert _one(spark, u, url_path) == "/x/y"
    assert _one(spark, u, url_query) == "a=1"


@pytest.mark.parametrize(
    "host,domain",
    [
        ("news.example.com", "example.com"),
        ("example.com", "example.com"),
        ("blog.example.co.uk", "example.co.uk"),
        ("docs.python.org", "python.org"),
        ("a.b.tracker.ads.net", "ads.net"),
        ("localhost", "localhost"),
        # second-level label but LONG tld: two-label rule applies
        ("x.co.example", "co.example"),
    ],
)
def test_registered_domain(spark, host, domain):
    got = (
        spark.createDataFrame([(host,)], "h string")
        .select(registered_domain(F.col("h")).alias("v"))
        .collect()[0]["v"]
    )
    assert got == domain


def test_with_url_columns_and_blocklist(spark):
    df = spark.createDataFrame(
        [
            (1, "https://news.example.com/a"),
            (2, "http://Tracker.ads.net/b?page=1&utm_x=1"),
            (3, "https://cdn.media.io:443/c"),
        ],
        "id long, url string",
    )
    out = {r["id"]: r.asDict() for r in with_url_columns(df, "url").collect()}
    assert out[2]["url_domain"] == "ads.net"
    assert out[2]["url_canonical"] == "http://tracker.ads.net/b?page=1"
    assert out[3]["url_canonical"] == "https://cdn.media.io/c"
    kept = filter_blocked_domains(df, "url", ["ads.net", "media.io"])
    assert [r["id"] for r in kept.collect()] == [1]
    # empty blocklist is the identity
    assert filter_blocked_domains(df, "url", []).count() == 3


def test_domain_stats(spark):
    df = spark.createDataFrame(
        [
            (1, "https://a.example.com/x", 10, "en"),
            (2, "https://b.example.com/y", 20, "de"),
            (3, "https://b.example.com/z", 30, "en"),
            (4, "https://wiki.org/w", 5, "en"),
        ],
        "id long, url string, sz long, lang string",
    )
    rows = {
        r["domain"]: r.asDict()
        for r in domain_stats(df, "url", "sz", group_col="lang").collect()
    }
    assert rows["example.com"]["n_docs"] == 3
    assert rows["example.com"]["total_size"] == 60
    assert rows["example.com"]["n_hosts"] == 2
    assert rows["example.com"]["n_lang"] == 2
    assert rows["wiki.org"]["n_docs"] == 1


def test_tracking_filter_no_false_positives(spark):
    # 'utmost=1' is not a utm_ param; 'reference=x' is not 'ref'
    u = "https://example.com/a?utmost=1&reference=x"
    assert (
        _one(spark, u, canonicalize_url)
        == "https://example.com/a?reference=x&utmost=1"
    )


def test_ipv6_authority_is_rejected_as_null(spark):
    # reg-name-only host grammar: a bracketed IPv6 literal cannot be
    # split on ':' — host/port/canonical are NULL, never a mangled '['
    u = "http://[::1]:8080/x"
    assert _one(spark, u, url_host) is None
    assert _one(spark, u, url_port) is None
    assert _one(spark, u, canonicalize_url) is None
    # ... and a normal URL is unaffected
    assert _one(spark, "http://h.example.com:81/x", url_host) == "h.example.com"


def test_blocklist_keeps_null_domain_rows(spark):
    # a row with a NULL/unparseable URL matches no blocklist entry:
    # it must be KEPT, not silently dropped by three-valued ~isin
    df = spark.createDataFrame(
        [
            (1, "https://tracker.ads.net/a"),
            (2, None),
            (3, "not a url"),
            (4, "https://ok.example.com/b"),
        ],
        "id long, url string",
    )
    kept = filter_blocked_domains(df, "url", ["ads.net"])
    assert sorted(r["id"] for r in kept.collect()) == [2, 3, 4]
