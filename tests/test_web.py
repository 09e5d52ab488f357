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


def test_registered_domain_psl(spark):
    """Data-driven PSL resolution: longest match wins, '*.' wildcards
    make one extra label public, '!' exceptions claw their own labels
    back, unmatched hosts fall to the implicit '*' rule, and a host
    that IS a public suffix has no registrable domain."""
    from margaret_spark.operators.web import with_registered_domain_psl

    rules = [
        "com", "uk", "co.uk", "br", "nom.br", "us", "k12.ca.us",
        "*.ck", "!www.ck", "blogspot.com",
    ]
    cases = {
        "example.com": ("example.com", 1),
        "www.example.com": ("example.com", 1),
        "blog.example.co.uk": ("example.co.uk", 2),
        "co.uk": (None, 2),              # is itself a public suffix
        "foo.nom.br": ("foo.nom.br", 2),
        "a.b.k12.ca.us": ("b.k12.ca.us", 3),
        "www.town.ck": ("www.town.ck", 2),   # *.ck: town.ck is public
        "town.ck": (None, 2),
        "www.ck": ("www.ck", 1),             # !www.ck exception
        "myblog.blogspot.com": ("myblog.blogspot.com", 2),
        "internal": (None, 1),               # single label, default *
        "server.internal": ("server.internal", 1),
        "": (None, None),
        None: (None, None),
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    out = with_registered_domain_psl(df, "host", rules, ps_len_col="ps")
    got = {r["host"]: (r["domain_psl"], r["ps"]) for r in out.collect()}
    assert got == cases


def test_parse_suffix_rules_collapses_per_key(spark):
    from margaret_spark.operators.web import parse_suffix_rules

    rows = parse_suffix_rules(["ck", "*.ck", "!www.ck", "com"])
    by_key = {k: (d, p, w, e) for k, d, p, w, e in rows}
    # plain + wildcard on the same key collapse to ONE row (the
    # per-depth broadcast joins must stay 1:1)
    assert by_key["ck"] == (1, 1, True, None)
    assert by_key["www.ck"] == (2, None, False, 1)
    assert by_key["com"] == (1, 1, False, None)
    import pytest as _p

    with _p.raises(ValueError, match="empty"):
        from margaret_spark.operators.web import with_registered_domain_psl

        with_registered_domain_psl(
            spark.createDataFrame([("a",)], "host string"), "host", []
        )


def test_stream_web_filter_psl_rules(spark, tmp_path):
    """The streaming web filter with a real suffix list: the per-depth
    rule tables become stream-static broadcast joins; a domain that
    the heuristic would mis-split (PSL-correct 'example.co.uk') is
    resolved and blocklist-filtered at ingest."""
    from pyspark.sql import types as T

    from margaret_spark.log import OffsetLog
    from margaret_spark.streaming import stream_web_filter

    log = OffsetLog(spark, str(tmp_path / "log"), value_type=T.StringType())
    log.append_many(
        [
            "https://blog.bad.co.uk/x",      # PSL domain bad.co.uk: blocked
            "https://news.good.co.uk/y",     # good.co.uk: kept
            "https://www.town.ck/z",   # *.ck: suffix town.ck, kept
        ]
    )
    sink = str(tmp_path / "sink")
    stream_web_filter(
        log,
        F.col("value"),
        blocked=["bad.co.uk"],
        sink_dir=sink,
        checkpoint_dir=str(tmp_path / "ck"),
        psl_rules=["com", "uk", "co.uk", "*.ck"],
    )
    rows = {r["seq"]: r["url_domain"] for r in spark.read.parquet(sink).collect()}
    assert rows == {1: "good.co.uk", 2: "www.town.ck"}
