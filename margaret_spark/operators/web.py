"""URL canonicalization and domain-level corpus curation — the first
pass every web-scale training pipeline (CommonCrawl-style) runs:
normalize each document's URL to a canonical form, roll corpora up to
registered domains for per-domain quality/quota decisions, and drop
documents from blocklisted domains.

Beyond-reference operator family (the reference engine has no web
layer); the algorithms are the standard public ones: RFC 3986-style
syntactic normalization (lowercase scheme/host, default-port removal,
empty-path → "/", fragment removal) plus the common crawl-pipeline
extras (tracking-parameter removal, query-parameter sorting), and a
public-suffix-style registered-domain heuristic.

Scale shape: every function here is a pure per-row Column expression —
``regexp_extract`` / ``split`` / array ``filter``/``array_sort`` — all
whole-stage codegen, zero UDFs, zero shuffles. The only shuffle in the
family is the per-domain aggregation in :func:`domain_stats`, which is
algebraic (map-side partials; |domains| ≪ |docs| rows move).
Blocklist filtering is a broadcast-literal ``isin`` — at 100 TB the
filter is pushed into the scan and never shuffles.

Determinism: all string/array ops are byte-exact across engines, so a
SQL oracle reproduces every canonical URL and domain bit-for-bit
(sorting restricted to ASCII parameter strings — both engines compare
codepoint-wise).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: scheme://authority prefix (RFC 3986 scheme chars); group 1 = scheme,
#: group 2 = authority (host[:port], possibly with userinfo),
#: group 3 = path (up to query/fragment)
_URL_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://([^/?#]*)([^?#]*)"

#: second-level labels that commonly sit under a ccTLD
#: ("example.co.uk" → registered domain is three labels, not two)
SECOND_LEVEL_LABELS = ("co", "com", "net", "org", "gov", "ac", "edu", "or", "ne")

#: query parameters that never affect content (analytics/click ids)
TRACKING_KEYS = ("fbclid", "gclid", "msclkid", "ref", "mc_cid", "mc_eid")


def url_scheme(url: Column) -> Column:
    """Lowercased scheme, '' if not a parseable absolute URL."""
    return F.lower(F.regexp_extract(url, _URL_RE, 1))


def _authority(url: Column) -> Column:
    """host[:port] — the authority minus userinfo."""
    hp = F.regexp_extract(url, _URL_RE, 2)
    return F.regexp_replace(hp, r"^[^@]*@", "")


def url_host(url: Column) -> Column:
    """Lowercased host: authority minus userinfo and port. Host
    grammar is reg-name-only: a bracketed IPv6 literal
    (``http://[::1]:8080/``) cannot be split on ':' and returns NULL
    (→ NULL canonical form) rather than a mangled '[' host.

    The authority is BOUND (evaluated once — the ``bind1`` rule):
    when the caller's ``url`` is a big derived expression, predicate
    pushdown substitutes it into every reference, and the multiplied
    tree is exactly what blew a blocklist Filter's generated method
    past Janino's 64 KB limit (r10 probe: web_blocklist)."""
    from margaret_spark.functions.shingling import bind1

    def with_auth(a: Column) -> Column:
        return F.when(
            ~a.contains("["), F.lower(F.split(a, r":").getItem(0))
        )

    return bind1(_authority(url), with_auth)


def url_port(url: Column) -> Column:
    """Explicit port string ('' when absent; NULL for bracketed IPv6
    authorities — same reg-name-only grammar as :func:`url_host`).
    Authority and its split are bound (see :func:`url_host`)."""
    from margaret_spark.functions.shingling import bind1

    def with_auth(a: Column) -> Column:
        def with_parts(parts: Column) -> Column:
            return F.when(
                ~a.contains("["),
                F.when(F.size(parts) > 1, parts.getItem(1)).otherwise(
                    F.lit("")
                ),
            )

        return bind1(F.split(a, r":"), with_parts)

    return bind1(_authority(url), with_auth)


def url_path(url: Column) -> Column:
    """Path component ('' when absent; canonicalization maps '' → '/')."""
    return F.regexp_extract(url, _URL_RE, 3)


def url_query(url: Column) -> Column:
    """Raw query string after the first '?' (fragment excluded)."""
    return F.regexp_extract(url, r"\?([^#]*)", 1)


def _is_tracking_param(kv: Column) -> Column:
    key = F.split(kv, r"=").getItem(0)
    return (F.substring(key, 1, 4) == "utm_") | key.isin(*TRACKING_KEYS)


def canonical_query(url: Column) -> Column:
    """Query string with tracking parameters removed and the remaining
    ``k=v`` pairs sorted — '' when nothing survives."""
    pairs = F.split(url_query(url), r"&")
    kept = F.filter(pairs, lambda x: (x != "") & ~_is_tracking_param(x))
    return F.array_join(F.array_sort(kept), "&")


def canonicalize_url(url: Column) -> Column:
    """Syntactic canonical form: lowercase scheme and host, strip
    userinfo handling aside, drop the default port (http:80 /
    https:443 — explicit non-default ports survive), '' path → '/',
    drop the fragment, remove tracking parameters and sort the rest.
    Purely per-row codegen string work; NULL/unparseable URLs (no
    scheme) canonicalize to NULL."""
    scheme = url_scheme(url)
    host = url_host(url)
    port = url_port(url)
    is_default = ((scheme == "https") & (port == "443")) | (
        (scheme == "http") & (port == "80")
    )
    portpart = F.when(
        (port != "") & ~is_default, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    path = url_path(url)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = canonical_query(url)
    qpart = F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit(""))
    return F.when(
        scheme != "",
        F.concat(scheme, F.lit("://"), host, portpart, path, qpart),
    )


def registered_domain(host: Column) -> Column:
    """Public-suffix-style registered domain: the last two host
    labels, or the last three when the second-to-last label is a
    common second-level label under a short (≤3 chars) TLD
    ('blog.example.co.uk' → 'example.co.uk', 'docs.python.org' →
    'python.org'). A single-label host is its own domain. Heuristic by
    design — the full public-suffix list is data, not code: where
    exactness matters use :func:`with_registered_domain_psl`, the
    data-driven twin that resolves against a real PSL via per-depth
    broadcast joins."""
    from margaret_spark.functions.shingling import bind1

    def with_host(h: Column) -> Column:
        def with_labels(labels: Column) -> Column:
            n = F.size(labels)
            # 0-based F.get returns NULL out of range — safe under
            # the when
            last = F.get(labels, n - F.lit(1))
            second = F.get(labels, n - F.lit(2))
            third = F.get(labels, n - F.lit(3))
            use_three = (
                (n >= 3)
                & second.isin(*SECOND_LEVEL_LABELS)
                & (F.length(last) <= 3)
            )
            return (
                F.when(use_three, F.concat_ws(".", third, second, last))
                .when(n >= 2, F.concat_ws(".", second, last))
                .otherwise(h)
            )

        return bind1(F.split(h, r"\."), with_labels)

    # host + its label split bound once (the bind1 rule): a derived
    # host expression would otherwise be re-inlined per reference —
    # 5x for the labels alone — by pushdown's alias substitution
    return bind1(host, with_host)


def parse_suffix_rules(
    rules: list[str],
) -> list[tuple[str, int, int | None, bool, int | None]]:
    """Collapse a public-suffix-list rule set (publicsuffix.org
    format: plain suffixes, ``*.`` wildcards, ``!`` exceptions;
    comments/blank lines already stripped) into ONE row per match key:

        (key, depth, ps_plain, has_wild, ps_exc)

    where ``key`` is the exact label-suffix to equality-match,
    ``depth`` its label count, ``ps_plain`` the public-suffix length a
    plain rule implies (= depth), ``has_wild`` whether ``*.key`` makes
    any (depth+1)-label suffix public, and ``ps_exc`` the
    public-suffix length an exception rule implies (= depth − 1; the
    exception's own labels form the registrable domain). One row per
    key keeps the per-depth broadcast joins 1:1 — no row duplication.
    """
    by_key: dict[str, dict] = {}

    def slot(key: str) -> dict:
        return by_key.setdefault(
            key, {"ps_plain": None, "wild": False, "ps_exc": None}
        )

    for rule in rules:
        rule = rule.strip().lower()
        if not rule:
            continue
        if rule.startswith("!"):
            key = rule[1:]
            s = slot(key)
            d = key.count(".") + 1
            s["ps_exc"] = max(s["ps_exc"] or 0, d - 1)
        elif rule.startswith("*."):
            slot(rule[2:])["wild"] = True
        else:
            s = slot(rule)
            d = rule.count(".") + 1
            s["ps_plain"] = max(s["ps_plain"] or 0, d)
    return [
        (k, k.count(".") + 1, v["ps_plain"], v["wild"], v["ps_exc"])
        for k, v in sorted(by_key.items())
    ]


def with_registered_domain_psl(
    df: DataFrame,
    host_col: str,
    rules: list[str],
    out_col: str = "domain_psl",
    ps_len_col: str | None = None,
) -> DataFrame:
    """Registered domain resolved against a REAL public-suffix list —
    the data-driven twin of the :func:`registered_domain` heuristic
    (which stays the zero-data default). Standard PSL algorithm: among
    matching rules an exception wins, else the longest match; no match
    falls back to the implicit ``*`` rule (the TLD itself is the
    public suffix); the registered domain is the public suffix plus
    one label, NULL when the host IS a public suffix (or NULL/short).

    Scale shape: the rule set collapses to one row per match key
    (:func:`parse_suffix_rules`) and splits by key depth — real PSLs
    hold ~10k keys at depths 1–5, so each depth is a BROADCAST left
    join on an equality key (the host's last-``d``-labels string):
    zero shuffles, zero explodes, no per-host row multiplication; the
    resolution itself is codegen array/greatest arithmetic. All
    string/integer ops are byte-exact cross-engine, so a SQL oracle
    re-derives every domain bit-for-bit."""
    parsed = parse_suffix_rules(rules)
    if not parsed:
        raise ValueError("empty suffix rule set")
    spark = df.sparkSession
    host = F.col(host_col)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    df = df.withColumn("__psl_labels", labels).withColumn("__psl_n", n)
    depths = sorted({d for _k, d, _p, _w, _e in parsed})
    norm_cands: list[Column] = []
    exc_cands: list[Column] = []
    for d in depths:
        rows = [
            (k, p, w, e) for k, kd, p, w, e in parsed if kd == d
        ]
        rdf = spark.createDataFrame(
            rows,
            f"__psl_key_{d} string, __psl_plain_{d} int, "
            f"__psl_wild_{d} boolean, __psl_exc_{d} int",
        )
        tail_d = F.when(
            F.col("__psl_n") >= d,
            F.array_join(F.slice("__psl_labels", -d, d), "."),
        )
        df = df.withColumn(f"__psl_tail_{d}", tail_d).join(
            F.broadcast(rdf),
            F.col(f"__psl_tail_{d}") == F.col(f"__psl_key_{d}"),
            "left",
        )
        norm_cands.append(F.col(f"__psl_plain_{d}"))
        norm_cands.append(
            F.when(
                F.col(f"__psl_wild_{d}") & (F.col("__psl_n") >= d + 1),
                F.lit(d + 1),
            )
        )
        exc_cands.append(F.col(f"__psl_exc_{d}"))

    def _greatest(cands: list[Column]) -> Column:
        return cands[0] if len(cands) == 1 else F.greatest(*cands)

    # Spark's greatest skips NULLs: unmatched depths drop out
    ps = F.coalesce(
        _greatest(exc_cands), _greatest(norm_cands), F.lit(1)
    )
    nn = F.col("__psl_n")
    dom = F.when(
        host.isNotNull() & (host != "") & (nn > ps),
        F.array_join(F.slice("__psl_labels", -(ps + 1), ps + 1), "."),
    )
    df = df.withColumn(out_col, dom)
    if ps_len_col is not None:
        df = df.withColumn(
            ps_len_col,
            F.when(host.isNotNull() & (host != ""), ps.cast("int")),
        )
    drop = ["__psl_labels", "__psl_n"] + [
        c
        for d in depths
        for c in (
            f"__psl_tail_{d}",
            f"__psl_key_{d}",
            f"__psl_plain_{d}",
            f"__psl_wild_{d}",
            f"__psl_exc_{d}",
        )
    ]
    return df.drop(*drop)


def with_url_columns(df: DataFrame, url_col: str) -> DataFrame:
    """Add ``url_canonical``, ``url_host_name``, ``url_domain`` — the
    narrow projection everything downstream (stats, blocklists,
    URL-level dedup keys) consumes. No shuffle."""
    u = F.col(url_col)
    host = url_host(u)
    return df.withColumns(
        {
            "url_canonical": canonicalize_url(u),
            "url_host_name": host,
            "url_domain": registered_domain(host),
        }
    )


def domain_stats(
    df: DataFrame, url_col: str, size_col: str, group_col: str | None = None
) -> DataFrame:
    """Per registered domain: document count, total ``size_col``,
    distinct hosts, distinct ``group_col`` values (e.g. lang) — the
    table a curation pass ranks to set per-domain quotas. One
    algebraic aggregation; the shuffle carries |domains| rows."""
    host = url_host(F.col(url_col))
    staged = df.select(
        registered_domain(host).alias("domain"),
        host.alias("__host"),
        F.col(size_col).cast("long").alias("__sz"),
        *([F.col(group_col).alias("__g")] if group_col else []),
    )
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__sz").alias("total_size"),
        F.countDistinct("__host").alias("n_hosts"),
    ]
    if group_col:
        aggs.append(F.countDistinct("__g").alias(f"n_{group_col}"))
    return staged.groupBy("domain").agg(*aggs)


def filter_blocked_domains(
    df: DataFrame, url_col: str, blocked: list[str]
) -> DataFrame:
    """Drop rows whose registered domain is blocklisted. Rows whose
    URL yields a NULL domain (missing/unparseable URL) are KEPT — the
    blocklist names domains to drop, and an unattributable row matches
    none of them (a bare ``~isin`` would silently drop them through
    three-valued NULL logic). The list ships as a broadcast literal
    (`isin`), so the predicate is a scan-level filter — for
    million-entry blocklists use a broadcast anti-join on
    ``url_domain`` instead."""
    if not blocked:
        return df
    from margaret_spark.functions.shingling import bind1

    dom = registered_domain(url_host(F.col(url_col)))
    # dom bound once: the NULL-keep disjunction references it twice,
    # which doubled the whole host-derivation tree in the Filter's
    # generated code (the r10 64 KB culprit, with the synthetic-URL
    # fixture substituted in by pushdown)
    return df.where(
        bind1(dom, lambda d: d.isNull() | ~d.isin(*blocked))
    )
