"""URL parsing / canonicalization / registrable-domain tests.

The parser is differential-tested against CPython's urllib.parse (the
stdlib reference implementation of RFC 3986 splitting) over a generated
corpus, then the canonicalizer is pinned case-by-case and checked for
idempotence (canon(canon(u)) == canon(u)) — the property that makes it
safe to re-run over an already-canonicalized crawl frontier.
"""

import urllib.parse

from pyspark.sql import functions as F

from hamerkop_spark.functions.url import (
    registrable_domain,
    url_canonicalize,
    url_parts,
)

def rows(df, *cols):
    if cols:
        df = df.select(*cols)
    return sorted(tuple(r) for r in df.collect())


def _gen_urls():
    """Deterministic mixed corpus: every combination of scheme casing,
    userinfo, port, path depth, query, fragment."""
    urls = []
    i = 0
    for scheme in ("http", "HTTPS", "ftp"):
        for auth in ("example.com", "WWW.Example.COM:8080",
                     "user@site.co.uk", "u:p@h.net:443", "10.0.0.1:80"):
            for path in ("", "/", "/a/b.html", "/a%20b/c"):
                for q in ("", "?", "?x=1", "?b=2&a=1&utm_source=s",
                          "?flag&z=9&gclid=g1"):
                    for frag in ("", "#top"):
                        if i % 3 == 0:  # keep the corpus ~200 rows
                            urls.append(
                                f"{scheme}://{auth}{path}{q}{frag}"
                            )
                        i += 1
    urls += ["not a url", "", "mailto:x@y.z", "//nohost/path",
             "http://host/?#", "http://host#only-frag"]
    return urls


def _parts_df(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return df.select("url", url_parts("url").alias("p")).select(
        "url", "p.*"
    )


def test_parts_differential_vs_urllib(spark):
    urls = _gen_urls()
    got = {r["url"]: r for r in _parts_df(spark, urls).collect()}
    for u in urls:
        r = got[u]
        sp = urllib.parse.urlsplit(u)
        if "://" not in u or not sp.scheme or sp.netloc == "":
            # our parser only accepts absolute scheme://authority forms
            assert r["scheme"] is None, u
            continue
        assert r["scheme"].lower() == sp.scheme, u
        assert (r["host"] or "").lower() == (sp.hostname or ""), u
        port = int(r["port"]) if r["port"] else None
        assert port == sp.port, u
        assert r["path"] == sp.path, u
        assert r["query"] == sp.query, u
        assert r["fragment"] == sp.fragment, u
        user = sp.username or ""
        if sp.password is not None:
            user += ":" + sp.password
        assert r["userinfo"] == user, u


CANON_CASES = [
    # case normalization: scheme + host only, path untouched
    ("HTTP://WWW.Example.COM/A/B", "http://www.example.com/A/B"),
    # default ports dropped, non-default kept
    ("http://h.com:80/x", "http://h.com/x"),
    ("https://h.com:443/x", "https://h.com/x"),
    ("http://h.com:8080/x", "http://h.com:8080/x"),
    ("https://h.com:80/x", "https://h.com:80/x"),
    # fragment removed; empty path -> '/'
    ("http://h.com#frag", "http://h.com/"),
    ("http://h.com/p#a/b?c", "http://h.com/p"),
    # query: tracking stripped, atoms sorted, duplicates kept,
    # valueless keys kept, empty query -> no '?'
    ("http://h.com/p?b=2&a=1", "http://h.com/p?a=1&b=2"),
    ("http://h.com/p?a=1&utm_source=x&b=2", "http://h.com/p?a=1&b=2"),
    ("http://h.com/p?gclid=9", "http://h.com/p"),
    ("http://h.com/p?utm_campaign", "http://h.com/p"),
    ("http://h.com/p?ref=tw&a=1", "http://h.com/p?a=1"),
    ("http://h.com/p?refresh=1", "http://h.com/p?refresh=1"),  # not 'ref'
    ("http://h.com/p?a=2&a=1&flag", "http://h.com/p?a=1&a=2&flag"),
    ("http://h.com/p?", "http://h.com/p"),
    # userinfo preserved, host still lowercased
    ("http://User@H.com/p", "http://User@h.com/p"),
    ("http://u:p@h.com:81/", "http://u:p@h.com:81/"),
    # percent-encoding left byte-exact
    ("http://h.com/a%2Fb?x=%20", "http://h.com/a%2Fb?x=%20"),
    # non-URLs -> NULL
    ("not a url", None),
    ("", None),
    ("mailto:x@y.z", None),
]


def test_canonicalize_cases(spark):
    df = spark.createDataFrame(
        [(u,) for u, _ in CANON_CASES], ["url"]
    ).select("url", url_canonicalize("url").alias("c"))
    got = {r["url"]: r["c"] for r in df.collect()}
    for u, want in CANON_CASES:
        assert got[u] == want, (u, got[u], want)


def test_canonicalize_idempotent(spark):
    urls = _gen_urls() + [u for u, _ in CANON_CASES]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    two = df.select(
        url_canonicalize("url").alias("c1"),
        url_canonicalize(url_canonicalize("url")).alias("c2"),
    )
    bad = two.where(~F.col("c1").eqNullSafe(F.col("c2"))).count()
    assert bad == 0


DOMAIN_CASES = [
    ("www.example.com", "example.com"),
    ("a.b.shop.example.co.uk", "example.co.uk"),
    ("Example.CO.UK", "example.co.uk"),
    ("example.com", "example.com"),
    ("co.uk", "co.uk"),          # bare suffix: nothing above it
    ("localhost", "localhost"),
    ("10.1.2.3", "10.1.2.3"),    # IPv4 literal passes through
    ("news.example.com.au", "example.com.au"),
    ("deep.sub.example.org", "example.org"),
]


def test_registrable_domain(spark):
    df = spark.createDataFrame(
        [(h,) for h, _ in DOMAIN_CASES], ["host"]
    ).select("host", registrable_domain("host").alias("d"))
    got = {r["host"]: r["d"] for r in df.collect()}
    for h, want in DOMAIN_CASES:
        assert got[h] == want, (h, got[h], want)


def test_registrable_domain_override_list(spark):
    df = spark.createDataFrame([("x.y.custom.tld",)], ["host"]).select(
        registrable_domain("host", ["custom.tld"]).alias("d")
    )
    assert rows(df) == [("y.custom.tld",)]


def test_canonical_dedup_groups(spark):
    """The crawl-dedup story end-to-end: four tracking/casing/port
    variants of one page collapse to one canonical key; a genuinely
    different page does not."""
    urls = [
        (0, "http://Example.com/item/7?b=2&a=1"),
        (1, "HTTP://EXAMPLE.COM:80/item/7?a=1&utm_source=feed&b=2"),
        (2, "http://example.com/item/7?b=2&a=1&gclid=g7#sec"),
        (3, "http://example.com/item/7?a=1&b=2&ref=tw"),
        (4, "http://example.com/item/8?a=1&b=2"),
        (5, "garbage"),
    ]
    df = spark.createDataFrame(urls, ["doc_id", "url"])
    groups = (
        df.select("doc_id", url_canonicalize("url").alias("canon"))
        .where(F.col("canon").isNotNull())
        .groupBy("canon")
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("first_doc"))
    )
    assert rows(groups, "canon", "n", "first_doc") == [
        ("http://example.com/item/7?a=1&b=2", 4, 0),
        ("http://example.com/item/8?a=1&b=2", 1, 4),
    ]


def test_plan_is_udf_free(spark):
    """The whole family must stay inside codegen: no BatchEvalPython /
    ArrowEvalPython nodes in the plan."""
    df = spark.range(10).select(
        F.concat(F.lit("http://h.com/p/"), F.col("id")).alias("url")
    )
    out = df.select(
        url_canonicalize("url").alias("c"),
        registrable_domain(url_parts("url")["host"]).alias("d"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan
