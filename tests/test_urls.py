"""Golden tests for URL canonicalization — cases transcribed from the
reference suite (tests/test_normalize_url.py) plus deep-crawl identity
cases (utils.py:2334-2390 semantics)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.functions.urls import (
    efficient_normalize,
    get_base_domain,
    is_external_url,
    is_valid_crawl_url,
    light_normalize_expr,
    normalize_deep_udf,
    normalize_url,
    normalize_url_for_deep_crawl,
    with_canonical,
)

NORMALIZE_CASES = [
    ("path/to/page.html", "http://example.com/base/", "http://example.com/base/path/to/page.html"),
    ("page.html", "http://example.com/base/", "http://example.com/base/page.html"),
    ("page.html", "http://example.com/base", "http://example.com/page.html"),
    ("http://another.com/page.html", "http://example.com/", "http://another.com/page.html"),
    ("  page.html  ", "http://example.com/", "http://example.com/page.html"),
    ("page.html?query=test", "http://example.com/", "http://example.com/page.html?query=test"),
    ("https://secure.example.com/page.html", "http://example.com/", "https://secure.example.com/page.html"),
    ("../otherpage.html", "http://example.com/base/current/", "http://example.com/base/otherpage.html"),
    ("/otherpage.html", "http://example.com/base/current/", "http://example.com/otherpage.html"),
    ("file.html", "http://example.com/path", "http://example.com/file.html"),
    ("page.html", "http://example.com", "http://example.com/page.html"),
    ("?query=true", "http://example.com/page.html", "http://example.com/page.html?query=true"),
]


@pytest.mark.parametrize("href,base,expected", NORMALIZE_CASES)
def test_normalize_url_goldens(href, base, expected):
    assert normalize_url(href, base) == expected


def test_normalize_url_fragment_dropped():
    assert normalize_url("page.html#section", "http://example.com/") == "http://example.com/page.html"
    assert normalize_url("#fragment", "http://example.com/page.html") == "http://example.com/page.html"


def test_normalize_url_tracking_and_sort():
    got = normalize_url(
        "page?b=2&a=1&utm_source=x&gclid=y&REF=z", "https://example.com/"
    )
    assert got == "https://example.com/page?a=1&b=2"


DEEP_CASES = [
    # fragment dropped, netloc lowercased, trailing slash stripped
    ("https://EXAMPLE.com/A/B/#frag", "https://example.com/", "https://example.com/A/B"),
    # root path rstripped to empty (pinned reference quirk)
    ("https://example.com/", "https://example.com/", "https://example.com"),
    # tracking params (deep set) removed, blanks dropped by parse_qs
    (
        "https://example.com/p?utm_source=a&keep=1&empty=&fbclid=z",
        "https://example.com/",
        "https://example.com/p?keep=1",
    ),
    # multi-valued keys grouped in first-occurrence order (NOT sorted)
    ("https://example.com/p?b=2&a=1&b=3", "https://example.com/", "https://example.com/p?b=2&b=3&a=1"),
    # relative resolution
    ("child1", "https://host0.example.com/docs/p1", "https://host0.example.com/docs/child1"),
]


@pytest.mark.parametrize("href,base,expected", DEEP_CASES)
def test_normalize_deep_goldens(href, base, expected):
    assert normalize_url_for_deep_crawl(href, base) == expected


def test_normalize_deep_none():
    assert normalize_url_for_deep_crawl(None, "https://x.com") is None
    assert normalize_url_for_deep_crawl("", "https://x.com") is None


def test_base_domain_goldens():
    assert get_base_domain("https://www.example.com/x") == "example.com"
    assert get_base_domain("https://sub.example.co.uk/x") == "example.co.uk"
    assert get_base_domain("https://example.com:8080/") == "example.com"
    assert get_base_domain("nonsense") == ""


def test_is_external():
    assert is_external_url("mailto:a@b.com", "example.com")
    assert is_external_url("https://other.com/x", "example.com")
    assert not is_external_url("/relative", "example.com")
    assert not is_external_url("https://sub.example.com/x", "example.com")


def test_is_valid_crawl_url():
    assert is_valid_crawl_url("https://example.com/x")
    assert not is_valid_crawl_url("ftp://example.com/x")
    assert not is_valid_crawl_url("https://localhost/x")  # no dot
    assert not is_valid_crawl_url("not a url")


def test_spark_udf_matches_python(spark):
    rows = [(h, b) for h, b, _ in DEEP_CASES]
    df = spark.createDataFrame(rows, "href string, base string")
    got = df.select(normalize_deep_udf("href", "base").alias("n")).collect()
    for (h, b, expected), r in zip(DEEP_CASES, got):
        assert r["n"] == expected == normalize_url_for_deep_crawl(h, b)


def test_light_normalize_expr_matches_python(spark):
    urls = [
        "https://EXAMPLE.com/A/B/#frag",
        "https://example.com/",
        "https://example.com/p?b=2&a=1#x",
        "http://Host.COM/path//x///",
        "https://example.com/p?q=1",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r["n"] for r in df.select(light_normalize_expr(F.col("url")).alias("n")).collect()]
    expected = [efficient_normalize(u, u) for u in urls]
    assert got == expected


def test_with_canonical_equals_udf_on_mixed_corpus(spark):
    """The hybrid JVM-fast-path canonicalizer must agree with the exact
    stdlib UDF on every URL shape — clean, messy, relative, dotted,
    tracking-tainted, fragmented, uppercase, short."""
    hrefs = [
        # fast-path shapes
        "https://Example.COM/a/b/",
        "http://host7.example.com/view/item42",
        "https://x.com",
        "https://x.com/",
        "HTTPS://X.com/A//B///",
        "https://x.com/a-b_c~d",
        # slow-path shapes
        "https://x.com/p?utm_source=a&q=1#frag",
        "https://x.com/p?b=2&a=&c=3",
        "/relative/path",
        "page2.html",
        "../up/one",
        "https://x.com/a/./b/../c",
        "  https://x.com/spaced  ",
        "https://x.com/semi;params",
        "mailto:a@b.com",
        None,
        "",
        "https://x.com/.hidden/dir",
    ]
    base = "https://base.example.com/dir/page"
    df = spark.createDataFrame([(i, h, base) for i, h in enumerate(hrefs)], "i int, href string, base string")
    got = {
        r["i"]: r["canon"]
        for r in with_canonical(df, "href", "base", "canon").collect()
    }
    for i, h in enumerate(hrefs):
        expected = normalize_url_for_deep_crawl(h, base)
        assert got[i] == expected, (h, got[i], expected)
    assert len(got) == len(hrefs)  # split-union loses no rows
