"""Golden-value tests for scorer/filter column expressions — values
transcribed from tests/general/test_deep_crawl_scorers.py and
test_deep_crawl_filters.py in the reference suite."""

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.functions import filters, scorers


def _score(spark, scorer, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select("url", scorer(F.col("url")).alias("s")).collect()
    return {r["url"]: r["s"] for r in rows}


def test_keyword_relevance(spark):
    sc = scorers.keyword_relevance(["python", "blog"])
    got = _score(
        spark,
        sc,
        [
            "https://example.com/python-blog",
            "https://example.com/PYTHON-BLOG",
            "https://example.com/python-only",
            "https://example.com/other",
        ],
    )
    assert got["https://example.com/python-blog"] == 1.0
    assert got["https://example.com/PYTHON-BLOG"] == 1.0
    assert got["https://example.com/python-only"] == 0.5
    assert got["https://example.com/other"] == 0.0


def test_path_depth(spark):
    sc = scorers.path_depth(optimal_depth=2)
    got = _score(
        spark,
        sc,
        [
            "https://example.com/a/b",
            "https://example.com/a",
            "https://example.com/a/b/c",
            "https://example.com",
            "https://example.com/a/b/c/d/e/f/g",  # distance 5 → 1/6
        ],
    )
    assert got["https://example.com/a/b"] == 1.0
    assert got["https://example.com/a"] == 0.5
    assert got["https://example.com/a/b/c"] == 0.5
    assert got["https://example.com"] == pytest.approx(0.33333333)
    assert got["https://example.com/a/b/c/d/e/f/g"] == pytest.approx(1 / 6)


def test_content_type_scorer(spark):
    sc = scorers.content_type({".html$": 1.0, ".pdf$": 0.8, ".jpg$": 0.6})
    got = _score(
        spark,
        sc,
        [
            "https://example.com/doc.html",
            "https://example.com/doc.pdf",
            "https://example.com/img.jpg",
            "https://example.com/other.txt",
        ],
    )
    assert got["https://example.com/doc.html"] == 1.0
    assert got["https://example.com/doc.pdf"] == pytest.approx(0.8)
    assert got["https://example.com/img.jpg"] == pytest.approx(0.6)
    assert got["https://example.com/other.txt"] == 0.0


def test_freshness(spark):
    sc = scorers.freshness(current_year=2024)
    got = _score(
        spark,
        sc,
        [
            "https://example.com/2024/01/post",
            "https://example.com/2023/12/post",
            "https://example.com/2022/post",
            "https://example.com/no-date",
            "https://example.com/2010/old",  # diff 14 → max(0.1, 1-1.4)=0.1
        ],
    )
    assert got["https://example.com/2024/01/post"] == 1.0
    assert got["https://example.com/2023/12/post"] == pytest.approx(0.9)
    assert got["https://example.com/2022/post"] == pytest.approx(0.8)
    assert got["https://example.com/no-date"] == 0.5
    assert got["https://example.com/2010/old"] == pytest.approx(0.1)


def test_domain_authority(spark):
    sc = scorers.domain_authority(
        {"python.org": 1.0, "github.com": 0.8, "medium.com": 0.6}, default_weight=0.3
    )
    got = _score(
        spark,
        sc,
        [
            "https://python.org/about",
            "https://github.com/repo",
            "https://medium.com/post",
            "https://unknown.com",
        ],
    )
    assert got["https://python.org/about"] == 1.0
    assert got["https://github.com/repo"] == pytest.approx(0.8)
    assert got["https://medium.com/post"] == pytest.approx(0.6)
    assert got["https://unknown.com"] == pytest.approx(0.3)


def test_composite(spark):
    sc = scorers.composite(
        [scorers.keyword_relevance(["docs"], weight=1.0), scorers.path_depth(optimal_depth=1, weight=1.0)]
    )
    got = _score(spark, sc, ["https://example.com/docs"])
    # keyword 1.0, depth distance 0 → 1.0; normalized mean = 1.0
    assert got["https://example.com/docs"] == pytest.approx(1.0)


def test_weight_float32_semantics(spark):
    import ctypes

    w = 0.3  # not representable exactly in float32
    sc = scorers.keyword_relevance(["x"], weight=w)
    got = _score(spark, sc, ["https://example.com/x"])
    assert got["https://example.com/x"] == ctypes.c_float(w).value


# ---------------------------------------------------------------------------
# filters
# ---------------------------------------------------------------------------


def _filter(spark, flt, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select("url", flt(F.col("url")).alias("ok")).collect()
    return {r["url"]: r["ok"] for r in rows}


def test_url_pattern_suffix_prefix(spark):
    flt = filters.url_pattern(["*.html"])
    got = _filter(spark, flt, ["https://x.com/a.html", "https://x.com/a.pdf", "https://x.com/a.html?q=1"])
    assert got["https://x.com/a.html"]
    assert not got["https://x.com/a.pdf"]
    assert got["https://x.com/a.html?q=1"]

    flt2 = filters.url_pattern(["https://x.com/api/*"])
    got2 = _filter(
        spark,
        flt2,
        ["https://x.com/api/v1", "https://x.com/apiv2/v1", "https://x.com/api", "https://x.com/api?q=1"],
    )
    assert got2["https://x.com/api/v1"]
    assert not got2["https://x.com/apiv2/v1"]  # path-boundary check (pinned fix)
    assert got2["https://x.com/api"]
    assert got2["https://x.com/api?q=1"]


def test_url_pattern_regex_and_reverse(spark):
    flt = filters.url_pattern([r"^https://blog\."])
    got = _filter(spark, flt, ["https://blog.x.com/a", "https://x.com/blog"])
    assert got["https://blog.x.com/a"] and not got["https://x.com/blog"]

    rev = filters.url_pattern(["*.pdf"], reverse=True)
    got2 = _filter(spark, rev, ["https://x.com/a.pdf", "https://x.com/a.html"])
    assert not got2["https://x.com/a.pdf"] and got2["https://x.com/a.html"]


def test_domain_filter(spark):
    flt = filters.domain(allowed_domains=["example.com"], blocked_domains=["bad.example.com"])
    got = _filter(
        spark,
        flt,
        [
            "https://example.com/x",
            "https://sub.example.com/x",
            "https://bad.example.com/x",
            "https://deep.bad.example.com/x",
            "https://other.com/x",
        ],
    )
    assert got["https://example.com/x"]
    assert got["https://sub.example.com/x"]
    assert not got["https://bad.example.com/x"]
    assert not got["https://deep.bad.example.com/x"]
    assert not got["https://other.com/x"]


def test_content_type_filter(spark):
    flt = filters.content_type(["text/html", "application/pdf"])
    got = _filter(
        spark,
        flt,
        [
            "https://x.com/doc.html",
            "https://x.com/doc.pdf",
            "https://x.com/img.png",
            "https://x.com/no-extension",
            "https://x.com/dir/page",
        ],
    )
    assert got["https://x.com/doc.html"]
    assert got["https://x.com/doc.pdf"]
    assert not got["https://x.com/img.png"]
    assert got["https://x.com/no-extension"]  # extensionless passes
    assert got["https://x.com/dir/page"]


def test_chain(spark):
    flt = filters.chain(
        filters.domain(allowed_domains=["example.com"]),
        filters.url_pattern(["*.html"]),
    )
    got = _filter(spark, flt, ["https://example.com/a.html", "https://example.com/a.pdf", "https://o.com/a.html"])
    assert got["https://example.com/a.html"]
    assert not got["https://example.com/a.pdf"]
    assert not got["https://o.com/a.html"]
