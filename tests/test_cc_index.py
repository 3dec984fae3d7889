"""CC index seeder (operators/cc_index.py): glob rule, latest-index
discovery, paginated fetch with 503 retry ladder, seeds-pipeline e2e."""

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.cc_index import (
    CC503,
    CC_RETRY_DELAYS,
    SyntheticCCIndex,
    cc_glob,
    cc_seed,
    latest_index,
    match_url,
)


def test_cc_glob_rule():
    # async_url_seeder.py:814-833
    assert cc_glob("example.com") == "*.example.com/*"
    assert cc_glob("https://example.com") == "*.example.com/*"
    assert cc_glob("example.com/blog") == "*.example.com/blog*"
    assert cc_glob(".example.com") == "*.example.com/*"
    assert cc_glob("example.com?q=1") == "*.example.com/*"
    assert cc_glob("example.com#frag") == "*.example.com/*"


def test_match_url_forms():
    assert match_url("https://www.example.com/a.html", "*.html")
    assert match_url("https://www.example.com/a", "example.com/*")  # www-stripped
    assert not match_url("https://example.org/a", "example.com/*")


def _server(fail503=None):
    urls = (
        [f"https://www.example.com/p{i}" + (".html" if i % 2 == 0 else "") for i in range(17)]
        + [f"https://docs.example.com/d{i}.html" for i in range(6)]
        + [f"https://other.net/x{i}.html" for i in range(5)]
    )
    collinfo = [{"id": "CC-MAIN-2026-30"}, {"id": "CC-MAIN-2026-26"}]
    return SyntheticCCIndex(
        collinfo, {"CC-MAIN-2026-30": urls}, page_size=7, fail503=fail503
    )


def test_latest_index_is_first_entry():
    assert latest_index(_server()) == "CC-MAIN-2026-30"


def test_cc_seed_pages_and_pattern(spark):
    srv = _server()
    out = cc_seed(spark, srv, ["example.com"], pattern="*.html").collect()
    # glob covers www. + docs. subdomains; pattern keeps only .html
    urls = {r["url"] for r in out}
    assert urls == {
        f"https://www.example.com/p{i}.html" for i in range(0, 17, 2)
    } | {f"https://docs.example.com/d{i}.html" for i in range(6)}
    assert all(r["attempts"] == 1 for r in out)
    # page assignment follows index order with page_size 7 (23 matching
    # glob records → 4 pages)
    assert {r["page"] for r in out} == {0, 1, 2, 3}


def test_cc_seed_retry_ladder(spark):
    glob = cc_glob("other.net")
    srv = _server(fail503={("CC-MAIN-2026-30", glob, 0): 2})
    out = cc_seed(spark, srv, ["other.net"], pattern="*").collect()
    assert {r["url"] for r in out} == {f"https://other.net/x{i}.html" for i in range(5)}
    assert all(r["attempts"] == 3 for r in out)  # two 503s then success
    # exceeding the ladder gives up loudly like the reference re-raise
    srv_bad = _server(fail503={("CC-MAIN-2026-30", glob, 0): len(CC_RETRY_DELAYS) + 1})
    with pytest.raises(Exception):
        cc_seed(spark, srv_bad, ["other.net"], pattern="*").collect()


def test_cc_seed_feeds_seed_pipeline(spark):
    """cc_seed output is a source for the existing seeds-ingest job."""
    from crawl4ai_spark.operators.seeder import seed_urls

    seeds = cc_seed(spark, _server(), ["example.com"], pattern="*.html").select("url")
    out = seed_urls([seeds], pattern="*example.com*", filter_nonsense=True)
    urls = {r["url"] for r in out.collect()}
    assert urls  # nonsense filter keeps real content paths
    assert all("example.com" in u for u in urls)
