"""Per-URL config matcher, sitemap expansion, link-preview composition,
URL-relevance fallback, KB JSONL round-trip — with xchecks that execute
the reference's own extracted code."""

import gzip
from enum import Enum
from types import SimpleNamespace

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.config_match import (
    RunConfig,
    assign_config,
    assign_config_expr,
    is_match,
    select_config,
)
from crawl4ai_spark.operators.seeder import url_relevance_score, url_relevance_udf
from crawl4ai_spark.operators.sitemap import (
    expand_sitemaps,
    parse_sitemap_bytes,
    sitemap_candidates_from_robots,
)

from reference_loader import load_method


# ----------------------------------------------------------- config match
REF_CASES = [
    ("*.pdf", "or", "https://example.com/file.pdf"),
    ("*.pdf", "or", "https://example.com/doc.PDF"),
    ("*.pdf", "or", "file.pdf"),
    (["*/article/*", "*/blog/*", "*.html"], "or", "https://example.com/article/news"),
    (["*/article/*", "*/blog/*", "*.html"], "or", "https://example.com/page.php"),
    (["https://*", "*.com*"], "and", "https://example.com/page"),
    (["https://*", "*.com*"], "and", "http://example.com/page"),
    (["*/api/v[0-9]/*", "*.json"], "or", "https://example.com/api/v2/posts"),
    (None, "or", "https://anything.com"),
    ([], "or", "https://anything.com"),
    (["*.pdf", None, "*.doc"], "or", "test.pdf"),
]


def test_is_match_xcheck_reference():
    ref_is_match = load_method("async_configs.py", "CrawlerRunConfig", "is_match")

    class MatchMode(Enum):
        OR = "or"
        AND = "and"

    import crawl4ai_spark.operators.config_match as cm

    for matcher, mode, url in REF_CASES:
        self = SimpleNamespace(
            url_matcher=matcher, match_mode=MatchMode.OR if mode == "or" else MatchMode.AND
        )
        # the reference compares `self.match_mode == MatchMode.OR` against
        # ITS enum; patch the extracted fn's globals to our stand-in
        ref_is_match.__globals__["MatchMode"] = MatchMode
        assert is_match(url, matcher, mode) == ref_is_match(self, url), (matcher, mode, url)


def test_select_config_first_match_and_none():
    configs = [
        RunConfig("pdf", "*.pdf"),
        RunConfig("blog", ["*/blog/*", "*/article/*"]),
        RunConfig("short", url_matcher=lambda u: len(u) < 20),
    ]
    assert select_config("https://a.com/x.pdf", configs).name == "pdf"
    assert select_config("https://a.com/blog/p", configs).name == "blog"
    assert select_config("http://t.co/a", configs).name == "short"
    assert select_config("https://a-very-long-url.example.com/page", configs) is None
    assert select_config("x", RunConfig("single", None)).name == "single"
    assert select_config("x", []) is None


def test_assign_config_jvm_and_udf_paths_agree(spark):
    glob_configs = [
        RunConfig("pdf", "*.pdf"),
        RunConfig("blog", ["*/blog/*", "*/article/*"]),
        RunConfig("site", ["https://*", "*.com/*"], match_mode="and"),
    ]
    urls = [
        "https://a.com/x.pdf", "https://a.com/blog/p", "https://b.com/q",
        "http://b.com/q", "ftp://c.org/z",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    jvm = {r["url"]: r["config_name"] for r in assign_config(df, glob_configs).collect()}
    expected = {u: (lambda c: c.name if c else None)(select_config(u, glob_configs)) for u in urls}
    assert jvm == expected
    # callable in the set → UDF path, same answers on the glob-only part
    mixed = glob_configs + [RunConfig("fallback", url_matcher=lambda u: True)]
    udf = {r["url"]: r["config_name"] for r in assign_config(df, mixed).collect()}
    assert udf == {u: (lambda c: c.name if c else None)(select_config(u, mixed)) for u in urls}
    # plan check: glob-only path contains no python udf
    plan = assign_config(df, glob_configs)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


# --------------------------------------------------------------- sitemaps
SITEMAP_INDEX = b"""<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://h0.example.com/sm/a.xml</loc><lastmod>2024-02-01</lastmod></sitemap>
  <sitemap><loc>/sm/b.xml.gz</loc></sitemap>
</sitemapindex>"""

SITEMAP_A = b"""<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://h0.example.com/p1</loc><lastmod>2024-01-05</lastmod></url>
  <url><loc>/p2</loc></url>
  <url><loc></loc></url>
</urlset>"""

SITEMAP_B = gzip.compress(
    b"""<urlset><url><loc>https://h0.example.com/p3</loc></url>
<url><loc>https://h0.example.com/p1</loc></url></urlset>"""
)


def test_parse_sitemap_bytes_index_and_urlset():
    is_idx, locs, lastmod = parse_sitemap_bytes(
        "https://h0.example.com/sitemap.xml", SITEMAP_INDEX
    )
    assert is_idx
    # relative loc resolved against the sitemap url
    assert locs == [
        "https://h0.example.com/sm/a.xml",
        "https://h0.example.com/sm/b.xml.gz",
    ]
    assert lastmod == "2024-02-01"
    is_idx, locs, lastmod = parse_sitemap_bytes("https://h0.example.com/sm/a.xml", SITEMAP_A)
    assert not is_idx
    assert locs == ["https://h0.example.com/p1", "https://h0.example.com/p2"]
    assert lastmod == "2024-01-05"
    # .gz decompression keyed on the url suffix
    is_idx, locs, _ = parse_sitemap_bytes("https://h0.example.com/sm/b.xml.gz", SITEMAP_B)
    assert not is_idx and locs[0] == "https://h0.example.com/p3"


def test_sitemap_candidates_from_robots(spark):
    robots = spark.createDataFrame(
        [("h0.example.com", "User-agent: *\nSitemap: https://h0.example.com/custom.xml\nDisallow: /x")],
        "host string, rules string",
    )
    got = {r["sitemap_url"] for r in sitemap_candidates_from_robots(robots).collect()}
    assert got == {
        "https://h0.example.com/sitemap.xml",
        "https://h0.example.com/sitemap_index.xml",
        "https://h0.example.com/custom.xml",
    }


def test_expand_sitemaps_recursion(spark):
    store = spark.createDataFrame(
        [
            ("https://h0.example.com/sitemap.xml", bytearray(SITEMAP_INDEX)),
            ("https://h0.example.com/sm/a.xml", bytearray(SITEMAP_A)),
            ("https://h0.example.com/sm/b.xml.gz", bytearray(SITEMAP_B)),
        ],
        "sitemap_url string, content binary",
    )
    seeds = spark.createDataFrame([("https://h0.example.com/sitemap.xml",)], "sitemap_url string")
    out = expand_sitemaps(spark, seeds, store)
    rows = {r["url"]: r["source_sitemap"] for r in out.collect()}
    assert set(rows) == {
        "https://h0.example.com/p1",
        "https://h0.example.com/p2",
        "https://h0.example.com/p3",
    }
    assert rows["https://h0.example.com/p2"] == "https://h0.example.com/sm/a.xml"


# ------------------------------------------------------------ link preview
def test_link_preview_composition(spark):
    from crawl4ai_spark.operators.link_preview import filter_candidate_links, link_preview

    edges = spark.createDataFrame(
        [
            # src, href, is_external, link_seq, intrinsic
            ("p1", "https://s.com/docs/a", False, 0, 4.0),
            ("p1", "https://ext.org/z", True, 1, 2.0),
            ("p1", "https://s.com/blog/b", False, 2, 6.0),
            ("p1", "https://s.com/cart/x", False, 3, 1.0),
            ("p1", "https://s.com/docs/c", False, 4, 8.0),
            ("p1", "https://s.com/docs/d", False, 5, 3.0),
            ("p2", "https://s.com/docs/a", False, 0, 5.0),
        ],
        "src_url string, href string, is_external boolean, link_seq long, intrinsic_score double",
    )
    cand = filter_candidate_links(
        edges,
        include_internal=True,
        include_external=False,
        include_patterns=["*s.com/*"],
        exclude_patterns=["*/cart/*"],
        max_links=3,
    )
    got = {(r["src_url"], r["href"]): r["preview_rank"] for r in cand.collect()}
    # p1 internal order after excludes: docs/a(0), blog/b(2), docs/c(4) — cut at 3
    assert got == {
        ("p1", "https://s.com/docs/a"): 1,
        ("p1", "https://s.com/blog/b"): 2,
        ("p1", "https://s.com/docs/c"): 3,
        ("p2", "https://s.com/docs/a"): 1,
    }
    heads = spark.createDataFrame(
        [
            ("https://s.com/docs/a", "alpha data guide content"),
            ("https://s.com/blog/b", "unrelated words entirely here"),
        ],
        "url string, head_text string",
    )
    out = link_preview(
        edges, heads, query_terms=["data", "guide"],
        include_patterns=["*s.com/*"], exclude_patterns=["*/cart/*"], max_links=3,
    )
    rows = {(r["src_url"], r["href"]): r for r in out.collect()}
    a = rows[("p1", "https://s.com/docs/a")]
    assert a["head_extraction_status"] == "valid"
    assert a["contextual_score"] == pytest.approx(1.0)  # min-max top of 2-doc corpus
    assert a["total_score"] == pytest.approx(0.7 * 4.0 + 0.3 * 10.0)
    b = rows[("p1", "https://s.com/blog/b")]
    assert b["contextual_score"] == pytest.approx(0.0)
    assert b["total_score"] == pytest.approx(0.7 * 6.0)
    c = rows[("p1", "https://s.com/docs/c")]
    assert c["head_extraction_status"] == "not_processed"
    assert c["total_score"] is None  # untouched link (reference keeps original)


# -------------------------------------------------------- url relevance
def test_url_relevance_xcheck_reference():
    ref = load_method(
        "async_url_seeder.py", "AsyncUrlSeeder", "_calculate_url_relevance_score"
    )
    cases = [
        ("python tutorial", "https://www.example.com/python/tutorial-01?lang=en"),
        ("spark", "https://spark.apache.org/docs/latest/"),
        ("machine learning", "https://example.com/ml"),
        ("x", "https://a.b/c"),
        ("data engineering", "https://blog.example.com/data-engineering/intro?ref=hn&q=data"),
    ]
    for query, url in cases:
        assert url_relevance_score(query, url) == pytest.approx(ref(None, query, url)), (query, url)


def test_url_relevance_udf(spark):
    df = spark.createDataFrame(
        [("https://www.example.com/python/tutorial",), ("https://other.org/z",)],
        "url string",
    )
    rows = {r["url"]: r["s"] for r in df.select("url", url_relevance_udf("python tutorial")(F.col("url")).alias("s")).collect()}
    assert rows["https://www.example.com/python/tutorial"] > rows["https://other.org/z"]
    for u, s in rows.items():
        assert s == pytest.approx(url_relevance_score("python tutorial", u))


# ------------------------------------------------------------- KB export
def test_kb_jsonl_roundtrip(spark, tmp_path):
    from crawl4ai_spark.operators.adaptive import (
        export_knowledge_base,
        import_knowledge_base,
    )

    kb = spark.createDataFrame(
        [
            ("https://a.com/1", "2024-01-01T00:00:00", True, "spark joins",
             "# Doc\ncontent one", 1, 0.8, 2),
            ("https://a.com/2", None, True, "spark joins", "content two", 2, 0.9, 2),
        ],
        "url string, timestamp string, success boolean, query string, "
        "content string, crawl_order int, confidence_at_crawl double, total_documents int",
    )
    path = str(tmp_path / "kb")
    export_knowledge_base(kb, path)
    back = import_knowledge_base(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, kb.collect()))


def test_crawljob_config_matcher_gate(spark, tmp_path):
    """CrawlJob with run_configs: unmatched URLs become failed results
    (status 0) and never fetch; matched URLs crawl normally."""
    from crawl4ai_spark.operators.traversal import canonical_corpus_fetcher
    from crawl4ai_spark.pipeline import CrawlJob, JobConfig
    from crawl4ai_spark.sources.corpus import generate_corpus, page_url

    corpus = generate_corpus(seed=5, n_hosts=2, pages_per_host=6, with_images=False)
    pages = spark.createDataFrame(corpus["pages"])
    cfg = JobConfig(max_depth=2, wave_budget=100.0, use_bloom=False, emit_images=False)
    configs = [RunConfig("root", "*host0.example.com*"), RunConfig("other", "*host1.example.com/docs*")]
    job = CrawlJob(spark, canonical_corpus_fetcher(pages), catalog_root=str(tmp_path),
                   config=cfg, run_configs=configs)
    job.seed(spark.createDataFrame([(page_url(0, 0),), (page_url(1, 0),)], "url string"))
    job.run(max_waves=4)
    res = job.results().collect()
    by_url = {r["url"]: r for r in res}
    # host1 root matches no config → failed with status 0, never crawled
    h1root = "https://host1.example.com"
    assert not by_url[h1root]["success"] and by_url[h1root]["status_code"] == 0
    # host0 pages crawl normally
    assert any(r["success"] and "host0" in r["url"] for r in res)
    # host1 children were never discovered (root never fetched)
    assert not any("host1.example.com/" in u for u in by_url if by_url[u]["success"])


def test_seed_pipeline_end_to_end(spark):
    """Full seeds-ingest: robots-declared sitemaps → index expansion →
    filters → fallback relevance scoring → cut."""
    from crawl4ai_spark.operators.seeder import seed_pipeline

    robots = spark.createDataFrame(
        [("h0.example.com", "User-agent: *\nSitemap: https://h0.example.com/sitemap.xml")],
        "host string, rules string",
    )
    idx = b"<sitemapindex><sitemap><loc>/sm/a.xml</loc></sitemap></sitemapindex>"
    sm = (
        b"<urlset>"
        b"<url><loc>https://h0.example.com/python/tutorial</loc></url>"
        b"<url><loc>https://h0.example.com/misc/page</loc></url>"
        b"<url><loc>https://h0.example.com/wp-admin/options</loc></url>"
        b"<url><loc>https://h0.example.com/favicon.ico</loc></url>"
        b"</urlset>"
    )
    store = spark.createDataFrame(
        [
            ("https://h0.example.com/sitemap.xml", bytearray(idx)),
            ("https://h0.example.com/sm/a.xml", bytearray(sm)),
        ],
        "sitemap_url string, content binary",
    )
    cc = spark.createDataFrame(
        [("https://h0.example.com/python/reference",), ("https://h0.example.com/python/tutorial",)],
        "url string",
    )
    out = seed_pipeline(
        spark, robots, store, pattern="*example.com/*", query="python tutorial",
        extra_sources=[cc], max_urls=3,
    ).collect()
    urls = [r["url"] for r in out]
    # nonsense filtered (wp-admin, favicon); cross-source dup collapsed;
    # on-query urls rank first
    assert "https://h0.example.com/wp-admin/options" not in urls
    assert "https://h0.example.com/favicon.ico" not in urls
    assert len(urls) == len(set(urls)) == 3
    assert urls[0] == "https://h0.example.com/python/tutorial"
    scores = [r["relevance_score"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_assign_config_anchoring_no_substring_match(spark):
    """fnmatch is a FULL match: 'doc?' must not match 'xdoc5' on the JVM
    rlike path (translate() only end-anchors; rlike is a find)."""
    cfgs = [RunConfig("d", "doc?")]
    df = spark.createDataFrame([("doc5",), ("xdoc5",), ("doc55",)], "url string")
    got = {r["url"]: r["config_name"] for r in assign_config(df, cfgs).collect()}
    assert got == {"doc5": "d", "xdoc5": None, "doc55": None}
    for u in got:
        expect = select_config(u, cfgs)
        assert got[u] == (expect.name if expect else None)


def test_select_host_sitemaps_first_success_chain(spark):
    """Reference fallback order: /sitemap.xml beats /sitemap_index.xml
    beats robots-declared; declared lines only seed when NO conventional
    location resolves."""
    from crawl4ai_spark.operators.sitemap import select_host_sitemaps

    robots = spark.createDataFrame(
        [
            ("a.com", "Sitemap: https://a.com/alt.xml"),       # has /sitemap.xml too
            ("b.com", "Sitemap: https://b.com/alt1.xml\nSitemap: https://b.com/alt2.xml"),
            ("c.com", "User-agent: *"),                        # only index present
        ],
        "host string, rules string",
    )
    store = spark.createDataFrame(
        [
            ("https://a.com/sitemap.xml",), ("https://a.com/alt.xml",),
            ("https://c.com/sitemap_index.xml",),
        ],
        "sitemap_url string",
    )
    got = {}
    for r in select_host_sitemaps(robots, store).collect():
        got.setdefault(r["host"], set()).add(r["sitemap_url"])
    assert got["a.com"] == {"https://a.com/sitemap.xml"}       # declared ignored
    assert got["b.com"] == {"https://b.com/alt1.xml", "https://b.com/alt2.xml"}
    assert got["c.com"] == {"https://c.com/sitemap_index.xml"}


def test_bloom_version_null_rows_are_stale(spark):
    from crawl4ai_spark.operators.dedup import BLOOM_FORMAT_VERSION, bloom_version_ok, build_bloom
    from pyspark.sql import functions as F

    urls = spark.range(100).select(F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"))
    b = build_bloom(urls, n_partitions=2, m_bits=1 << 12)
    mixed = b.unionByName(b.withColumn("fmt_version", F.lit(None).cast("int")))
    assert bloom_version_ok(b)
    assert not bloom_version_ok(mixed)  # NULL rows = pre-version shards
