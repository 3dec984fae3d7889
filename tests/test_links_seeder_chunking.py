"""Golden tests for link scoring, seeder filters, chunking, cache-read,
and adaptive metrics — oracles are pure-Python transcriptions of the
reference algorithms (utils.py:3380-3492, async_url_seeder.py:1585-1679,
chunking_strategy.py, async_webcrawler.py:269-335,
adaptive_crawler.py:311-413)."""

import math

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.functions import chunking, links
from crawl4ai_spark.operators import adaptive, seeder
from crawl4ai_spark.operators.cache import cache_lookup


# ---------------------------------------------------------------------------
# link intrinsic score
# ---------------------------------------------------------------------------


def _intrinsic_oracle(text, url, title, cls, rel, terms, is_docs):
    score = 0.0
    if title and len(title.strip()) > 3:
        score += 1.0
    cs = (cls or "").lower()
    if any(c in cs for c in ["nav", "menu", "primary", "main", "important"]):
        score += 1.5
    if any(c in cs for c in ["ad", "sponsor", "track", "promo", "banner"]):
        score -= 1.0
    rs = (rel or "").lower()
    if any(r in rs for r in ["canonical", "next", "prev", "chapter"]):
        score += 1.0
    if any(r in rs for r in ["nofollow", "sponsored", "ugc"]):
        score -= 0.5
    ul = url.lower()
    if any(p in ul for p in ["/docs/", "/api/", "/guide/", "/tutorial/", "/reference/", "/manual/"]):
        score += 2.0
    elif any(p in ul for p in ["/blog/", "/article/", "/post/", "/news/"]):
        score += 1.0
    if any(p in ul for p in ["/admin/", "/login/", "/cart/", "/checkout/", "/track/", "/click/"]):
        score -= 1.5
    depth = url.count("/") - 2
    if depth <= 2:
        score += 1.0
    elif depth > 5:
        score -= 0.5
    if url.startswith("https://"):
        score += 0.5
    tc = (text or "").strip()
    if len(tc) > 3:
        score += 1.0
    wc = len(tc.split())
    if wc >= 2:
        score += 0.5
    if wc >= 4:
        score += 0.5
    if tc.lower() in ["click here", "read more", "more info", "link", "here"]:
        score -= 1.0
    if terms and tc:
        lw = {w.strip('.,!?;:"()[]{}').lower() for w in tc.split() if len(w.strip('.,!?;:"()[]{}')) > 2}
        if lw:
            ov = len(lw & set(terms))
            if ov > 0:
                score += (ov / min(len(lw), 10)) * 2.0
    if is_docs and tc and any(k in tc.lower() for k in ["api", "reference", "guide", "tutorial", "example"]):
        score += 1.0
    return max(0.0, min(score, 10.0))


LINK_CASES = [
    ("API Reference Guide", "https://docs.example.com/docs/api", "see docs", "nav-main", "", ["api", "reference"], True),
    ("click here", "http://x.com/a/b/c/d/e/f/g", "", "ad-banner", "nofollow", [], False),
    ("read more", "https://x.com/blog/post-1", "t", "", "next", ["post"], False),
    ("", "https://x.com/login/form", None, None, None, [], False),
    ("Tutorial: joins and windows explained", "https://x.com/guide/joins", "long title", "menu", "canonical", ["joins", "windows"], True),
    ("here", "https://x.com/", "", "", "sponsored ugc", [], False),
]


def test_intrinsic_score_matches_reference(spark):
    df = spark.createDataFrame(
        [(i, *c) for i, c in enumerate(LINK_CASES)],
        "i int, text string, url string, title string, cls string, rel string, terms array<string>, is_docs boolean",
    )
    got = {
        r["i"]: r["s"]
        for r in df.select(
            "i",
            links.intrinsic_score_expr(
                F.col("text"), F.col("url"), F.col("title"), F.col("cls"), F.col("rel"),
                page_terms=F.col("terms"), is_docs_site=F.col("is_docs"),
            ).alias("s"),
        ).collect()
    }
    for i, c in enumerate(LINK_CASES):
        assert got[i] == pytest.approx(_intrinsic_oracle(*c), abs=1e-9), (i, c)


def test_total_score(spark):
    df = spark.createDataFrame([(8.0, 0.6), (None, 0.6), (4.0, None)], "i double, c double")
    rows = df.select(
        links.total_score_expr(F.col("i"), F.col("c"), True, True).alias("both"),
        links.total_score_expr(F.col("i"), None, True, False).alias("intr"),
        links.total_score_expr(F.col("i"), F.col("c"), False).alias("off"),
    ).collect()
    assert rows[0]["both"] == pytest.approx(8.0 * 0.7 + 6.0 * 0.3)
    assert rows[0]["intr"] == 8.0
    assert rows[0]["off"] == 5.0
    assert rows[1]["both"] == pytest.approx(0.0 * 0.7 + 6.0 * 0.3)
    assert rows[2]["intr"] == 4.0


# ---------------------------------------------------------------------------
# seeder
# ---------------------------------------------------------------------------

NONSENSE_CASES = [
    ("https://a.com/robots.txt", True),
    ("https://a.com/sitemap.xml", True),
    ("https://a.com/sitemap/news.xml", True),
    ("https://a.com/favicon.ico", True),
    ("https://a.com/.well-known/security.txt", True),
    ("https://a.com/wp-admin/options.php", True),
    ("https://a.com/deep/search/results", True),
    ("https://a.com/blog/post-1", False),
    ("https://a.com/ab", True),
    ("https://a.com/en", False),
    ("https://a.com/", False),
    ("https://a.com/page?print=1", True),
    ("https://a.com/a_print.html", True),
    ("https://a.com/docs/guide", False),
    ("https://a.com/products/item-42", False),
]


def test_nonsense_filter(spark):
    df = spark.createDataFrame(NONSENSE_CASES, "url string, expected boolean")
    bad = df.filter(
        seeder.is_nonsense_url_expr(F.col("url")) != F.col("expected")
    ).collect()
    assert bad == [], bad


def test_glob_match(spark):
    cases = [
        ("https://www.example.com/docs/x", "example.com/docs/*", True),
        ("https://example.com/a", "*.pdf", False),
        ("http://example.com/a/b", "example.com/*", True),
        ("https://other.com/docs/x", "example.com/*", False),
        ("https://example.com/docs/x", "https://*/docs/*", True),
    ]
    df = spark.createDataFrame([(u, p, e) for u, p, e in cases], "url string, pat string, expected boolean")
    for u, p, e in cases:
        got = df.filter(F.col("url") == u).select(
            seeder.glob_match_expr(F.col("url"), p).alias("m")
        ).first()["m"]
        assert got == e, (u, p)


def test_seed_urls_pipeline(spark):
    rows = [
        ("https://a.com/docs/spark-joins", "spark joins windows guide"),
        ("https://a.com/docs/pandas", "pandas dataframe ops"),
        ("https://a.com/robots.txt", "nonsense"),
        ("https://a.com/docs/spark-agg", "spark aggregation deep dive"),
        ("https://a.com/blog/other", "unrelated text"),
        ("https://a.com/docs/spark-joins", "spark joins windows guide"),  # dup
    ]
    src = spark.createDataFrame(rows, "url string, head_text string")
    out = seeder.seed_urls(
        [src], pattern="*a.com/docs/*", query_terms=["spark"], max_urls=2
    ).collect()
    assert len(out) == 2
    assert all("spark" in r["head_text"] for r in out)
    assert out[0]["relevance_score"] >= out[1]["relevance_score"]


# ---------------------------------------------------------------------------
# chunking (oracle = reference transcription)
# ---------------------------------------------------------------------------


def _fixed_oracle(text, size):
    w = text.split()
    return [" ".join(w[i : i + size]) for i in range(0, len(w), size)]


def _sliding_oracle(text, window, step):
    words = text.split()
    if len(words) <= window:
        return [text]
    chunks = []
    i = 0
    for i in range(0, len(words) - window + 1, step):
        chunks.append(" ".join(words[i : i + window]))
    if i + window < len(words):
        chunks.append(" ".join(words[-window:]))
    return chunks


def _overlap_oracle(text, window, overlap):
    words = text.split()
    if len(words) <= window:
        return [text]
    chunks = []
    start = 0
    while start < len(words):
        end = start + window
        chunks.append(" ".join(words[start:end]))
        if end >= len(words):
            break
        start = end - overlap
    return chunks


TEXTS = [
    " ".join(f"w{i}" for i in range(n)) for n in (0, 1, 3, 4, 7, 10, 11, 25)
]


@pytest.mark.parametrize(
    "expr,oracle,args",
    [
        (chunking.fixed_length_chunks_expr, _fixed_oracle, (4,)),
        (chunking.sliding_window_chunks_expr, _sliding_oracle, (4, 2)),
        (chunking.overlapping_window_chunks_expr, _overlap_oracle, (4, 1)),
    ],
)
def test_chunking_parity(spark, expr, oracle, args):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "i int, text string")
    got = {
        r["i"]: r["c"] for r in df.select("i", expr(F.col("text"), *args).alias("c")).collect()
    }
    for i, t in enumerate(TEXTS):
        if not t.split():  # empty text: reference fixed gives [], sliding/overlap give [text]
            continue
        assert got[i] == oracle(t, *args), (i, t, args)


def test_regex_chunks(spark):
    df = spark.createDataFrame([("a\n\nb\n\nc d",)], "text string")
    got = df.select(chunking.regex_chunks_expr(F.col("text")).alias("c")).first()["c"]
    assert got == ["a", "b", "c d"]


# ---------------------------------------------------------------------------
# cache read
# ---------------------------------------------------------------------------


def test_cache_lookup_statuses(spark):
    frontier = spark.createDataFrame([(u,) for u in "abcd"], "url string")
    cache = spark.createDataFrame(
        [("a", "<a>", "e1", "f1"), ("b", "<b>", "e2", "f2"), ("c", "<c>", "e3", "f3")],
        "url string, html string, etag string, head_fingerprint string",
    )
    live = spark.createDataFrame(
        [("a", "e1", "fX"), ("b", "eX", "fY")],  # a: etag fresh; b: stale; c: absent
        "url string, etag string, head_fingerprint string",
    )
    out = {
        r["url"]: (r["cache_status"], r["cached_html"])
        for r in cache_lookup(frontier, cache, live, check_freshness=True).collect()
    }
    assert out["a"] == ("hit_validated", "<a>")
    assert out["b"] == ("miss", None)
    assert out["c"] == ("hit_fallback", "<c>")
    assert out["d"] == ("miss", None)
    # freshness off: plain hit/miss
    out2 = {
        r["url"]: r["cache_status"] for r in cache_lookup(frontier, cache).collect()
    }
    assert out2 == {"a": "hit", "b": "hit", "c": "hit", "d": "miss"}


# ---------------------------------------------------------------------------
# adaptive metrics
# ---------------------------------------------------------------------------


def test_adaptive_metrics(spark):
    docs = spark.createDataFrame(
        [(0, "spark joins and windows"), (1, "spark aggregation"), (2, "pandas frames")],
        "doc_id long, text string",
    )
    # coverage oracle
    tf = {"spark": 2, "joins": 1, "and": 1, "windows": 1, "aggregation": 1, "pandas": 1, "frames": 1}
    df_ = {"spark": 2, "joins": 1, "aggregation": 1}
    max_tf = 2
    def cov_term(t):
        if df_.get(t, 0) == 0:
            return 0.0
        return (df_[t] / 3) * (1 + 0.5 * math.log(1 + tf[t]) / math.log(1 + max_tf))
    expected_cov = min(1.0, math.sqrt((cov_term("spark") + cov_term("joins")) / 2))
    assert adaptive.coverage(docs, "spark joins") == pytest.approx(expected_cov)

    # consistency oracle: pairwise jaccard
    s0, s1, s2 = {"spark", "joins", "and", "windows"}, {"spark", "aggregation"}, {"pandas", "frames"}
    jac = lambda a, b: len(a & b) / len(a | b)
    expected_con = (jac(s0, s1) + jac(s0, s2) + jac(s1, s2)) / 3
    assert adaptive.consistency(docs) == pytest.approx(expected_con)

    assert adaptive.saturation([10, 5, 2]) == pytest.approx(1 - 2 / 10)
    assert adaptive.saturation([5]) == 0.0
    c = adaptive.confidence(docs, "spark joins", [10, 2])
    assert c["confidence"] == pytest.approx(
        0.4 * expected_cov + 0.3 * expected_con + 0.3 * (1 - 2 / 10)
    )


def test_new_terms_per_wave(spark):
    docs = spark.createDataFrame(
        [(0, 0, "aaa bbb"), (1, 1, "bbb ccc"), (2, 2, "ccc ddd eee")],
        "doc_id long, wave_id int, text string",
    )
    got = {r["wave_id"]: r["new_terms"] for r in adaptive.new_terms_per_wave(docs).collect()}
    assert got == {0: 2, 1: 1, 2: 2}


# ---------------------------------------------------------------------------
# head BM25 relevance + SEO score (reference transcription oracles)
# ---------------------------------------------------------------------------


def _head_bm25_oracle(title, desc, kw, all_meta, terms, k1=1.2, b=0.75, avgdl=1000):
    doc = " ".join([title * 3, desc * 2, kw, all_meta])
    toks = doc.lower().split()
    dl = len(toks)
    score = 0.0
    for term in set(" ".join(terms).lower().split()):
        tf = toks.count(term)
        idf = math.log(2 / (tf + 0.5) + 1)
        score += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
    return score


def test_head_bm25_matches_reference(spark):
    from crawl4ai_spark.functions.filters import head_bm25_score_expr

    rows = [
        ("spark joins guide", "deep dive into spark", "spark,sql", "extra spark words"),
        ("unrelated title", "nothing here", "", ""),
        ("spark spark", "spark", "spark", "spark spark spark"),
    ]
    terms = ["spark", "joins"]
    df = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(rows)], "i int, t string, d string, k string, m string"
    )
    got = {
        r["i"]: r["s"]
        for r in df.select(
            "i",
            head_bm25_score_expr(
                F.col("t"), F.col("d"), F.col("k"), F.col("m"), terms
            ).alias("s"),
        ).collect()
    }
    for i, r in enumerate(rows):
        assert got[i] == pytest.approx(_head_bm25_oracle(*r, terms), rel=1e-12), (i, r)


def _seo_oracle(url, title, desc, canonical, robots, head_html, keywords):
    import re as _re
    from urllib.parse import urlparse

    def title_length(t):
        n = len(t)
        if 50 <= n <= 60:
            return 1.0
        if 40 <= n < 50 or 60 < n <= 70:
            return 0.7
        return 0.3

    def kw(t):
        if not keywords:
            return 0.0
        pat = _re.compile(r"\b({})\b".format("|".join(map(_re.escape, keywords))), _re.I)
        return min(len(pat.findall(t)) * 0.3, 1.0)

    def meta_desc(d):
        n = len(d)
        if 140 <= n <= 160:
            return 1.0
        return 0.5 if 120 <= n <= 200 else 0.2

    def canon(c):
        if not c:
            return 0.5
        return 1.0 if c == url else 0.2

    def url_quality():
        p = urlparse(url)
        path = p.path.lower()
        s = 1.0
        if len(path) > 80:
            s *= 0.7
        if _re.search(r"\d{4}", path):
            s *= 0.8
        if p.query:
            s *= 0.6
        if "_" in path:
            s *= 0.9
        return s

    scores = {
        "title_length": title_length(title),
        "title_kw": kw(title),
        "meta_description": meta_desc(desc),
        "canonical": canon(canonical),
        "robot_ok": 0.0 if "noindex" in (robots or "") else 1.0,
        "schema_org": 1.0 if _re.search(r'<script[^>]+type=["\']application/ld\+json', head_html) else 0.0,
        "url_quality": url_quality(),
    }
    from crawl4ai_spark.functions.filters import SEO_DEFAULT_WEIGHTS

    return sum(w * scores[f] for f, w in SEO_DEFAULT_WEIGHTS.items())


def test_seo_score_matches_reference(spark):
    from crawl4ai_spark.functions.filters import seo_score_expr

    cases = [
        (
            "https://x.com/docs/spark-guide",
            "The Complete Spark Performance Tuning Guide 2024!!",  # 50 chars
            "d" * 150,
            "https://x.com/docs/spark-guide",
            "index,follow",
            '<head><script type="application/ld+json">{}</script></head>',
        ),
        (
            "https://x.com/a_b/" + "p" * 80 + "?q=1",
            "short",
            "d" * 30,
            "",
            "noindex",
            "<head></head>",
        ),
        (
            "https://x.com/archive/1999/post",
            "Spark and spark again spark here plus more padding!",
            "d" * 125,
            "https://other.example.com/",
            "",
            "<head><script src='x.js'></script></head>",
        ),
    ]
    keywords = ["spark", "guide"]
    df = spark.createDataFrame(
        [(i, *c) for i, c in enumerate(cases)],
        "i int, url string, title string, descr string, canonical string, robots string, head_html string",
    )
    got = {
        r["i"]: r["s"]
        for r in df.select(
            "i",
            seo_score_expr(
                F.col("url"), F.col("title"), F.col("descr"), F.col("canonical"),
                F.col("robots"), F.col("head_html"), keywords=keywords,
            ).alias("s"),
        ).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == pytest.approx(_seo_oracle(*c, keywords), abs=1e-12), (i, c)


# ---------------------------------------------------------------------------
# adaptive digest loop
# ---------------------------------------------------------------------------


def test_digest_progressive_crawl(spark):
    """digest() crawls toward the query: relevant pages first (term-overlap
    ranking), stops at max_pages or confidence."""
    pages = {
        "https://x.com/": (
            "spark overview landing page content words here",
            [("https://x.com/spark-joins", "spark joins guide", "spark joins"),
             ("https://x.com/cooking", "cooking recipes", "food"),
             ("https://x.com/spark-agg", "spark aggregation tips", "spark agg")],
        ),
        "https://x.com/spark-joins": ("deep spark joins content with windows", []),
        "https://x.com/spark-agg": ("spark aggregation pipelines content", []),
        "https://x.com/cooking": ("cooking recipes totally unrelated", []),
    }

    def fetch_text_fn(urls):
        rows = [
            (u, pages[u][0], [{"href": h, "text": t, "title": ti} for h, t, ti in pages[u][1]])
            for u in urls if u in pages
        ]
        return spark.createDataFrame(
            rows, "url string, text string, links array<struct<href string, text string, title string>>"
        )

    out = adaptive.digest(
        spark, fetch_text_fn, "https://x.com/", "spark joins",
        confidence_threshold=0.99, max_pages=3, top_k_links=1,
    )
    # start + 2 more (max_pages=3); relevance ranks the spark pages first
    assert out["crawl_order"][0] == "https://x.com/"
    assert out["crawl_order"][1] == "https://x.com/spark-joins"
    assert len(out["crawl_order"]) == 3
    assert "https://x.com/cooking" not in out["crawl_order"]
    assert out["metrics"][-1]["pages"] == 3
    assert 0.0 < out["confidence"]["confidence"] <= 1.0


def test_rank_links_scores(spark):
    links = spark.createDataFrame(
        [("h1", "spark joins guide", "t"), ("h2", "cooking food", ""), ("h3", "", "")],
        "href string, text string, title string",
    )
    vocab = spark.createDataFrame([("spark",), ("guide",)], "term string")
    ranked = adaptive.rank_links(links, "spark joins", vocab).collect()
    by = {r["href"]: r for r in ranked}
    # h1: overlap 2/2 = 1.0; terms {spark,joins,guide}, new = {joins} → 1/3
    assert by["h1"]["relevance"] == pytest.approx(1.0)
    assert by["h1"]["novelty"] == pytest.approx(1 / 3)
    assert by["h1"]["score"] == pytest.approx(0.5 * 1.0 + 0.3 / 3 + 0.2)
    # h2: no overlap; both terms new → novelty 1.0
    assert by["h2"]["relevance"] == 0.0
    assert by["h2"]["novelty"] == pytest.approx(1.0)
    # h3: no terms → novelty 0.5
    assert by["h3"]["novelty"] == pytest.approx(0.5)
    assert ranked[0]["href"] == "h1"


# ---------------------------------------------------------------------------
# table extraction
# ---------------------------------------------------------------------------


def test_extract_tables(spark):
    from crawl4ai_spark.operators.scrape import extract_tables

    data_table = (
        '<table summary="stats" data-kind="x"><caption>Quarterly</caption>'
        "<thead><tr><th>region</th><th colspan=\"2\">sales</th></tr></thead>"
        "<tbody><tr><td>emea</td><td>10</td><td>20</td></tr>"
        "<tr><td>apac</td><td>30</td><td>40</td></tr></tbody></table>"
    )
    layout_table = '<table role="presentation"><tr><td>menu</td><td>content</td></tr></table>'
    headerless = (
        "<table><tbody>"
        + "".join(
            f"<tr><td>a{i} much longer data value</td><td>b{i} much longer data value</td></tr>"
            for i in range(3)
        )
        + "</tbody></table>"
    )
    html = f"<html><body>{data_table}{layout_table}{headerless}</body></html>"
    pages = spark.createDataFrame([("https://x.com/p", html)], "url string, html string")
    out = extract_tables(pages, table_score_threshold=7).collect()
    # layout table rejected (role=presentation -3, no th/thead/caption)
    assert len(out) == 2
    t0 = out[0]
    assert t0["caption"] == "Quarterly"
    assert t0["summary"] == "stats"
    assert t0["headers"] == ["region", "sales", "sales"]  # colspan expanded
    assert t0["rows"] == [["emea", "10", "20"], ["apac", "30", "40"]]
    assert (t0["row_count"], t0["column_count"]) == (2, 3)
    t1 = out[1]
    # no thead: first-row cells (td) become headers (table_extraction.py:247-252),
    # and they stay in the body rows too (xpath excludes thead rows only)
    assert t1["headers"] == ["a0 much longer data value", "b0 much longer data value"]
    assert t1["row_count"] == 3


def test_extract_tables_min_filters(spark):
    from crawl4ai_spark.operators.scrape import extract_tables

    small = (
        '<table><caption>c</caption><thead><tr><th>h</th></tr></thead>'
        "<tbody><tr><td>only one long data value here</td></tr></tbody></table>"
    )
    pages = spark.createDataFrame([("u", f"<html>{small}</html>")], "url string, html string")
    assert extract_tables(pages, table_score_threshold=5).count() == 1
    assert extract_tables(pages, table_score_threshold=5, min_cols=2).count() == 0
    assert extract_tables(pages, table_score_threshold=5, min_rows=2).count() == 0
