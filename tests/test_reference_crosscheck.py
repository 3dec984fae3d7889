"""Cross-checks against the REAL reference implementation.

Every other test pins golden values or a transcription oracle; these
tests execute the reference's own functions (AST-extracted from
/root/reference — see reference_loader.py) side-by-side with our column
expressions / UDF twins over generated corpora, so any transcription
drift is caught mechanically.
"""

import random

import pytest
from pyspark.sql import functions as F

from reference_loader import load_defs, load_method

from crawl4ai_spark.functions import chunking, filters as flt, links, scorers
from crawl4ai_spark.functions.urls import (
    efficient_normalize,
    get_base_domain,
    is_external_url,
    normalize_url,
    normalize_url_for_deep_crawl,
)
from crawl4ai_spark.operators.scrape import parse_srcset_expr
from crawl4ai_spark.operators.seeder import is_nonsense_url_expr

# ---------------------------------------------------------------------------
# corpora
# ---------------------------------------------------------------------------

rng = random.Random(42)

_HOSTS = ["example.com", "www.Example.COM", "sub.shop.co.uk", "x.org:8080", "a.b.c.example.net"]
_PATHS = ["", "/", "/a", "/a/b/", "/a//b///", "/docs/guide", "/p.html", "/a/./b/../c", "/üni/ş"]
_QUERIES = [
    "", "?q=1", "?utm_source=x&q=1", "?b=2&a=1", "?a=&b=1", "?utm_campaign=c&ref=r",
    "?gclid=g&x=1&x=2", "?ref_src=t&Z=9",
]
_FRAGS = ["", "#f", "#sec-2"]
_RELS = ["page2", "./p", "../up", "/root/x", "//cdn.example.com/lib.js", "  /spaced  ", "p?utm_source=s"]


def url_corpus():
    urls = []
    for h in _HOSTS:
        for p in _PATHS:
            urls.append(f"https://{h}{p}")
    for i in range(120):
        urls.append(
            f"http{'s' if i % 2 else ''}://{rng.choice(_HOSTS)}{rng.choice(_PATHS)}"
            f"{rng.choice(_QUERIES)}{rng.choice(_FRAGS)}"
        )
    return urls


def href_base_corpus():
    bases = [f"https://{h}{p}" for h in _HOSTS[:3] for p in ["/", "/dir/page", "/a/b/"]]
    pairs = []
    for b in bases:
        for r in _RELS + _QUERIES + [""]:
            pairs.append((r, b))
        for u in url_corpus()[:20]:
            pairs.append((u, b))
    return pairs


# ---------------------------------------------------------------------------
# URL canonicalizers (seen-set identity — north-rule critical)
# ---------------------------------------------------------------------------


def test_normalizers_match_reference():
    ref = load_defs(
        "utils.py",
        ["normalize_url", "normalize_url_for_deep_crawl",
         "efficient_normalize_url_for_deep_crawl", "get_base_domain", "is_external_url"],
    )
    for href, base in href_base_corpus():
        assert normalize_url_for_deep_crawl(href, base) == ref["normalize_url_for_deep_crawl"](href, base), (href, base)
        assert normalize_url(href, base) == ref["normalize_url"](href, base), (href, base)
        assert efficient_normalize(href, base) == ref["efficient_normalize_url_for_deep_crawl"](href, base), (href, base)
    for u in url_corpus():
        assert get_base_domain(u) == ref["get_base_domain"](u), u
        for d in ["example.com", "shop.co.uk", "other.net"]:
            assert is_external_url(u, d) == ref["is_external_url"](u, d), (u, d)


# ---------------------------------------------------------------------------
# scorers
# ---------------------------------------------------------------------------


def _collect(spark, urls, exprs):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i int, url string")
    cols = [e(F.col("url")).alias(f"s{j}") for j, e in enumerate(exprs)]
    return {r["i"]: [r[f"s{j}"] for j in range(len(exprs))] for r in df.select("i", *cols).collect()}


def test_scorers_match_reference(spark):
    sc = load_defs(
        "deep_crawling/scorers.py",
        ["ScoringStats", "URLScorer", "KeywordRelevanceScorer", "PathDepthScorer",
         "ContentTypeScorer", "FreshnessScorer", "DomainAuthorityScorer", "CompositeScorer"],
        consts=["_SCORE_LOOKUP", "_FRESHNESS_SCORES"],
    )
    urls = url_corpus() + [
        "https://x.com/2024/a", "https://x.com/2019-post", "https://x.com/p_1999.html",
        "https://x.com/a.pdf", "https://x.com/a.HTML", "https://x.com/noext",
    ]
    ref_scorers = [
        sc["KeywordRelevanceScorer"](keywords=["docs", "guide", "example"], weight=0.7),
        sc["PathDepthScorer"](optimal_depth=2, weight=1.0),
        sc["PathDepthScorer"](optimal_depth=4, weight=0.5),
        sc["FreshnessScorer"](weight=0.9),
        sc["DomainAuthorityScorer"](domain_weights={"example.com": 0.9, "x.org": 0.3}, weight=1.0),
        sc["ContentTypeScorer"](type_weights={".html$": 1.0, ".pdf$": 0.4}, weight=1.0),
    ]
    mine = [
        scorers.keyword_relevance(["docs", "guide", "example"], weight=0.7),
        scorers.path_depth(optimal_depth=2, weight=1.0),
        scorers.path_depth(optimal_depth=4, weight=0.5),
        scorers.freshness(weight=0.9),
        scorers.domain_authority({"example.com": 0.9, "x.org": 0.3}, weight=1.0),
        scorers.content_type({".html$": 1.0, ".pdf$": 0.4}, weight=1.0),
    ]
    got = _collect(spark, urls, mine)
    for i, u in enumerate(urls):
        for j, rs in enumerate(ref_scorers):
            assert got[i][j] == pytest.approx(rs.score(u), abs=1e-9), (u, j)
    # composite
    comp_ref = sc["CompositeScorer"]([ref_scorers[1], ref_scorers[3]], normalize=True)
    comp_mine = scorers.composite([mine[1], mine[3]], normalize=True)
    gotc = _collect(spark, urls, [comp_mine])
    for i, u in enumerate(urls):
        assert gotc[i][0] == pytest.approx(comp_ref.score(u), abs=1e-9), u


# ---------------------------------------------------------------------------
# filters
# ---------------------------------------------------------------------------


def test_filters_match_reference(spark):
    fl = load_defs(
        "deep_crawling/filters.py",
        ["FilterStats", "URLFilter", "URLPatternFilter", "ContentTypeFilter", "DomainFilter"],
    )
    urls = url_corpus() + [
        "https://x.com/p.html?x=1", "https://x.com/a/b.PDF", "https://blog.example.com/post",
        "https://cdn.example.com/x.js", "https://x.com/docs/", "https://x.com/docs",
    ]
    cases = [
        (fl["URLPatternFilter"]("*.html"), flt.url_pattern("*.html")),
        (fl["URLPatternFilter"]("*/docs/*"), flt.url_pattern("*/docs/*")),
        (fl["URLPatternFilter"](["*.pdf", "*blog*"], reverse=True), flt.url_pattern(["*.pdf", "*blog*"], reverse=True)),
        (fl["ContentTypeFilter"]("text/html"), flt.content_type("text/html")),
        (fl["ContentTypeFilter"](["image"]), flt.content_type(["image"])),
        (fl["DomainFilter"](allowed_domains=["example.com"]), flt.domain(allowed_domains=["example.com"])),
        (
            fl["DomainFilter"](blocked_domains=["cdn.example.com"], allowed_domains=["example.com", "x.com"]),
            flt.domain(allowed_domains=["example.com", "x.com"], blocked_domains=["cdn.example.com"]),
        ),
    ]
    got = _collect(spark, urls, [m for _, m in cases])
    import asyncio

    for i, u in enumerate(urls):
        for j, (rf, _) in enumerate(cases):
            expected = rf.apply(u)
            if asyncio.iscoroutine(expected):
                expected = asyncio.get_event_loop().run_until_complete(expected)
            assert bool(got[i][j]) == bool(expected), (u, j)


# ---------------------------------------------------------------------------
# chunking
# ---------------------------------------------------------------------------


def test_chunking_matches_reference(spark):
    ch = load_defs(
        "chunking_strategy.py",
        ["ChunkingStrategy", "RegexChunking", "FixedLengthWordChunking",
         "SlidingWindowChunking", "OverlappingWindowChunking"],
    )
    texts = [" ".join(f"w{i}" for i in range(n)) for n in (1, 3, 4, 5, 8, 10, 11, 23, 40)]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, text string")
    got = {
        r["i"]: (r["f"], r["s"], r["o"])
        for r in df.select(
            "i",
            chunking.fixed_length_chunks_expr(F.col("text"), 4).alias("f"),
            chunking.sliding_window_chunks_expr(F.col("text"), 4, 2).alias("s"),
            chunking.overlapping_window_chunks_expr(F.col("text"), 5, 2).alias("o"),
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i][0] == ch["FixedLengthWordChunking"](chunk_size=4).chunk(t), t
        assert got[i][1] == ch["SlidingWindowChunking"](window_size=4, step=2).chunk(t), t
        assert got[i][2] == ch["OverlappingWindowChunking"](window_size=5, overlap=2).chunk(t), t


# ---------------------------------------------------------------------------
# seeder nonsense filter + srcset + link scores
# ---------------------------------------------------------------------------


def test_nonsense_matches_reference(spark):
    ref = load_method("async_url_seeder.py", "AsyncUrlSeeder", "_is_nonsense_url")
    urls = url_corpus() + [
        "https://a.com/robots.txt", "https://a.com/sitemap.xml", "https://a.com/sitemap/n.xml.gz",
        "https://a.com/favicon.ico", "https://a.com/.well-known/security.txt",
        "https://a.com/wp-admin/x", "https://a.com/deep/search/r", "https://a.com/ab",
        "https://a.com/en", "https://a.com/page?print=1", "https://a.com/a_print.html",
        "https://a.com/x/404/y", "https://a.com/AB", "https://a.com/a/.git/config",
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i int, url string")
    got = {
        r["i"]: r["n"]
        for r in df.select("i", is_nonsense_url_expr(F.col("url")).alias("n")).collect()
    }
    for i, u in enumerate(urls):
        assert got[i] == ref(None, u), u


def test_srcset_matches_reference(spark):
    ref = load_defs("content_scraping_strategy.py", ["parse_srcset"])["parse_srcset"]
    cases = [
        "https://c.com/a.jpg 320w, https://c.com/b.jpg 640w",
        "https://c.com/x.png 2x",
        " https://c.com/y.webp 1.5w ,, https://c.com/z.gif",
        "",
        "https://c.com/solo.jpg",
        "a.jpg 100w, b.jpg 200www, c.jpg w",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(cases)], "i int, s string")
    got = {
        r["i"]: [(v["url"], v["width"]) for v in r["v"]]
        for r in df.select("i", parse_srcset_expr(F.col("s")).alias("v")).collect()
    }
    for i, s in enumerate(cases):
        expected = [(d["url"], d["width"]) for d in ref(s)]
        assert got[i] == expected, s


def test_link_scores_match_reference(spark):
    ref = load_defs("utils.py", ["calculate_link_intrinsic_score", "calculate_total_score"])
    texts = ["API Reference Guide", "click here", "", "a very long descriptive link text here", "here"]
    urls = ["https://docs.x.com/docs/api", "http://x.com/a/b/c/d/e/f/g", "https://x.com/blog/p", "https://x.com/login/f", "https://x.com/"]
    rows = []
    i = 0
    for t in texts:
        for u in urls:
            rows.append((i, t, u, "title longer", "nav-x", "nofollow", ["api", "guide", "text"], i % 2 == 0))
            i += 1
    df = spark.createDataFrame(
        rows, "i int, text string, url string, title string, cls string, rel string, terms array<string>, is_docs boolean"
    )
    expr = links.intrinsic_score_expr(
        F.col("text"), F.col("url"), F.col("title"), F.col("cls"), F.col("rel"),
        page_terms=F.col("terms"), is_docs_site=F.col("is_docs"),
    )
    got = {r["i"]: r["s"] for r in df.select("i", expr.alias("s")).collect()}
    for (i, t, u, title, cls, rel, terms, is_docs) in rows:
        ctx = {"terms": set(terms), "is_docs_site": is_docs}
        assert got[i] == pytest.approx(
            ref["calculate_link_intrinsic_score"](t, u, title, cls, rel, ctx), abs=1e-9
        ), (t, u)
    # total score fallbacks
    tot = ref["calculate_total_score"]
    df2 = spark.createDataFrame([(7.5, 0.4)], "i double, c double")
    r = df2.select(
        links.total_score_expr(F.col("i"), F.col("c"), True, True).alias("both"),
        links.total_score_expr(F.col("i"), None, True, False).alias("only_i"),
        links.total_score_expr(F.col("i"), F.col("c"), False).alias("off"),
    ).first()
    assert r["both"] == pytest.approx(tot(7.5, 0.4, True, True))
    assert r["only_i"] == pytest.approx(tot(7.5, None, True, False))
    assert r["off"] == tot(7.5, 0.4, False, False)


# ---------------------------------------------------------------------------
# head BM25 (ContentRelevanceFilter) — pure methods
# ---------------------------------------------------------------------------


def test_head_bm25_matches_reference_class(spark):
    fl = load_defs(
        "deep_crawling/filters.py",
        ["FilterStats", "URLFilter", "ContentRelevanceFilter"],
    )
    f = fl["ContentRelevanceFilter"](query="spark data joins", threshold=0.0)
    cases = [
        ("spark joins guide", "deep dive into spark data", "spark,sql", {"description": "deep dive into spark data", "keywords": "spark,sql"}),
        ("nothing", "", "", {}),
    ]
    from crawl4ai_spark.functions.filters import head_bm25_score_expr

    rows = [
        (i, t, d, k, " ".join(meta.values())) for i, (t, d, k, meta) in enumerate(cases)
    ]
    df = spark.createDataFrame(rows, "i int, t string, d string, k string, m string")
    got = {
        r["i"]: r["s"]
        for r in df.select(
            "i",
            head_bm25_score_expr(F.col("t"), F.col("d"), F.col("k"), F.col("m"), ["spark", "data", "joins"]).alias("s"),
        ).collect()
    }
    for i, (t, d, k, meta) in enumerate(cases):
        doc = f._build_document({"title": t, "meta": meta})
        assert got[i] == pytest.approx(f._bm25(doc), rel=1e-12), (i, doc)


# ---------------------------------------------------------------------------
# hypothesis fuzz: canonicalizer parity on adversarial URLs
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings, strategies as st

    _ref_norm = load_defs(
        "utils.py",
        ["normalize_url", "normalize_url_for_deep_crawl", "get_base_domain"],
    )

    _url_chars = st.text(
        alphabet="abcXYZ019-._~:/?#[]@!$&'()*+,;=% \té中", max_size=40
    )
    _schemes = st.sampled_from(["http://", "https://", "ftp://", "", "//", "mailto:"])
    _hosts_st = st.sampled_from(
        ["example.com", "WWW.Example.Com", "sub.x.co.uk:81", "localhost", "a.b", ""]
    )

    @given(
        scheme=_schemes, host=_hosts_st, rest=_url_chars,
        base_host=st.sampled_from(["example.com", "shop.co.uk"]),
        base_path=st.sampled_from(["/", "/a/b", "/dir/page?x=1"]),
    )
    @settings(max_examples=300, deadline=None)
    def test_fuzz_canonicalizer_parity(scheme, host, rest, base_host, base_path):
        href = f"{scheme}{host}{rest}"
        base = f"https://{base_host}{base_path}"

        def both(fn_mine, fn_ref, *args):
            try:
                mine = fn_mine(*args)
                mine_exc = None
            except Exception as e:
                mine, mine_exc = None, type(e).__name__
            try:
                ref = fn_ref(*args)
                ref_exc = None
            except Exception as e:
                ref, ref_exc = None, type(e).__name__
            assert mine_exc == ref_exc, (args, mine_exc, ref_exc)
            if mine_exc is None:
                assert mine == ref, (args, mine, ref)

        both(normalize_url_for_deep_crawl, _ref_norm["normalize_url_for_deep_crawl"], href, base)
        both(normalize_url, _ref_norm["normalize_url"], href, base)
        both(get_base_domain, _ref_norm["get_base_domain"], href)
except ImportError:  # hypothesis absent: covered by the fixed corpora above
    pass


# ---------------------------------------------------------------------------
# RateLimiter backoff fold vs the reference class (deterministic jitter)
# ---------------------------------------------------------------------------


def test_host_state_fold_matches_ratelimiter(spark):
    import types

    from crawl4ai_spark.operators.scheduler import update_host_state

    stub_random = types.SimpleNamespace(uniform=lambda a, b: (a + b) / 2)
    ds = load_defs("models.py", ["DomainState"])
    rl_cls = load_defs(
        "async_dispatcher.py", ["RateLimiter"],
        extra={"random": stub_random, "time": __import__("time"),
               "asyncio": __import__("asyncio"), "DomainState": ds["DomainState"]},
    )["RateLimiter"]

    seqs = {
        "a.com": [200, 429, 429, 200, 503, 200],
        "b.com": [429, 429, 429, 429, 429, 200, 429],  # past max_retries: delay freezes
        "c.com": [200] * 4,
        "d.com": [503] * 8,
    }

    # reference fold (base=(1,1) so the stubbed uniform is exact)
    expected = {}
    for host, statuses in seqs.items():
        rl = rl_cls(base_delay=(1.0, 1.0), max_delay=60.0, max_retries=3)
        rl.domains[host] = ds["DomainState"]()
        st = rl.domains[host]
        for s in statuses:
            if st.current_delay == 0:  # wait_if_needed's init draw
                st.current_delay = 1.0
            rl.update_delay(f"https://{host}/x", s)
        expected[host] = (st.current_delay, st.fail_count)

    rows = [
        (host, s, float(i)) for host, statuses in seqs.items() for i, s in enumerate(statuses)
    ]
    wave = spark.createDataFrame(rows, "host string, status_code int, scheduled_offset double")
    got = {
        r["host"]: (r["current_delay"], r["fail_count"])
        for r in update_host_state(
            wave, None, wave_start=0.0, base_delay=(1.0, 1.0), max_delay=60.0, max_retries=3
        ).collect()
    }
    for host in seqs:
        assert got[host][0] == pytest.approx(expected[host][0], rel=1e-12), host
        assert got[host][1] == expected[host][1], host


# ---------------------------------------------------------------------------
# adaptive metrics vs the reference StatisticalStrategy
# ---------------------------------------------------------------------------


def test_adaptive_metrics_match_reference(spark):
    import types

    from crawl4ai_spark.operators import adaptive

    strat_cls = load_defs(
        "adaptive_crawler.py", ["StatisticalStrategy"],
        extra={"CrawlStrategy": object, "Link": object, "CrawlState": object,
               "AdaptiveConfig": object},
    )["StatisticalStrategy"]
    strat = strat_cls.__new__(strat_cls)  # skip __init__ deps
    strat.idf_cache = {}

    docs = [
        ("u0", "spark joins and windows explained with spark examples"),
        ("u1", "spark aggregation pipelines"),
        ("u2", "pandas frames are different"),
        ("u3", "totally unrelated cooking recipes"),
    ]
    query = "spark joins"

    # build the reference CrawlState by replaying its update rule
    tf, dfreq = {}, {}
    kb = []
    for u, text in docs:
        terms = strat._tokenize(text.lower())
        for t in terms:
            tf[t] = tf.get(t, 0) + 1
        for t in set(terms):
            dfreq[t] = dfreq.get(t, 0) + 1
        kb.append(types.SimpleNamespace(markdown=types.SimpleNamespace(raw_markdown=text)))
    state = types.SimpleNamespace(
        query=query, total_documents=len(docs), term_frequencies=tf,
        document_frequencies=dfreq, knowledge_base=kb,
        new_terms_history=[9, 4, 2], metrics={},
    )

    sdf = spark.createDataFrame(docs, "doc_id string, text string")
    assert adaptive.coverage(sdf, query, id_col="doc_id") == pytest.approx(
        strat._calculate_coverage(state), rel=1e-12
    )
    assert adaptive.consistency(sdf, id_col="doc_id") == pytest.approx(
        strat._calculate_consistency(state), rel=1e-12
    )
    assert adaptive.saturation([9, 4, 2]) == pytest.approx(
        strat._calculate_saturation(state), rel=1e-12
    )
