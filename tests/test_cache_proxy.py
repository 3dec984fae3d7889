"""CacheMode gating + proxy rotation — with xchecks executing the
reference's CacheContext and ProxyConfig classes."""

import json
import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.cache import (
    CACHE_BYPASS,
    CACHE_DISABLED,
    CACHE_ENABLED,
    CACHE_READ_ONLY,
    CACHE_WRITE_ONLY,
    cache_lookup_mode,
    should_read_expr,
    should_write_expr,
)
from crawl4ai_spark.operators.proxy import assign_proxies, parse_proxy_string

from reference_loader import load_defs, load_method

URLS = [
    "https://a.com/x", "http://b.com/y", "file:///tmp/z.html",
    "raw:<html></html>", "ftp://c.com/q",
]


def test_cache_context_xcheck_reference(spark):
    """should_read/should_write gate identically to the reference's
    CacheContext over every mode × url-class combination."""
    from enum import Enum

    ctx_defs = load_defs("cache_context.py", ["CacheMode", "CacheContext"],
                         extra={"Enum": Enum})
    CacheMode, CacheContext = ctx_defs["CacheMode"], ctx_defs["CacheContext"]
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    for mode_name in ("ENABLED", "DISABLED", "READ_ONLY", "WRITE_ONLY", "BYPASS"):
        mode = mode_name.lower()
        got = {
            r["url"]: (r["r"], r["w"])
            for r in df.select(
                "url",
                should_read_expr(F.col("url"), mode).alias("r"),
                should_write_expr(F.col("url"), mode).alias("w"),
            ).collect()
        }
        for u in URLS:
            ctx = CacheContext(u, getattr(CacheMode, mode_name))
            assert got[u] == (ctx.should_read(), ctx.should_write()), (mode, u)


def test_cache_lookup_mode_gating(spark):
    frontier = spark.createDataFrame([(u,) for u in URLS], "url string")
    cache = spark.createDataFrame(
        [(u, f"<html>{u}</html>", "e", "f") for u in URLS],
        "url string, html string, etag string, head_fingerprint string",
    )
    enabled = {r["url"]: r["cache_status"]
               for r in cache_lookup_mode(frontier, cache, CACHE_ENABLED).collect()}
    assert enabled["https://a.com/x"] == "hit"
    assert enabled["raw:<html></html>"] == "miss"   # never cacheable
    assert enabled["ftp://c.com/q"] == "miss"
    for mode in (CACHE_DISABLED, CACHE_WRITE_ONLY, CACHE_BYPASS):
        rows = cache_lookup_mode(frontier, cache, mode).collect()
        assert all(r["cache_status"] == "miss" and r["cached_html"] is None for r in rows)
    ro = {r["url"]: r["cache_status"]
          for r in cache_lookup_mode(frontier, cache, CACHE_READ_ONLY).collect()}
    assert ro["https://a.com/x"] == "hit"


def test_proxy_parse_xcheck_reference():
    ProxyConfig = load_defs("proxy_strategy.py", ["ProxyConfig"])["ProxyConfig"]
    for s in ["1.2.3.4:8080:alice:secret", "5.6.7.8:3128"]:
        ref = ProxyConfig.from_string(s)
        got = parse_proxy_string(s)
        assert got == {"server": ref.server, "username": ref.username,
                       "password": ref.password, "ip": ref.ip}
    with pytest.raises(ValueError):
        parse_proxy_string("not-a-proxy")


def test_assign_proxies_sticky_and_round_robin(spark):
    servers = ["http://p0:80", "http://p1:80", "http://p2:80"]
    df = spark.createDataFrame(
        [(f"https://h{i % 4}.com/p{i}", f"h{i % 4}.com", i) for i in range(24)],
        "url string, host string, rank long",
    )
    sticky = assign_proxies(df, servers, mode="sticky", session_col="host").collect()
    by_host = {}
    for r in sticky:
        by_host.setdefault(r["host"], set()).add(r["proxy_server"])
    # sticky: one proxy per session, stable
    assert all(len(v) == 1 for v in by_host.values())
    rr = assign_proxies(df, servers, mode="round_robin", rank_col="rank").collect()
    for r in rr:
        assert r["proxy_server"] == servers[r["rank"] % 3]
    # empty pool → null column
    none = assign_proxies(df, [], mode="sticky").collect()
    assert all(r["proxy_server"] is None for r in none)
    with pytest.raises(ValueError):
        assign_proxies(df, servers, mode="round_robin")


# ------------------------------------------------------------- head parse
def test_parse_head_xcheck_reference_regex_fallback():
    """Execute the reference's own _parse_head with its own module-level
    regexes (loaded as consts — LXML isn't importable here, so the
    regex-FALLBACK path runs).  Our implementation transcribes the
    PRIMARY lxml path, so the comparison input is restricted to where
    the two reference paths agree by construction: bare <title>,
    single-token attribute values (the fallback regexes truncate
    multi-word content at the first space — a known lossiness of the
    fallback, not of the primary path)."""
    import re

    from crawl4ai_spark.functions.heads import parse_head

    refs = load_defs(
        "async_url_seeder.py",
        ["_parse_head"],
        consts=["_title_rx", "_meta_rx", "_charset_rx", "_link_rx"],
        extra={"LXML": False, "json": __import__("json"), "Any": object, "re": re},
    )
    ref_parse = refs["_parse_head"]
    src = (
        '<html lang="en-GB"><head><title> MyPage </title>'
        '<meta charset="UTF-8"><meta name="description" content="descword">'
        '<meta property="og:type" content="article">'
        '<link rel="canonical" href="https://a.com/c">'
        '<script type="application/ld+json">{"@type": "Article"}</script>'
        "</head></html>"
    )
    ours = parse_head(src)
    theirs = ref_parse(src)
    assert ours["title"] == theirs["title"] == "MyPage"
    assert ours["charset"] == theirs["charset"] == "utf-8"
    assert ours["lang"] == theirs["lang"] == "en-GB"
    assert ours["meta"]["description"] == theirs["meta"]["description"] == "descword"
    assert ours["meta"]["og:type"] == theirs["meta"]["og:type"] == "article"
    assert ours["link"]["canonical"][0]["href"] == theirs["link"]["canonical"][0]["href"]
    assert ours["jsonld"] == theirs["jsonld"] == [{"@type": "Article"}]
    # primary-path fidelity the fallback cannot express (multi-word
    # content kept whole) — pinned separately
    full = parse_head('<head><meta name="description" content="Desc here"></head>')
    assert full["meta"]["description"] == "Desc here"


def test_parse_head_valueless_attrs_no_crash():
    from crawl4ai_spark.functions.heads import parse_head

    h = parse_head('<html lang><head><meta charset><meta name="x" content>'
                   '<link rel href="/a"><title>T</title></head></html>')
    assert h["charset"] == "" and h["lang"] == "" and h["meta"]["x"] == ""
    assert h["title"] == "T"


def test_parse_head_lxml_semantics():
    from crawl4ai_spark.functions.heads import parse_head

    h = parse_head(
        '<head><meta http-equiv="refresh" content="30">'
        '<link rel="preload stylesheet" href="/s.css" as="style" type="text/css">'
        '<link href="/nofel.css"><title>A</title><title>B</title></head>'
    )
    assert h["title"] == "A"  # first title wins
    assert h["meta"]["refresh"] == "30"  # http-equiv keys the meta map
    # space-separated rel fans out; rel-less links dropped
    assert h["link"]["preload"] == h["link"]["stylesheet"] == [
        {"href": "/s.css", "as": "style", "type": "text/css"}
    ]
    assert "nofel" not in json.dumps(h["link"])
    assert parse_head("")["title"] is None


def test_parse_heads_operator(spark):
    from crawl4ai_spark.functions.heads import parse_heads

    pages = spark.createDataFrame(
        [("u1", '<head><title>T1</title><meta name="robots" content="noindex">'
                '<link rel="canonical" href="https://a.com/x"></head>')],
        "url string, head_html string",
    )
    r = parse_heads(pages).collect()[0]
    assert r["title"] == "T1" and r["robots_meta"] == "noindex"
    assert r["canonical"] == "https://a.com/x" and r["n_jsonld"] == 0


def test_sentence_chunks(spark):
    from crawl4ai_spark.functions.chunking import sentence_chunks_expr

    df = spark.createDataFrame(
        [("One sentence. Two now!  Three?\nFour line. Two now!",)], "text string"
    )
    got = df.select(sentence_chunks_expr(F.col("text")).alias("s")).first()["s"]
    # deduped (reference's list(set(...)) quirk) + deterministic order
    assert got == sorted({"One sentence.", "Two now!", "Three?", "Four line."})


def test_cache_mode_validation_and_short_circuit(spark):
    frontier = spark.createDataFrame([("https://a.com/x",)], "url string")
    cache = spark.createDataFrame(
        [("https://a.com/x", "<h>", "e", "f")],
        "url string, html string, etag string, head_fingerprint string",
    )
    with pytest.raises(ValueError):
        should_read_expr(F.col("url"), "ENABLED")
    with pytest.raises(ValueError):
        cache_lookup_mode(frontier, cache, "readonly")
    # unreadable modes skip the cache join entirely
    plan = cache_lookup_mode(frontier, cache, CACHE_BYPASS)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
