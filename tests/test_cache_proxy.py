"""CacheMode gating + proxy rotation — with xchecks executing the
reference's CacheContext and ProxyConfig classes."""

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
