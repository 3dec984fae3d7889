"""Traversal parity: the Spark engines must reproduce the reference
algorithms' crawl order and URL-seen set exactly on the deterministic
corpus — the oracle is a pure-Python transcription of the reference
loops (reference_oracle.py)."""

import math

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.functions import scorers
from crawl4ai_spark.operators.traversal import CrawlConfig, CrawlEngine, corpus_fetcher
from crawl4ai_spark.sources.corpus import generate_corpus, page_url

from reference_oracle import best_first_oracle, bfs_oracle, dfs_oracle


@pytest.fixture(scope="module")
def world(spark):
    corpus = generate_corpus(seed=42, n_hosts=3, pages_per_host=14, with_images=False)
    pages_pdf = corpus["pages"]
    pages_df = spark.createDataFrame(pages_pdf)
    html_by_url = dict(zip(pages_pdf["url"], pages_pdf["html"]))

    def fetch(url):
        html = html_by_url.get(url)
        if html is None:
            return False, 404, ""
        return True, 200, html

    return {"pages_df": pages_df, "fetch": fetch}


def spark_results_tuples(run):
    rows = run.results.orderBy("wave_id", "result_seq").collect()
    return [(r["url"], r["depth"], r["parent_url"], r["success"]) for r in rows]


def seen_set(run):
    return {r["url"] for r in run.seen.collect()}


def assert_parity(run, oracle_results, oracle_visited):
    assert spark_results_tuples(run) == oracle_results
    assert seen_set(run) == oracle_visited


START = page_url(0, 0)


def test_bfs_parity_plain(spark, world):
    cfg = CrawlConfig(max_depth=2)
    run = CrawlEngine(spark, corpus_fetcher(world["pages_df"]), cfg).crawl_bfs(START)
    res, vis = bfs_oracle(START, world["fetch"], max_depth=2)
    assert_parity(run, res, vis)


def test_bfs_parity_max_pages_trim(spark, world):
    score = scorers.path_depth(optimal_depth=2)

    def py_score(url):
        # pure-python twin of the path_depth expression
        from urllib.parse import urlparse

        path = urlparse(url).path
        depth = len([s for s in path.split("/") if s])
        dist = abs(depth - 2)
        return [1.0, 0.5, 0.3333333333333333, 0.25][dist] if dist < 4 else 1.0 / (1 + dist)

    cfg = CrawlConfig(max_depth=3, max_pages=9, score_expr=score)
    run = CrawlEngine(spark, corpus_fetcher(world["pages_df"]), cfg).crawl_bfs(START)
    res, vis = bfs_oracle(START, world["fetch"], max_depth=3, max_pages=9, score_fn=py_score)
    # NOTE: batch BFS may overshoot max_pages within a level (the reference
    # crawls the whole current level before re-checking) — parity, not a cap,
    # is the contract here.
    assert_parity(run, res, vis)


def test_bfs_parity_filter_and_threshold(spark, world):
    flt = lambda url: ~url.contains("/admin/")  # noqa: E731
    score = scorers.keyword_relevance(["docs", "blog"])

    def py_filter(url):
        return "/admin/" not in url

    def py_score(url):
        u = url.lower()
        return sum(1 for k in ("docs", "blog") if k in u) / 2

    cfg = CrawlConfig(max_depth=3, score_expr=score, filter_expr=flt, score_threshold=0.5)
    run = CrawlEngine(spark, corpus_fetcher(world["pages_df"]), cfg).crawl_bfs(START)
    res, vis = bfs_oracle(
        START, world["fetch"], max_depth=3, score_fn=py_score, filter_fn=py_filter, score_threshold=0.5
    )
    assert_parity(run, res, vis)


def test_bfs_include_external(spark, world):
    cfg = CrawlConfig(max_depth=1, include_external=True)
    run = CrawlEngine(spark, corpus_fetcher(world["pages_df"]), cfg).crawl_bfs(START)
    res, vis = bfs_oracle(START, world["fetch"], max_depth=1, include_external=True)
    assert_parity(run, res, vis)


def test_dfs_parity(spark, world):
    cfg = CrawlConfig(max_depth=2)
    run = CrawlEngine(spark, corpus_fetcher(world["pages_df"]), cfg).crawl_dfs(START)
    res, vis = dfs_oracle(START, world["fetch"], max_depth=2)
    rows = run.results.orderBy("result_seq").collect()
    got = [(r["url"], r["depth"], r["parent_url"], r["success"]) for r in rows]
    assert got == res
    assert seen_set(run) == vis


def test_dfs_parity_max_pages(spark, world):
    cfg = CrawlConfig(max_depth=3, max_pages=7)
    run = CrawlEngine(spark, corpus_fetcher(world["pages_df"]), cfg).crawl_dfs(START)
    res, vis = dfs_oracle(START, world["fetch"], max_depth=3, max_pages=7)
    rows = run.results.orderBy("result_seq").collect()
    got = [(r["url"], r["depth"], r["parent_url"], r["success"]) for r in rows]
    assert got == res
    assert seen_set(run) == vis


def test_best_first_parity(spark, world):
    score = scorers.keyword_relevance(["docs", "blog"])

    def py_score(url):
        u = url.lower()
        return sum(1 for k in ("docs", "blog") if k in u) / 2

    cfg = CrawlConfig(max_depth=2, score_expr=score, batch_size=10)
    run = CrawlEngine(spark, corpus_fetcher(world["pages_df"]), cfg).crawl_best_first(START)
    res, vis = best_first_oracle(START, world["fetch"], max_depth=2, score_fn=py_score)
    rows = run.results.orderBy("wave_id", "result_seq").collect()
    got = [(r["url"], r["depth"], r["parent_url"], r["success"]) for r in rows]
    assert got == res
    assert seen_set(run) == vis


def test_best_first_parity_max_pages(spark, world):
    cfg = CrawlConfig(max_depth=3, max_pages=12, batch_size=10)
    run = CrawlEngine(spark, corpus_fetcher(world["pages_df"]), cfg).crawl_best_first(START)
    res, vis = best_first_oracle(START, world["fetch"], max_depth=3, max_pages=12)
    rows = run.results.orderBy("wave_id", "result_seq").collect()
    got = [(r["url"], r["depth"], r["parent_url"], r["success"]) for r in rows]
    assert got == res
    assert seen_set(run) == vis


def test_bfs_stream_visited_timing(spark, world):
    """Stream mode adds wave urls to visited at CRAWL time
    (bfs_strategy.py:257): the start URL can never be re-discovered,
    unlike batch mode where it can (visited starts empty)."""
    from reference_oracle import bfs_rows

    cfg = CrawlConfig(max_depth=2)
    eng = CrawlEngine(spark, corpus_fetcher(world["pages_df"]), cfg)
    batch = eng.crawl_bfs(START)
    stream = eng.crawl_bfs(START, stream_visited=True)
    res_s, vis_s = bfs_rows(START, world["fetch"], max_depth=2, stream_visited=True)
    rows = stream.results.orderBy("wave_id", "result_seq").collect()
    got = [(r["url"], r["depth"], r["parent_url"], r["wave_id"], r["result_seq"], r["success"]) for r in rows]
    assert got == res_s
    assert seen_set(stream) == vis_s
    # the observable timing difference: stream visited contains the raw
    # start URL; batch visited does not (it was only *crawled*, and its
    # canonical form may be re-discovered)
    assert START in seen_set(stream)
    res_b, vis_b = bfs_rows(START, world["fetch"], max_depth=2)
    assert START not in vis_b  # canonicalized rediscovery identity differs
