"""Round-3 fix pins: bloom geometry stamping, de-forced host-state
broadcast, CSS attr-operator loud failure, markdown per-stage error
isolation, BS4-exact page-query extraction."""

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.dedup import (
    BLOOM_FORMAT_VERSION,
    bloom_version_ok,
    build_bloom,
    merge_blooms,
)


# ---------------------------------------------------------------------------
# bloom geometry stamp (ADVICE r2: differing bloom_partitions/bloom_bits on
# resume must be rejected like a hash-scheme change)
# ---------------------------------------------------------------------------


def _urls(spark, n=300):
    return spark.range(n).select(
        F.concat(F.lit("https://h.com/p"), F.col("id").cast("string")).alias("url")
    )


def test_bloom_geometry_stamped_and_checked(spark):
    blooms = build_bloom(_urls(spark), n_partitions=4, m_bits=1 << 14)
    rows = blooms.collect()
    assert all(r["n_partitions"] == 4 and r["m_bits"] == (1 << 14) for r in rows)
    # version check without geometry args: back-compat behavior
    assert bloom_version_ok(blooms)
    # matching geometry passes, any mismatch fails
    assert bloom_version_ok(blooms, n_partitions=4, m_bits=1 << 14)
    assert not bloom_version_ok(blooms, n_partitions=8, m_bits=1 << 14)
    assert not bloom_version_ok(blooms, n_partitions=4, m_bits=1 << 15)
    # pre-geometry-stamp shards (columns absent) are unverifiable → reject
    legacy = blooms.drop("n_partitions", "m_bits")
    assert not bloom_version_ok(legacy, n_partitions=4, m_bits=1 << 14)
    # mixed-geometry shard sets (old 4-part + new 8-part deltas) → reject
    mixed = blooms.unionByName(build_bloom(_urls(spark), n_partitions=8, m_bits=1 << 14))
    assert not bloom_version_ok(mixed, n_partitions=8, m_bits=1 << 14)


def test_merge_blooms_carries_geometry(spark):
    a = build_bloom(_urls(spark, 200), n_partitions=4, m_bits=1 << 14)
    b = build_bloom(_urls(spark, 100), n_partitions=4, m_bits=1 << 14)
    merged = merge_blooms(a.unionByName(b))
    rows = merged.collect()
    assert all(r["n_partitions"] == 4 and r["m_bits"] == (1 << 14) for r in rows)
    assert bloom_version_ok(merged, n_partitions=4, m_bits=1 << 14)


def test_job_resume_rebuilds_on_geometry_change(spark, tmp_path):
    """Resuming a catalog whose bloom was built with a different
    bloom_partitions must rebuild (not route candidates to wrong shards):
    the crawl result equals a geometry-consistent run."""
    from crawl4ai_spark.operators.traversal import canonical_corpus_fetcher
    from crawl4ai_spark.pipeline import CrawlJob, JobConfig
    from crawl4ai_spark.sources.corpus import generate_corpus, page_url

    corpus = generate_corpus(seed=7, n_hosts=2, pages_per_host=6, with_images=False)
    pages = spark.createDataFrame(corpus["pages"])

    def run_job(root, seed_cfg, run_cfg):
        job = CrawlJob(spark, canonical_corpus_fetcher(pages), catalog_root=str(root), config=seed_cfg)
        job.seed(spark.createDataFrame([(page_url(0, 0),), (page_url(1, 0),)], "url string"))
        job.cfg = run_cfg  # resume under a CHANGED JobConfig
        job.run(max_waves=6)
        return job

    cfg4 = JobConfig(max_depth=2, wave_budget=100.0, use_bloom=True,
                     bloom_partitions=4, bloom_bits=1 << 14, emit_images=False)
    cfg8 = JobConfig(max_depth=2, wave_budget=100.0, use_bloom=True,
                     bloom_partitions=8, bloom_bits=1 << 15, emit_images=False)
    a = run_job(tmp_path / "consistent", cfg8, cfg8)
    b = run_job(tmp_path / "regeom", cfg4, cfg8)
    assert {r["url"] for r in a.seen_urls().collect()} == {
        r["url"] for r in b.seen_urls().collect()
    }
    res_a = {(r["url"], r["wave_id"]) for r in a.results().collect()}
    res_b = {(r["url"], r["wave_id"]) for r in b.results().collect()}
    assert res_a == res_b
    # the reset baseline now carries the NEW geometry
    assert bloom_version_ok(b.catalog.read("bloom"), n_partitions=8, m_bits=1 << 15)


# ---------------------------------------------------------------------------
# de-forced host-state broadcast (VERDICT r2 "What's wrong #1")
# ---------------------------------------------------------------------------


def _frontier(spark, n=200):
    return spark.range(n).select(
        F.concat(F.lit("https://h"), (F.col("id") % 10).cast("string"),
                 F.lit(".com/p"), F.col("id").cast("string")).alias("url"),
        F.concat(F.lit("h"), (F.col("id") % 10).cast("string"), F.lit(".com")).alias("host"),
        F.lit(0).alias("depth"),
        F.lit(0.5).alias("score"),
        F.lit(0).alias("priority_bucket"),
        F.lit(0).alias("retry_count"),
        F.lit(0).alias("wait_waves"),
    )


def _host_state(spark):
    return spark.createDataFrame(
        [(f"h{i}.com", 0.0, 1.0, 0) for i in range(10)],
        "host string, last_request_time double, current_delay double, fail_count int",
    )


def test_schedule_wave_broadcast_is_size_gated(spark):
    """With an unknown/huge host_state row count the join must carry NO
    broadcast hint (AQE elects from runtime size); a known-small count
    keeps the explicit broadcast.  autoBroadcastJoinThreshold=-1 makes the
    hint the only possible source of a BroadcastExchange, so the plan
    assertion is exact."""
    from crawl4ai_spark.operators.scheduler import (
        BROADCAST_HOST_STATE_MAX_ROWS,
        _join_host_state,
        schedule_wave,
    )

    fr, hs = _frontier(spark), _host_state(spark)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # the joined plan is asserted pre-checkpoint (schedule_wave's
        # keep_tail localCheckpoint pins the join out of the final plan) —
        # _join_host_state is the single shared join both schedule_wave
        # and update_host_state call
        for rows, want_bcast in [
            (None, False),
            (BROADCAST_HOST_STATE_MAX_ROWS + 1, False),
            (10, True),
        ]:
            joined = _join_host_state(fr, hs, rows)
            plan = joined._jdf.queryExecution().sparkPlan().toString()
            assert ("BroadcastHashJoin" in plan) == want_bcast, (rows, plan[:2000])
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # and the schedule itself is invariant to the join strategy
    a = schedule_wave(fr, hs, wave_start=0.0, wave_budget=60.0, host_state_rows=10)
    b = schedule_wave(fr, hs, wave_start=0.0, wave_budget=60.0, host_state_rows=None)
    key = lambda r: (r["url"],)
    assert sorted(a.collect(), key=key) == sorted(b.collect(), key=key)


# ---------------------------------------------------------------------------
# CSS attr-operator loud failure (ADVICE r2)
# ---------------------------------------------------------------------------


def test_css_attr_operators_raise():
    from crawl4ai_spark.functions.dom import css_select, parse_dom

    root = parse_dom('<div><a href="https://x.com/a">a</a></div>')
    for sel in ['a[href^="https"]', 'a[href*="x"]', 'a[href$=".com"]',
                'a[rel~="nofollow"]', 'a[lang|="en"]']:
        with pytest.raises(ValueError):
            css_select(root, sel)
    # plain [attr=v] and [attr] still work
    assert len(css_select(root, 'a[href="https://x.com/a"]')) == 1
    assert len(css_select(root, "a[href]")) == 1


# ---------------------------------------------------------------------------
# markdown per-stage error isolation (ADVICE r2; ref
# markdown_generation_strategy.py:208-253)
# ---------------------------------------------------------------------------


def test_markdown_filter_error_keeps_raw():
    from crawl4ai_spark.functions.markdown import generate_markdown

    def bad_filter(html):
        raise RuntimeError("boom")

    r = generate_markdown(
        '<html><body><p>Hello <a href="/x">link</a></p></body></html>',
        base_url="https://h.com/",
        content_filter=bad_filter,
    )
    assert "Hello" in r["raw_markdown"]
    assert "Hello" in r["markdown_with_citations"]
    assert r["fit_markdown"].startswith("Error generating fit markdown:")
    assert r["fit_html"] == ""


def test_markdown_for_pages_filter_error_keeps_raw(spark):
    from crawl4ai_spark.functions.markdown import markdown_for_pages

    def bad_filter(html):
        raise RuntimeError("boom")

    pages = spark.createDataFrame(
        [("https://h.com/", "<html><body><p>Hello world</p></body></html>")],
        "url string, html string",
    )
    row = markdown_for_pages(pages, content_filter=bad_filter).first()
    assert "Hello" in row["raw_markdown"]
    assert row["fit_markdown"].startswith("Error generating fit markdown:")


# ---------------------------------------------------------------------------
# BS4-exact page-query fallback (ADVICE r2; ref content_filter_strategy.py
# :125-159)
# ---------------------------------------------------------------------------


def test_extract_page_query_bs4_semantics():
    from crawl4ai_spark.functions.dom import parse_dom
    from crawl4ai_spark.operators.content_filter import extract_page_query

    # meta name match is case-SENSITIVE (BS4 attrs={"name": ...})
    html = (
        "<html><head><title>T</title>"
        '<meta name="Keywords" content="wrong case">'
        '<meta name="description" content="right desc">'
        "</head><body><p>short</p></body></html>"
    )
    root = parse_dom(html)
    body = root.find("body")
    q = extract_page_query(root, body, None)
    assert "wrong case" not in q
    assert "right desc" in q and "T" in q
    # a <title> with element children: .string is None → skipped (the
    # reference's soup.title.string try/except path)
    html2 = (
        "<html><head><title>Real <b>bold</b></title></head>"
        "<body><h1>Header</h1><p>" + "x" * 200 + "</p></body></html>"
    )
    root2 = parse_dom(html2)
    q2 = extract_page_query(root2, root2.find("body"), None)
    assert "Real" not in q2
    assert "Header" in q2


# ---------------------------------------------------------------------------
# TopicSegmentationChunking analog (chunking_strategy.py:93-141)
# ---------------------------------------------------------------------------


def test_topic_segments_two_topics():
    from crawl4ai_spark.functions.chunking import chunk_with_topics, topic_segments

    text = "\n\n".join(
        ["spark shuffle partitions exchange tuning " * 6] * 3
        + ["bread yeast fermentation dough starter " * 6] * 3
    )
    segs = topic_segments(text, w=10, k=4)
    assert len(segs) == 2
    assert "spark" in segs[0] and "bread" not in segs[0]
    assert "bread" in segs[1] and "spark" not in segs[1]
    pairs = chunk_with_topics(text, num_keywords=3, w=10, k=4)
    assert pairs[0][1][0] == "spark" and pairs[1][1][0] == "bread"


def test_topic_segments_edges():
    from crawl4ai_spark.functions.chunking import topic_keywords, topic_segments

    assert topic_segments("") == []
    assert topic_segments("   ") == []
    assert topic_segments("single short paragraph") == ["single short paragraph"]
    # single topic: no boundary found, text returned whole
    one = "\n\n".join(["alpha beta gamma delta " * 8] * 4)
    assert len(topic_segments(one, w=10, k=4)) == 1
    # keywords: stopwords dropped, frequency order, tie = first occurrence
    assert topic_keywords("the the the spark spark bread", 2) == ["spark", "bread"]


def test_topic_chunk_docs_spark(spark):
    from crawl4ai_spark.functions.chunking import chunk_with_topics, topic_chunk_docs

    text = "\n\n".join(
        ["spark shuffle partitions exchange tuning " * 6] * 2
        + ["bread yeast fermentation dough starter " * 6] * 2
    )
    docs = spark.createDataFrame([(1, text), (2, "")], "doc_id long, text string")
    rows = topic_chunk_docs(docs, w=10, k=4).orderBy("doc_id", "seg_idx").collect()
    exp = chunk_with_topics(text, 3, 10, 4)
    assert len(rows) == len(exp)  # empty doc contributes no rows
    assert [r["segment"] for r in rows] == [s for s, _ in exp]
    assert [r["keywords"] for r in rows] == [" ".join(k) for _, k in exp]
