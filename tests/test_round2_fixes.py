"""Round-2 fix pins: BFS finite-capacity distributed cumsum, best-first
seen semi-join, simhash empty-doc band guard, bloom format versioning,
table-extraction caption/colspan parity, url-quality fragment anchoring,
bm25 null-text handling."""

import re

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators import docdedup
from crawl4ai_spark.operators.dedup import (
    BLOOM_FORMAT_VERSION,
    anti_join_seen,
    bloom_version_ok,
    build_bloom,
)


def test_bfs_finite_capacity_no_single_partition_window(spark):
    """The finite-max_pages BFS discovery must not funnel the wave's
    successes through one partition (the old Window.orderBy cumsum):
    the executed plan of next_wave carries no Exchange SinglePartition."""
    from crawl4ai_spark.operators.traversal import (
        CrawlConfig,
        CrawlEngine,
        mock_child_fetcher,
    )

    cfg = CrawlConfig(max_depth=3, max_pages=50)
    engine = CrawlEngine(spark, mock_child_fetcher(n_children=3), cfg)
    wave = spark.createDataFrame(
        [(f"https://h{i}.com/", None, 0, i) for i in range(20)],
        "url string, parent_url string, depth int, result_seq long",
    )
    fetched = engine.fetch_fn(wave)
    results = fetched.withColumn("wave_id", F.lit(0)).select(
        "url", "depth", "parent_url", "wave_id", "result_seq", "success", "status_code", "html"
    )
    seen = spark.createDataFrame([], "url string")
    next_wave, seen_delta = engine._bfs_discover(results, seen, 0)
    n = next_wave.count()
    assert n > 0
    ep = next_wave._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in ep, ep[:3000]


def test_best_first_no_full_seen_collect(spark, monkeypatch):
    """Best-first pops must not collect the whole seen set each wave —
    only the ≤batch_size popped rows cross the driver boundary."""
    from crawl4ai_spark.operators.traversal import (
        CrawlConfig,
        CrawlEngine,
        mock_child_fetcher,
    )

    # patch the RUNTIME DataFrame class (Spark 4: pyspark.sql.classic
    # subclass overrides collect, so patching the base does nothing)
    df_cls = type(spark.createDataFrame([(1,)], "x int"))
    collected_sizes = []
    orig_collect = df_cls.collect

    def spy_collect(self):
        rows = orig_collect(self)
        if self.columns == ["url"]:
            collected_sizes.append(len(rows))
        return rows

    monkeypatch.setattr(df_cls, "collect", spy_collect)
    cfg = CrawlConfig(max_depth=2, batch_size=5)
    run = CrawlEngine(spark, mock_child_fetcher(n_children=3), cfg).crawl_best_first(
        "https://h0.com/"
    )
    assert run.pages_crawled > 10
    # every seen-side collect is the semi-join hit set: bounded by the
    # batch size, never the full history
    assert collected_sizes, "expected seen semi-join collects"
    assert max(collected_sizes) <= cfg.batch_size


def test_simhash_empty_docs_not_banded(spark):
    """1k empty docs + a few real ones: empty docs must not enter the
    band join (their shared simhash 0 would create ~n²/2 candidate
    pairs) and must produce zero near-dup pairs."""
    rows = [(i, "") for i in range(1000)]
    rows += [(10_000 + i, f"real document number {i} with stable words") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = docdedup.simhash_pairs(docs, max_hamming=6)
    got = pairs.collect()
    assert all(r["id_a"] >= 10_000 and r["id_b"] >= 10_000 for r in got)
    # the banded candidate set itself stays tiny: only non-empty docs band
    sh = docdedup.simhash_table(docs, include_empty=False)
    assert sh.count() == 4
    # empty docs still get a simhash row on the default path (metadata
    # completeness), just never a band
    assert docdedup.simhash_table(docs).count() == 1004


def test_bloom_version_stamp_and_rebuild_path(spark):
    urls = spark.range(500).select(
        F.concat(F.lit("https://h.com/p"), F.col("id").cast("string")).alias("url")
    )
    blooms = build_bloom(urls, n_partitions=4, m_bits=1 << 14)
    rows = blooms.collect()
    assert all(r["fmt_version"] == BLOOM_FORMAT_VERSION for r in rows)
    assert bloom_version_ok(blooms)
    stale = blooms.withColumn("fmt_version", F.lit(BLOOM_FORMAT_VERSION - 1))
    assert not bloom_version_ok(stale)
    assert not bloom_version_ok(blooms.drop("fmt_version"))
    assert bloom_version_ok(None)
    # anti-join stays exact with the stamped schema
    cands = spark.range(400, 600).select(
        F.concat(F.lit("https://h.com/p"), F.col("id").cast("string")).alias("url")
    )
    fresh = anti_join_seen(cands, urls, blooms=blooms, n_partitions=4)
    assert {r["url"] for r in fresh.collect()} == {
        f"https://h.com/p{i}" for i in range(500, 600)
    }


def test_job_resume_rebuilds_stale_bloom(spark, tmp_path):
    """A catalog whose persisted bloom predates the current hash scheme
    must be rebuilt from seen on resume — and the crawl result must equal
    a run with a valid bloom."""
    import pandas as pd

    from crawl4ai_spark.operators.traversal import canonical_corpus_fetcher
    from crawl4ai_spark.pipeline import CrawlJob, JobConfig
    from crawl4ai_spark.sources.corpus import generate_corpus, page_url

    corpus = generate_corpus(seed=7, n_hosts=2, pages_per_host=6, with_images=False)
    pages = spark.createDataFrame(corpus["pages"])
    cfg = JobConfig(max_depth=2, wave_budget=100.0, use_bloom=True,
                    bloom_partitions=4, bloom_bits=1 << 14, emit_images=False)

    def run_job(root, corrupt_after_seed):
        job = CrawlJob(spark, canonical_corpus_fetcher(pages), catalog_root=str(root), config=cfg)
        job.seed(spark.createDataFrame([(page_url(0, 0),), (page_url(1, 0),)], "url string"))
        if corrupt_after_seed:
            # simulate a bloom persisted by the previous hash scheme
            snap = job.catalog.latest_snapshot()
            path = snap["appends"]["bloom"][0]
            b = spark.read.parquet(path).withColumn(
                "fmt_version", F.lit(BLOOM_FORMAT_VERSION - 1)
            ).toPandas()
            spark.createDataFrame(b).write.mode("overwrite").parquet(path)
        job.run(max_waves=6)
        return job

    a = run_job(tmp_path / "ok", corrupt_after_seed=False)
    b = run_job(tmp_path / "stale", corrupt_after_seed=True)
    assert {r["url"] for r in a.seen_urls().collect()} == {
        r["url"] for r in b.seen_urls().collect()
    }
    res_a = {(r["url"], r["wave_id"]) for r in a.results().collect()}
    res_b = {(r["url"], r["wave_id"]) for r in b.results().collect()}
    assert res_a == res_b
    # and the reset baseline carries the current version afterwards
    assert bloom_version_ok(b.catalog.read("bloom"))


def test_table_caption_first_text_node(spark):
    from crawl4ai_spark.operators.scrape import extract_tables

    html = (
        '<table summary="s"><caption>First part <b>bold</b> tail</caption>'
        "<thead><tr><th>a</th><th>b</th></tr></thead>"
        "<tbody><tr><td>1</td><td>2</td></tr><tr><td>3</td><td>4</td></tr></tbody></table>"
    )
    pages = spark.createDataFrame([("u", html)], "url string, html string")
    rows = extract_tables(pages).collect()
    assert len(rows) == 1
    # reference: .//caption/text()[0] → only the first text node, stripped
    assert rows[0]["caption"] == "First part"


def test_table_invalid_colspan_drops_table(spark):
    from crawl4ai_spark.operators.scrape import extract_tables

    good = (
        '<table summary="s"><caption>c</caption>'
        "<thead><tr><th>a</th><th>b</th></tr></thead>"
        "<tbody><tr><td>1</td><td>2</td></tr><tr><td>3</td><td>4</td></tr></tbody></table>"
    )
    bad = good.replace("<td>1</td>", '<td colspan="two">1</td>')
    pages = spark.createDataFrame(
        [("u_good", good), ("u_bad", bad)], "url string, html string"
    )
    rows = extract_tables(pages).collect()
    assert {r["src_url"] for r in rows} == {"u_good"}


def test_url_quality_fragment_only_question_mark(spark):
    """A '?' inside the fragment is not a query: no x0.6 penalty."""
    from crawl4ai_spark.functions.filters import url_quality_score_expr

    df = spark.createDataFrame(
        [
            ("https://a.com/page#frag?notaquery",),
            ("https://a.com/page?q=1",),
            ("https://a.com/page?q=1#frag",),
            ("https://a.com/page",),
        ],
        "url string",
    )
    got = {r["url"]: r["s"] for r in df.select("url", url_quality_score_expr(F.col("url")).alias("s")).collect()}
    assert got["https://a.com/page#frag?notaquery"] == pytest.approx(1.0)
    assert got["https://a.com/page?q=1"] == pytest.approx(0.6)
    assert got["https://a.com/page?q=1#frag"] == pytest.approx(0.6)
    assert got["https://a.com/page"] == pytest.approx(1.0)


def test_bm25_null_text_is_empty_doc(spark):
    from crawl4ai_spark.operators.bm25 import bm25_scores

    docs = spark.createDataFrame(
        [(1, "spark join fast spark"), (2, None), (3, "other words entirely")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, ["spark"]).collect()}
    assert set(got) == {1, 2, 3}
    assert got[2] == 0.0 and got[3] == 0.0
    assert got[1] > 0.0


def test_backoff_freeze_uses_config_max_retries(spark):
    """update_host_state freeze threshold must follow max_retries (was
    hardcoded 3): with max_retries=1, the second failure freezes delay."""
    from crawl4ai_spark.operators.scheduler import update_host_state

    res = spark.createDataFrame(
        [("h.com", 429, 0.0), ("h.com", 429, 1.0), ("h.com", 429, 2.0)],
        "host string, status_code int, scheduled_offset double",
    )
    row = update_host_state(res, None, wave_start=0.0, base_delay=(1.0, 1.0),
                            max_retries=1).collect()[0]
    # fail1: delay 1->2 (fails=1 <= 1); fail2: fails=2 > 1 -> frozen; fail3 frozen
    assert row["current_delay"] == pytest.approx(2.0)
    assert row["fail_count"] == 3
    row3 = update_host_state(res, None, wave_start=0.0, base_delay=(1.0, 1.0),
                             max_retries=3).collect()[0]
    assert row3["current_delay"] == pytest.approx(8.0)  # doubled thrice


def test_crawljob_retry_state_survives_resume(spark, tmp_path):
    """Requeued 429 rows and host backoff state persist through a
    snapshot resume: split run == straight run, including retry rows."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.functions.urls import normalize_url_for_deep_crawl
    from crawl4ai_spark.pipeline import CrawlJob, JobConfig
    from crawl4ai_spark.sources.corpus import generate_corpus, page_url

    corpus = generate_corpus(seed=3, n_hosts=2, pages_per_host=6, with_images=False)
    pages = spark.createDataFrame(corpus["pages"])
    from crawl4ai_spark.functions.urls import normalize_deep_udf as _nd

    src = pages.select(
        _nd(F.col("url"), F.col("url")).alias("_p"), "html",
        F.col("status_code").alias("_sc"),
    ).dropDuplicates(["_p"]).cache()

    def fetch(wave):
        j = wave.join(src, wave["url"] == src["_p"], "left")
        ix = F.regexp_extract(F.col("url"), r"/p(\d+)$", 1)
        i = F.when(ix == "", F.lit(0)).otherwise(ix.cast("int"))
        status = F.when(F.col("_p").isNull(), 404).when(
            (i % 2 == 1) & (F.col("retry_count") < 1), 429
        ).otherwise(F.col("_sc"))
        return j.withColumn("status_code", status).withColumn(
            "success", F.col("_p").isNotNull() & (F.col("status_code") == 200)
        ).drop("_p", "_sc")

    cfg = JobConfig(max_depth=2, wave_budget=3.0, default_delay=1.0,
                    use_bloom=False, emit_images=False)

    def run(root, splits):
        job = None
        for i, w in enumerate(splits):
            job = CrawlJob(spark, fetch, catalog_root=str(root), config=cfg)
            if i == 0:
                job.seed(spark.createDataFrame(
                    [(page_url(0, 0),), (page_url(1, 0),)], "url string"))
            job.run(max_waves=w)
        return job

    a = run(tmp_path / "straight", [10])
    b = run(tmp_path / "split", [2, 8])
    rows_a = {(r["url"], r["wave_id"], r["status_code"]) for r in a.results().collect()}
    rows_b = {(r["url"], r["wave_id"], r["status_code"]) for r in b.results().collect()}
    assert rows_a == rows_b
    assert any(sc == 429 for _u, _w, sc in rows_a)  # retries actually exercised


# ---- third review pass pins (round-1 parity drift) ----

def test_domain_filter_empty_allowlist_means_no_restriction(spark):
    from crawl4ai_spark.functions.filters import domain

    df = spark.createDataFrame([("https://a.com/x",), ("https://b.org/y",)], "url string")
    got = {r["url"]: r["ok"] for r in df.select("url", domain(allowed_domains=[])(F.col("url")).alias("ok")).collect()}
    assert all(got.values())  # falsy allow-list = no restriction (reference)
    blocked = {r["url"]: r["ok"] for r in df.select(
        "url", domain(allowed_domains=[], blocked_domains=["b.org"])(F.col("url")).alias("ok")).collect()}
    assert blocked["https://a.com/x"] and not blocked["https://b.org/y"]


def test_freshness_consumes_month_day(spark):
    """Reference date pattern consumes /mm[/dd] — '-2024' inside a
    consumed month/day tail is NOT a second year."""
    from crawl4ai_spark.functions.scorers import freshness_year_expr

    df = spark.createDataFrame(
        [("https://site.com/season-2023-2024/stats",),
         ("https://site.com/archive/2023/05/2024",),
         ("https://site.com/posts/2022/11/30/x",),
         ("https://site.com/plain",)],
        "url string",
    )
    got = {r["url"]: r["y"] for r in df.select("url", freshness_year_expr(F.col("url")).alias("y")).collect()}
    assert got["https://site.com/season-2023-2024/stats"] == 2023
    assert got["https://site.com/archive/2023/05/2024"] == 2023
    assert got["https://site.com/posts/2022/11/30/x"] == 2022
    assert got["https://site.com/plain"] is None


def test_parser_nested_and_unclosed_anchors():
    from crawl4ai_spark.operators.scrape import parse_page

    p = parse_page("https://h.com/", '<a href="/p1">One <a href="/p2">Two</a> and <a href="/p3">Three')
    hrefs = [ln["href"] for ln in p.links]
    assert hrefs == ["/p1", "/p2", "/p3"]  # nested auto-closed; trailing flushed
    # link text: strip ends only, internal whitespace preserved (text_content().strip())
    p2 = parse_page("https://h.com/", '<a href="/x">hello\n   world </a>')
    assert p2.links[0]["text"] == "hello\n   world"


def test_image_score_and_icon_reference_parity():
    from crawl4ai_spark.operators.scrape import _is_icon, image_score, parse_page

    html = (
        '<picture><source srcset="/a.webp 1x"><img src="/hero" data-srcset="/h.png 2x" alt="x"></picture>'
        '<img width="800px" height="600px" src="/art.svg">'
        '<div class="logo-box"><img src="/brand.png" alt="brand"></div>'
        '<img alt="Company logo" src="/hero2.png">'
        '<button><img src="/b.png"></button>'
        '<img src="/css-sprite-main.png" alt="strip">'
    )
    p = parse_page("https://h.com/", html)
    imgs = {i["src"]: i for i in p.images}
    hero = imgs["/hero"]
    # picture ancestor +1, data-srcset format (png) +1, srcset-presence +1, alt +1, position +1
    assert hero["in_picture"] and image_score(hero, 0, 6) == 5
    # px-suffixed dims don't count (isdigit), svg is not a format
    assert image_score(imgs["/art.svg"], 1, 6) == 1  # only first-half position
    assert _is_icon(imgs["/brand.png"])      # parent class contains 'logo'
    assert _is_icon(imgs["/hero2.png"])      # alt contains 'logo'
    assert _is_icon(imgs["/b.png"])          # button parent
    assert not _is_icon(imgs["/css-sprite-main.png"])  # 'sprite' is NOT a hint


def test_table_first_row_th_per_section(spark):
    from crawl4ai_spark.operators.scrape import extract_tables

    # no thead; th only in the SECOND tbody's first tr — reference
    # .//tr[1]/th still grants the +1 (first tr of each section)
    html = (
        '<table summary="s"><caption>c</caption>'
        "<tbody><tr><td>1</td><td>2</td></tr><tr><td>3</td><td>4</td></tr></tbody>"
        "<tbody><tr><th>h1</th><th>h2</th></tr></tbody></table>"
    )
    pages = spark.createDataFrame([("u", html)], "url string, html string")
    rows = extract_tables(pages, table_score_threshold=10).collect()
    # score: tbody+1, th+2, section-first-th+1, variance+2, caption+2,
    # summary+1, rows>=2&cols>=2 +2 = 11 ≥ 10 — without the per-section
    # fix it lands at 10 and drops
    assert len(rows) == 1
