"""End-to-end CrawlJob: seeds → waves → payload table, with robots,
politeness, dedup lineage, and snapshot resume."""

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.multimodal import IMAGE_SCHEMA, psnr_against
from crawl4ai_spark.operators.traversal import canonical_corpus_fetcher
from crawl4ai_spark.pipeline import CrawlJob, JobConfig
from crawl4ai_spark.sources.corpus import generate_corpus, host_name, page_url


@pytest.fixture(scope="module")
def world(spark):
    corpus = generate_corpus(seed=42, n_hosts=5, pages_per_host=12, images_per_page=1)
    return {
        "pages": spark.createDataFrame(corpus["pages"]),
        "seeds": spark.createDataFrame(corpus["seeds"]),
        "robots": spark.createDataFrame(corpus["robots"]),
        "images": spark.createDataFrame(
            corpus["images"][["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]],
            schema=IMAGE_SCHEMA,
        ),
        "images_pdf": corpus["images"],
    }


def make_job(spark, world, root, **cfg_kw):
    cfg = JobConfig(
        max_depth=3,
        wave_budget=100.0,
        default_delay=1.0,
        use_bloom=cfg_kw.pop("use_bloom", True),
        bloom_partitions=8,
        bloom_bits=1 << 16,
        **cfg_kw,
    )
    return CrawlJob(
        spark,
        canonical_corpus_fetcher(world["pages"]),
        catalog_root=root,
        config=cfg,
        robots=world["robots"],
        image_store=world["images"],
    )


@pytest.fixture(scope="module")
def finished(spark, world, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("crawl"))
    job = make_job(spark, world, root)
    job.seed(world["seeds"])
    summary = job.run(max_waves=12)
    return job, summary


def test_job_crawls_and_respects_robots(finished):
    job, summary = finished
    assert summary["pages_crawled"] > 10
    res = job.results()
    ok_urls = {r["url"] for r in res.filter("success").collect()}
    # disallow-all host (host4): only its seed appears, as a 403 failure
    denied = res.filter(~F.col("success") & (F.col("status_code") == 403))
    denied_hosts = {r["host"] for r in denied.collect()}
    assert host_name(4) in denied_hosts
    assert not any(host_name(4) in u for u in ok_urls)
    # /admin/ disallowed on host1 (h%5==1)
    assert not any("/admin/" in u and host_name(1) in u for u in ok_urls)
    # but /admin/ pages crawled on unrestricted hosts
    assert any("/admin/" in u for u in ok_urls)


def test_job_seen_set_no_refetch(finished):
    job, _ = finished
    res = job.results().filter("success").collect()
    urls = [r["url"] for r in res]
    assert len(urls) == len(set(urls))  # every page fetched at most once
    seen = {r["url"] for r in job.seen_urls().collect()}
    assert set(urls) <= seen


def test_job_politeness_spacing(finished):
    job, _ = finished
    res = job.results().filter("success").collect()
    by_host_wave = {}
    for r in res:
        by_host_wave.setdefault((r["host"], r["wave_id"]), []).append(r["scheduled_offset"])
    for (host, wave), offsets in by_host_wave.items():
        offsets.sort()
        for a, b in zip(offsets, offsets[1:]):
            assert b - a >= 0.75 - 1e-9, f"{host} wave {wave}: {offsets}"


def test_job_images_payload_invariant(spark, finished, world):
    job, _ = finished
    images = job.images()
    assert images is not None and images.count() > 0
    # caption equality + PSNR vs the ground-truth store
    chk = psnr_against(images, world["images"])
    rows = chk.collect()
    assert all(r["caption_equal"] for r in rows)
    assert all(r["psnr_db"] == float("inf") for r in rows)  # png lossless
    # only images of successfully crawled pages landed
    from crawl4ai_spark.functions.urls import normalize_url_for_deep_crawl

    crawled = {r["url"] for r in job.results().filter("success").collect()}
    pages_of = dict(zip(world["images_pdf"]["image_id"], world["images_pdf"]["page_url"]))
    for r in images.select("image_id").collect():
        page = pages_of[r["image_id"]]
        assert normalize_url_for_deep_crawl(page, page) in crawled


def test_job_lineage(finished):
    job, summary = finished
    lin = job.lineage()
    assert lin.count() > 0
    agg = lin.agg(F.sum("urls_in").alias("in"), F.sum("dedup_hits").alias("dh")).collect()[0]
    assert agg["in"] >= summary["pages_crawled"]
    # corpus contains duplicate hrefs by construction → dedup hits observed
    assert agg["dh"] > 0


def test_job_resume_equals_single_run(spark, world, tmp_path_factory, finished):
    # run A: all at once (the `finished` fixture). run B: 2 waves, then a
    # NEW job instance resumes from the snapshot → identical seen set.
    job_a, _ = finished
    root_b = str(tmp_path_factory.mktemp("crawl_resume"))
    job_b1 = make_job(spark, world, root_b)
    job_b1.seed(world["seeds"])
    job_b1.run(max_waves=2)
    job_b2 = make_job(spark, world, root_b)  # fresh instance, same catalog
    job_b2.run(max_waves=10)
    seen_a = {r["url"] for r in job_a.seen_urls().collect()}
    seen_b = {r["url"] for r in job_b2.seen_urls().collect()}
    assert seen_a == seen_b
    res_a = {(r["url"], r["wave_id"]) for r in job_a.results().collect()}
    res_b = {(r["url"], r["wave_id"]) for r in job_b2.results().collect()}
    assert res_a == res_b


def test_job_bloom_off_equivalence(spark, world, tmp_path_factory, finished):
    job_a, _ = finished
    root = str(tmp_path_factory.mktemp("crawl_nobloom"))
    job = make_job(spark, world, root, use_bloom=False)
    job.seed(world["seeds"])
    job.run(max_waves=12)
    assert {r["url"] for r in job.seen_urls().collect()} == {
        r["url"] for r in job_a.seen_urls().collect()
    }


def test_job_matches_reference_bfs_oracle(spark, world, tmp_path_factory):
    """North-rule tie: the PRODUCTION wave composition (politeness on,
    budget ample, no robots) crawls exactly the reference BFS level sets
    and ends with the reference URL-seen set (modulo the canonical
    seed, which CrawlJob pre-seeds)."""
    import sys

    sys.path.insert(0, "tests")
    from reference_oracle import bfs_oracle

    from crawl4ai_spark.functions.urls import normalize_url_for_deep_crawl

    corpus_pdf = world["pages"].toPandas()
    html_by_url = dict(zip(corpus_pdf["url"], corpus_pdf["html"]))
    canon_html = {
        normalize_url_for_deep_crawl(u, u): h for u, h in html_by_url.items()
    }

    def fetch(url):
        h = canon_html.get(url) or html_by_url.get(url)
        return (True, 200, h) if h is not None else (False, 404, "")

    start = page_url(0, 0)
    res, visited = bfs_oracle(start, fetch, max_depth=3)
    oracle_levels = {}
    for url, depth, _parent, success in res:
        if success:
            oracle_levels.setdefault(depth, set()).add(url)

    root = str(tmp_path_factory.mktemp("oracle_job"))
    job = make_job(spark, world, root, use_bloom=True, emit_images=False)
    job.robots = None
    seeds = spark.createDataFrame([(start,)], "url string")
    job.seed(seeds)
    job.run(max_waves=8)

    got_levels = {}
    for r in job.results().filter("success").collect():
        got_levels.setdefault(r["depth"], set()).add(r["url"])

    canon_start = normalize_url_for_deep_crawl(start, start)
    # depth 0: job crawls the canonical seed; oracle crawls the raw start
    assert got_levels[0] == {canon_start}
    assert oracle_levels[0] == {start}
    for d in range(1, 4):
        assert got_levels.get(d, set()) == oracle_levels.get(d, set()), d

    job_seen = {r["url"] for r in job.seen_urls().collect()}
    assert job_seen == visited | {canon_start}


def test_emit_pdfs_lands_validated_document_tables(spark, tmp_path):
    """The document plane (JobConfig.emit_pdfs + pdf_store): fetched
    pages' .pdf links resolve against the store and land per-page text
    and per-image rows in the catalog, matching a direct parse of the
    same payloads."""
    import hashlib

    from crawl4ai_spark.operators.traversal import canonical_corpus_fetcher
    from crawl4ai_spark.pdf import parse_pdf
    from crawl4ai_spark.pipeline import CrawlJob, JobConfig
    from crawl4ai_spark.sources.corpus import generate_corpus

    corpus = generate_corpus(seed=7, n_hosts=2, pages_per_host=6,
                             with_images=False, with_pdfs=True)
    assert len(corpus["pdfs"]) > 0
    # max_depth=1: page i=1 (depth 1) is crawled, page i=5 (depth 2) is
    # NOT — its pdf must stay out of the catalog (real negative case)
    job = CrawlJob(
        spark,
        canonical_corpus_fetcher(spark.createDataFrame(corpus["pages"])),
        catalog_root=str(tmp_path / "cat"),
        config=JobConfig(max_depth=1, wave_budget=100.0, emit_images=False,
                         emit_pdfs=True, use_bloom=False),
        robots=spark.createDataFrame(corpus["robots"]),
        pdf_store=spark.createDataFrame(corpus["pdfs"][["pdf_id", "bytes"]]),
    )
    job.seed(spark.createDataFrame(corpus["seeds"]))
    job.run(max_waves=4)

    pages = {(r["pdf_id"], r["page_number"]): r for r in job.catalog.read("pdf_pages").collect()}
    images = [r.asDict() for r in job.catalog.read("pdf_images").collect()]
    assert pages, "no pdf pages emitted"
    # every emitted row matches a direct parse of the stored payload
    payload = dict(zip(corpus["pdfs"]["pdf_id"], corpus["pdfs"]["bytes"]))
    emitted_ids = {pid for pid, _ in pages}
    for pid in emitted_ids:
        res = parse_pdf(payload[pid])
        for pg in res["pages"]:
            row = pages[(pid, pg["page_number"])]
            assert row["raw_text"] == pg["raw_text"]
            assert row["n_pages"] == res["metadata"]["pages"]
    for r in images:
        assert r["error"] is None and r["phash"] is not None
        res = parse_pdf(payload[r["pdf_id"]])
        im = res["pages"][r["page_number"] - 1]["images"][r["img_index"]]
        assert hashlib.md5(im["data"]).hexdigest() == hashlib.md5(r["data"]).hexdigest()
    # the negative case for real: crawled pages are exactly depth <= 1,
    # so the depth-2 page's pdf (i=5) must be absent while the depth-1
    # page's pdf (i=1) is present — for every host the crawl reached
    crawled = {r["url"] for r in job.catalog.read("results").filter("success").collect()}
    linked_from = dict(zip(corpus["pdfs"]["pdf_id"], corpus["pdfs"]["page_url"]))
    for pid, page_url in linked_from.items():
        if page_url in crawled:
            assert pid in emitted_ids, (pid, page_url)
        else:
            assert pid not in emitted_ids, (pid, page_url)
    assert any(u not in crawled for u in linked_from.values()), "corpus lost its negative case"


def test_emit_pdfs_cross_wave_dedup(spark, tmp_path):
    """A PDF linked from pages crawled in DIFFERENT waves must land in
    the catalog exactly once (first-writer wave wins), like the URL seen
    set."""
    import pandas as pd

    from crawl4ai_spark.operators.traversal import canonical_corpus_fetcher
    from crawl4ai_spark.pipeline import CrawlJob, JobConfig
    from crawl4ai_spark.sources.corpus import _pdf_payload

    root = "https://w.test/"
    child = "https://w.test/docs/p1"
    pdf_link = '<a href="/files/shared-0001.pdf">pdf</a>'
    pages = pd.DataFrame(
        [
            dict(url=root, host="w.test", depth_hint=0,
                 head_html="<head><title>r</title></head>",
                 html=f'<html><body><a href="/docs/p1">c</a>{pdf_link}</body></html>',
                 status_code=200),
            dict(url=child, host="w.test", depth_hint=1,
                 head_html="<head><title>c</title></head>",
                 html=f"<html><body>{pdf_link}</body></html>",
                 status_code=200),
        ]
    )
    store = pd.DataFrame([dict(pdf_id="shared-0001", bytes=_pdf_payload("shared-0001", 0, 1))])
    job = CrawlJob(
        spark,
        canonical_corpus_fetcher(spark.createDataFrame(pages)),
        catalog_root=str(tmp_path / "cat2"),
        config=JobConfig(max_depth=2, wave_budget=100.0, emit_images=False,
                         emit_pdfs=True, use_bloom=False),
        pdf_store=spark.createDataFrame(store),
    )
    job.seed(spark.createDataFrame([(root,)], ["url"]))
    job.run(max_waves=4)
    rows = job.catalog.read("pdf_pages").collect()
    waves = {r["wave_id"] for r in rows}
    ids = [(r["pdf_id"], r["page_number"]) for r in rows]
    assert len(ids) == len(set(ids)), "duplicate (pdf_id, page) rows across waves"
    assert waves == {min(waves)}, "pdf re-emitted in a later wave"
    # both linking pages really were crawled in different waves
    from crawl4ai_spark.functions.urls import normalize_url_for_deep_crawl

    res = {r["url"]: r["wave_id"] for r in job.catalog.read("results").filter("success").collect()}
    assert (
        res[normalize_url_for_deep_crawl(root, root)]
        != res[normalize_url_for_deep_crawl(child, child)]
    )
