"""Persisted dedup state (operators/dedup_state.py): wave-incremental
signature computation, pair parity with the one-shot operators,
geometry guard."""

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators import docdedup
from crawl4ai_spark.operators.dedup_state import DedupState
from crawl4ai_spark.sources.catalog import SnapshotCatalog


def _docs(spark, ids_texts):
    return spark.createDataFrame(ids_texts, "doc_id long, text string")


BASE = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "the quick brown fox jumps over the lazy dog again and again today"),
    (3, "completely different content about spark shuffle partitions tuning"),
    (4, "another unrelated document mentioning bread yeast fermentation"),
]
WAVE2 = [
    (5, "the quick brown fox jumps over the lazy dog again and again"),  # dup of 1
    (6, "fresh new material on window functions and range frames"),
    (3, "completely different content about spark shuffle partitions tuning"),  # already known
]


def test_update_wave_computes_only_new(spark, tmp_path):
    st = DedupState(SnapshotCatalog(str(tmp_path / "cat"), spark))
    r1 = st.update_wave(_docs(spark, BASE), wave_id=1)
    assert r1["new_docs"] == 4
    r2 = st.update_wave(_docs(spark, WAVE2), wave_id=2)
    assert r2["new_docs"] == 2  # doc 3 already known
    # the wave-2 delta on disk holds exactly the two new docs
    snap = st.catalog.latest_snapshot()
    delta = spark.read.parquet(snap["appends"]["minhash_sigs"][-1])
    assert {r["doc_id"] for r in delta.select("doc_id").collect()} == {5, 6}
    # full state = union of both waves
    assert st.signatures().count() == 6
    # a wave with nothing new writes nothing
    r3 = st.update_wave(_docs(spark, BASE), wave_id=3)
    assert r3["new_docs"] == 0
    assert st.catalog.latest_snapshot()["wave_id"] == 2


def test_state_pairs_match_oneshot(spark, tmp_path):
    st = DedupState(SnapshotCatalog(str(tmp_path / "cat"), spark))
    st.update_wave(_docs(spark, BASE), wave_id=1)
    st.update_wave(_docs(spark, WAVE2), wave_id=2)
    all_docs = _docs(spark, BASE + [r for r in WAVE2 if r[0] in (5, 6)])

    got = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in st.minhash_pairs(threshold=0.5).collect()
    }
    exp = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in docdedup.minhash_lsh_pairs(all_docs, threshold=0.5).collect()
    }
    assert got == exp and got  # non-empty: 1-2 and 1-5/2-5 dups exist

    sim_got = {(r["id_a"], r["id_b"]) for r in st.simhash_pairs().collect()}
    sim_exp = {
        (r["id_a"], r["id_b"])
        for r in docdedup.simhash_pairs(all_docs, max_hamming=6).collect()
    }
    assert sim_got == sim_exp and sim_got


def test_incremental_pairs_touch_new_docs_only(spark, tmp_path):
    st = DedupState(SnapshotCatalog(str(tmp_path / "cat"), spark))
    st.update_wave(_docs(spark, BASE), wave_id=1)
    st.update_wave(_docs(spark, WAVE2), wave_id=2)
    new_ids = spark.createDataFrame([(5,), (6,)], "doc_id long")
    inc = st.minhash_pairs(threshold=0.5, new_ids=new_ids).collect()
    assert inc, "doc 5 duplicates doc 1/2"
    assert all(r["id_a"] in (5, 6) or r["id_b"] in (5, 6) for r in inc)
    # incremental ∪ historic == full pair set
    hist = st.minhash_pairs(threshold=0.5, new_ids=spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], "doc_id long")).collect()
    full = st.minhash_pairs(threshold=0.5).collect()
    key = lambda r: (r["id_a"], r["id_b"])
    assert {key(r) for r in inc} | {key(r) for r in hist} == {key(r) for r in full}


def test_geometry_guard(spark, tmp_path):
    root = str(tmp_path / "cat")
    st = DedupState(SnapshotCatalog(root, spark), n_perm=16, bands=4)
    st.update_wave(_docs(spark, BASE), wave_id=1)
    # same geometry resumes fine
    DedupState(SnapshotCatalog(root, spark), n_perm=16, bands=4)
    # different geometry must refuse to mix signatures
    with pytest.raises(ValueError, match="geometry|built with"):
        DedupState(SnapshotCatalog(root, spark), n_perm=32, bands=8)


def test_crawljob_emits_dedup_state(spark, tmp_path):
    """emit_doc_dedup: signature deltas ride the wave commits; the
    persisted state covers every fetched page (each signed exactly once)
    and doc_dups() finds the deliberately duplicated page pair."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.operators.traversal import canonical_corpus_fetcher
    from crawl4ai_spark.pipeline import CrawlJob, JobConfig
    from crawl4ai_spark.sources.corpus import generate_corpus, page_url

    corpus = generate_corpus(seed=11, n_hosts=2, pages_per_host=8, with_images=False)
    pages = spark.createDataFrame(corpus["pages"])
    # make two distinct URLs carry IDENTICAL html (a true content dup)
    src = pages.filter(F.col("url") == page_url(0, 3)).select("html").first()["html"]
    pages = pages.withColumn(
        "html", F.when(F.col("url") == page_url(1, 3), F.lit(src)).otherwise(F.col("html"))
    )
    cfg = JobConfig(max_depth=3, wave_budget=100.0, use_bloom=False,
                    emit_images=False, emit_doc_dedup=True)
    job = CrawlJob(spark, canonical_corpus_fetcher(pages), catalog_root=str(tmp_path / "cat"), config=cfg)
    job.seed(spark.createDataFrame([(page_url(0, 0),), (page_url(1, 0),)], "url string"))
    job.run(max_waves=6)

    fetched = {r["url"] for r in job.results().filter("success").collect()}
    st = job.doc_dedup_state()
    signed = [r["doc_id"] for r in st.signatures().select("doc_id").collect()]
    assert set(signed) == fetched
    assert len(signed) == len(fetched)  # each page signed exactly once
    pairs = {(r["id_a"], r["id_b"]) for r in job.doc_dups(threshold=0.9).collect()}
    a, b = sorted([page_url(0, 3), page_url(1, 3)])
    assert (a, b) in pairs
