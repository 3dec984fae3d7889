"""EmbeddingStrategy adaptive crawl: Spark kernels vs the sequential
oracle transcription (adaptive_crawler.py:617-1453)."""

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.adaptive_embedding import (
    coverage_gaps,
    embedding_digest,
    hash_embed,
    kb_dedup_batch,
    quality_confidence,
    select_links_for_expansion,
    split_query_space,
)
from crawl4ai_spark.oracles import embedding_digest_replay


def _site() -> dict:
    """Two-topic site: spark pages share tokens with the query space,
    bread pages don't — selection must favor the spark cluster."""
    hub_links = []
    pages = {}
    spark_terms = {
        "joins": "spark joins broadcast hash merge strategies",
        "windows": "spark windows ranking frames functions",
        "shuffle": "spark shuffle partitions exchange tuning",
        "aggregation": "spark aggregation groupby partial combine",
    }
    bread_terms = {
        "flour": "bread flour gluten protein milling",
        "yeast": "bread yeast fermentation rise starter",
        "ovens": "bread ovens stone steam baking",
    }
    for topic, words in {**spark_terms, **bread_terms}.items():
        url = f"https://site.test/{topic}"
        pages[url] = (words + " article content", [])
        hub_links.append((url, words, topic))
    pages["https://site.test/"] = ("guide to spark and bread topics", hub_links)
    return pages


QUERY = "spark joins windows shuffle"
VARIATIONS = [
    "spark joins strategies",
    "spark windows functions",
    "spark shuffle partitions",
    "spark aggregation performance",
    "spark dataframe joins",
]


def test_split_query_space():
    train, val = split_query_space(QUERY, VARIATIONS)
    assert train[0] == QUERY and len(val) == 2
    assert train == [QUERY] + VARIATIONS[:3] and val == VARIATIONS[3:]
    # tiny variation lists still hold out 2
    t2, v2 = split_query_space(QUERY, ["a", "b", "c"])
    assert t2 == [QUERY, "a"] and v2 == ["b", "c"]


def test_coverage_gaps_empty_kb(spark):
    q = spark.createDataFrame(
        [(0, hash_embed("spark")), (1, hash_embed("bread"))],
        "query_id int, embedding array<double>",
    )
    gaps = coverage_gaps(None, q).collect()
    assert {r["gap"] for r in gaps} == {1.0}


def test_kb_dedup_batch_matesnot_compared(spark):
    """Reference :1240-1263: dedup is vs the EXISTING KB only — two
    identical docs in the same batch are both kept."""
    emb = hash_embed("identical text payload")
    batch = spark.createDataFrame(
        [("a", emb), ("b", emb)], "url string, embedding array<double>"
    )
    kept = kb_dedup_batch(None, batch).collect()
    assert len(kept) == 2
    # but a doc identical to the KB is dropped
    kb = spark.createDataFrame([("old", emb)], "url string, embedding array<double>")
    kept2 = kb_dedup_batch(kb, batch).collect()
    assert len(kept2) == 0
    other = spark.createDataFrame(
        [("c", hash_embed("completely different unrelated subject"))],
        "url string, embedding array<double>",
    )
    assert len(kb_dedup_batch(kb, other).collect()) == 1


def test_quality_confidence_mapping():
    # validated: 0.4-0.7 learning → 0.7-0.95
    assert quality_confidence(0.3, True, 0.5) == 0.7
    assert quality_confidence(0.8, True, 0.5) == 0.95
    assert abs(quality_confidence(0.5, True, 0.5) - (0.7 + 0.1 * 0.833)) < 1e-12
    # not validated: conservative 0.8x
    assert quality_confidence(0.5, False, 0.0) == 0.4
    assert quality_confidence(0.5, True, 0.2) == 0.4  # val below min


def _fetch_fn(spark, pages):
    def fetch(urls):
        rows = [
            (u, pages[u][0], [{"href": h, "text": t, "title": ti} for h, t, ti in pages[u][1]])
            for u in urls
            if u in pages
        ]
        return spark.createDataFrame(
            rows,
            "url string, text string, links array<struct<href string, text string, title string>>",
        )

    return fetch


def test_embedding_digest_matches_oracle(spark):
    pages = _site()
    kw = dict(max_depth=4, max_pages=6, top_k_links=2, min_gain_threshold=0.01)
    got = embedding_digest(
        spark, _fetch_fn(spark, pages), "https://site.test/", QUERY, VARIATIONS, **kw
    )
    exp = embedding_digest_replay(
        pages, "https://site.test/", QUERY, VARIATIONS, hash_embed, **kw
    )
    assert got["crawl_order"] == exp["crawl_order"]
    assert got["kb_urls"] == exp["kb_urls"]
    assert got["confidence_history"] == exp["confidence_history"]
    assert got["confidence"] == exp["confidence"]
    assert got["depth_reached"] == exp["depth_reached"]
    # the crawl actually progressed and picked on-topic pages first
    assert len(got["crawl_order"]) > 1
    first_wave = got["crawl_order"][1:3]
    assert all("site.test" in u for u in first_wave)


def test_embedding_digest_prefers_on_query_cluster(spark):
    pages = _site()
    got = embedding_digest(
        spark, _fetch_fn(spark, pages), "https://site.test/", QUERY, VARIATIONS,
        max_depth=3, max_pages=5, top_k_links=2, min_gain_threshold=0.01,
    )
    crawled_topics = [u.rsplit("/", 1)[-1] for u in got["crawl_order"][1:]]
    spark_topics = {"joins", "windows", "shuffle", "aggregation"}
    n_spark = sum(1 for t in crawled_topics if t in spark_topics)
    n_bread = len(crawled_topics) - n_spark
    assert n_spark > n_bread, got["crawl_order"]


def test_select_links_scoring_shape(spark):
    """No-gaps ⇒ all scores 0; gap-filling link outranks redundant one."""
    q = spark.createDataFrame(
        [(0, hash_embed("spark joins"))], "query_id int, embedding array<double>"
    )
    kb = spark.createDataFrame(
        [("kb1", hash_embed("spark joins broadcast"))],
        "url string, embedding array<double>",
    )
    links = spark.createDataFrame(
        [
            ("filler", 0, hash_embed("spark joins hash merge")),
            ("offtopic", 1, hash_embed("bread yeast starter")),
        ],
        "href string, _order int, embedding array<double>",
    )
    gaps = coverage_gaps(kb, q)
    ranked = select_links_for_expansion(links, gaps, kb).collect()
    by = {r["href"]: r["score"] for r in ranked}
    grow = gaps.collect()[0]["gap"]
    if grow > 0.2:  # gap open: on-topic link must outrank
        assert by["filler"] > by["offtopic"]
    # covered-query case: no gaps above radius ⇒ reduction 0 everywhere
    kb_full = spark.createDataFrame(
        [("kb2", hash_embed("spark joins"))], "url string, embedding array<double>"
    )
    gaps2 = coverage_gaps(kb_full, q)
    assert gaps2.collect()[0]["gap"] < 1e-9
    ranked2 = select_links_for_expansion(links, gaps2, kb_full).collect()
    assert all(r["score"] == 0.0 for r in ranked2)
