"""CosineStrategy graft (operators/cosine_strategy.py): pre-filter
quirks, Lance-Williams agglomeration + distance cut, cluster assembly,
Spark operator."""

import math

import pytest

from crawl4ai_spark.operators.adaptive_embedding import hash_embed
from crawl4ai_spark.operators.cosine_strategy import (
    DEL,
    cluster_labels,
    cosine_extract,
    cosine_extract_pages,
    filter_documents_embeddings,
)

CHUNKS = [
    "spark shuffle partitions exchange tuning spark spark",
    "spark joins broadcast merge spark tuning shuffle",
    "bread yeast dough starter fermentation bread bread",
    "bread ovens flour dough yeast baking bread",
    "violin sonata tempo allegro strings crescendo music",
]


def test_cluster_labels_three_topics():
    labs = cluster_labels([hash_embed(c) for c in CHUNKS], max_dist=0.6)
    assert labs[0] == labs[1] and labs[2] == labs[3]
    assert len({labs[0], labs[2], labs[4]}) == 3
    # labels numbered by first-member order
    assert labs == [1, 1, 2, 2, 3]


def test_cluster_labels_edges():
    assert cluster_labels([]) == []
    assert cluster_labels([hash_embed("one")]) == [1]
    # max_dist=0: nothing merges (identical vectors have distance 0,
    # which IS <= 0 — so only exact duplicates collapse)
    e = [hash_embed("a a"), hash_embed("a a"), hash_embed("b c d")]
    labs = cluster_labels(e, max_dist=0.0)
    assert labs[0] == labs[1] != labs[2]
    # huge max_dist: everything one cluster
    assert len(set(cluster_labels([hash_embed(c) for c in CHUNKS], max_dist=10.0))) == 1


def test_linkage_methods_agree_on_separated_data():
    embs = [hash_embed(c) for c in CHUNKS]
    for m in ("ward", "single", "complete", "average"):
        labs = cluster_labels(embs, max_dist=0.6, linkage_method=m)
        assert labs[0] == labs[1] and labs[2] == labs[3], m
    with pytest.raises(ValueError):
        cluster_labels(embs, linkage_method="median")


def test_filter_documents_quirks():
    # reference :243-296: no filter → untouched
    docs = [f"unique{i} spark" if i < 5 else f"unique{i} zzz" for i in range(30)]
    assert filter_documents_embeddings(docs, hash_embed, None) == docs
    kept = filter_documents_embeddings(docs, hash_embed, "spark", sim_threshold=0.99)
    # nothing reaches 0.99 → backfill exactly at_least_k best by sim
    assert len(kept) == 20
    # small doc lists: at_least_k becomes len//2
    small = docs[:6]
    kept_small = filter_documents_embeddings(small, hash_embed, "spark", sim_threshold=0.99)
    assert len(kept_small) == 3


def test_cosine_extract_assembly():
    html = DEL.join(CHUNKS)
    out = cosine_extract(html, max_dist=0.6, word_count_threshold=5)
    assert [c["index"] for c in out] == [1, 2, 3]
    assert out[0]["content"] == CHUNKS[0] + " " + CHUNKS[1]
    assert all(c["tags"] == [] for c in out)  # documented classifier stub
    # word-count threshold drops the 7-word violin cluster at 10
    out10 = cosine_extract(html, max_dist=0.6, word_count_threshold=10)
    assert [c["index"] for c in out10] == [1, 2]
    assert cosine_extract("") == []


def test_cosine_extract_pages_spark(spark):
    html = DEL.join(CHUNKS)
    pages = spark.createDataFrame(
        [("u1", html), ("u2", "")], "url string, html string"
    )
    rows = cosine_extract_pages(
        pages, max_dist=0.6, word_count_threshold=5
    ).orderBy("url", "cluster_index").collect()
    exp = cosine_extract(html, max_dist=0.6, word_count_threshold=5)
    assert [(r["url"], r["cluster_index"], r["content"]) for r in rows] == [
        ("u1", c["index"], c["content"]) for c in exp
    ]


def test_filter_single_chunk_quirk_pinned():
    """Reference :252-253/:294: <at_least_k docs → cap = len//2, so a
    1-chunk page with a semantic_filter yields [] even on a perfect
    match (pinned, documented in the docstring)."""
    assert filter_documents_embeddings(["spark spark"], hash_embed, "spark") == []
    out = cosine_extract("spark " * 20, semantic_filter="spark", word_count_threshold=5)
    assert out == []
    # without a filter the same page clusters normally
    assert cosine_extract("spark " * 20, word_count_threshold=5)
