"""CosineStrategy — semantic block clustering (extraction_strategy.py:135-482).

The reference pipeline, given chunk vectors:

1. **semantic pre-filter** (:243-296) — cosine similarity of every chunk
   to the ``semantic_filter`` embedding; keep chunks ≥ ``sim_threshold``
   in document order, backfill the best of the rest to reach
   ``at_least_k`` (20, or len//2 for small pages), cap at that k.
2. **hierarchical clustering** (:345-376) — pairwise cosine distances →
   agglomerative linkage (default ``ward``) → flat clusters at
   cophenetic distance ≤ ``max_dist``.
3. **cluster assembly** (:404-446) — group chunks by label retaining
   document order, drop clusters under ``word_count_threshold`` words,
   emit sorted by label with joined content.

Model boundary (same policy as adaptive_embedding): the reference embeds
with sentence-transformers and tags clusters with a multilabel
classifier — neither runtime exists here, so the embedder is an injected
callable (tests/fixtures use the deterministic feature-hashing
``hash_embed``) and ``tags`` is always ``[]`` (an honest stub, clearly
documented — the reference's tag step is the one line we cannot run).

scipy is also absent, so the linkage is a self-contained
Lance–Williams agglomeration (public textbook recurrences for ward /
single / complete / average) with merges applied in ascending height;
``fcluster(criterion='distance')`` becomes a union-find over merges with
height ≤ max_dist.  Label NUMBERING diverges from scipy's leader
algorithm by design: labels are assigned by each cluster's first chunk
index (deterministic and order-meaningful), which only affects the
arbitrary integer ids, not the grouping.

Spark shape: clustering is per-page (n = chunks of one page, small by
construction), so the operator is a stateless mapInPandas over the
pages table — the scale dimension is pages, and it parallelizes
linearly like the other extraction strategies.
"""

from __future__ import annotations

import math
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .adaptive_embedding import hash_embed

DEL = "\n\n"  # the reference's chunk delimiter (ExtractionStrategy.DEL)


def _cos_sim(a: list[float], b: list[float]) -> float:
    dot = 0.0
    for x, y in zip(a, b):
        dot += x * y
    na = 0.0
    for x in a:
        na += x * x
    nb = 0.0
    for y in b:
        nb += y * y
    if na == 0.0 or nb == 0.0:
        return 0.0
    return dot / (math.sqrt(na) * math.sqrt(nb))


def filter_documents_embeddings(
    documents: list[str],
    embed_fn: Callable[[str], list[float]],
    semantic_filter: str | None,
    sim_threshold: float = 0.3,
    at_least_k: int = 20,
) -> list[str]:
    """Pre-filter transcription (:243-296): threshold keep in document
    order, similarity-sorted backfill, hard cap at ``at_least_k``.

    Pinned reference QUIRK: for fewer than ``at_least_k`` documents the
    cap becomes ``len(documents) // 2`` — a ONE-chunk page therefore
    returns [] whenever a semantic_filter is set, no matter how relevant
    the chunk (the reference's own :252-253 + :294 do exactly this).
    Callers that need tiny pages clustered should pass
    ``semantic_filter=None``."""
    if not semantic_filter:
        return documents
    if len(documents) < at_least_k:
        at_least_k = len(documents) // 2
    q = embed_fn(semantic_filter)
    sims = [_cos_sim(q, embed_fn(d)) for d in documents]
    filtered = [(d, s) for d, s in zip(documents, sims) if s >= sim_threshold]
    if len(filtered) < at_least_k:
        remaining = [(d, s) for d, s in zip(documents, sims) if s < sim_threshold]
        remaining.sort(key=lambda x: x[1], reverse=True)
        filtered.extend(remaining[: at_least_k - len(filtered)])
    return [d for d, _ in filtered][:at_least_k]


def _lance_williams(
    d_ik: float, d_jk: float, d_ij: float, ni: int, nj: int, nk: int, method: str
) -> float:
    if method == "ward":
        n = ni + nj + nk
        return math.sqrt(
            max(
                ((ni + nk) * d_ik * d_ik + (nj + nk) * d_jk * d_jk - nk * d_ij * d_ij)
                / n,
                0.0,
            )
        )
    if method == "single":
        return min(d_ik, d_jk)
    if method == "complete":
        return max(d_ik, d_jk)
    if method == "average":
        return (ni * d_ik + nj * d_jk) / (ni + nj)
    raise ValueError(f"unsupported linkage method: {method}")


def cluster_labels(
    embeddings: list[list[float]],
    max_dist: float = 0.2,
    linkage_method: str = "ward",
) -> list[int]:
    """Agglomerative clustering over pairwise cosine distances, flat-cut
    at cophenetic distance ≤ ``max_dist`` (:345-376 semantics).  Returns
    one label per input, numbered by first-member index (see module
    docstring for the scipy-numbering divergence)."""
    n = len(embeddings)
    if n == 0:
        return []
    if n == 1:
        return [1]
    # active clusters: id → (members, size); distance dict on id pairs
    dist: dict[tuple[int, int], float] = {}
    for i in range(n):
        for j in range(i + 1, n):
            dist[(i, j)] = 1.0 - _cos_sim(embeddings[i], embeddings[j])
    members = {i: [i] for i in range(n)}
    active = set(range(n))
    next_id = n
    merges: list[tuple[float, int, int, int]] = []  # (height, a, b, new)
    while len(active) > 1:
        # smallest pairwise distance; ties broken by (a, b) for
        # determinism (distinct float minima in practice)
        (a, b), h = min(dist.items(), key=lambda kv: (kv[1], kv[0]))
        nid = next_id
        next_id += 1
        merges.append((h, a, b, nid))
        na_, nb_ = len(members[a]), len(members[b])
        members[nid] = members[a] + members[b]
        active.discard(a)
        active.discard(b)
        new_d = {}
        for k in active:
            d_ik = dist.pop((min(a, k), max(a, k)))
            d_jk = dist.pop((min(b, k), max(b, k)))
            new_d[(k, nid)] = _lance_williams(
                d_ik, d_jk, h, na_, nb_, len(members[k]), linkage_method
            )
        dist.pop((a, b), None)
        dist = {kv: v for kv, v in dist.items() if a not in kv and b not in kv}
        dist.update(new_d)
        active.add(nid)
    # flat cut: apply merges with height ≤ max_dist (heights ascend for
    # ward; sort anyway so non-monotonic methods cut correctly)
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    id_members = {i: [i] for i in range(n)}
    for h, a, b, nid in sorted(merges, key=lambda m: m[0]):
        id_members[nid] = id_members[a] + id_members[b]
        if h <= max_dist:
            ra, rb = find(id_members[a][0]), find(id_members[b][0])
            if ra != rb:
                parent[rb] = ra
    # label = rank of each cluster's first member index, 1-based
    roots: dict[int, int] = {}
    firsts: list[tuple[int, int]] = []
    for i in range(n):
        r = find(i)
        if r not in roots:
            roots[r] = len(firsts)
            firsts.append((i, r))
    order = {r: rank + 1 for rank, (_, r) in enumerate(sorted(firsts))}
    return [order[find(i)] for i in range(n)]


def cosine_extract(
    html: str,
    embed_fn: Callable[[str], list[float]] = hash_embed,
    semantic_filter: str | None = None,
    word_count_threshold: int = 10,
    max_dist: float = 0.2,
    linkage_method: str = "ward",
    sim_threshold: float = 0.3,
) -> list[dict]:
    """extract() transcription (:404-473): split on DEL → pre-filter →
    cluster → group/filter/sort.  ``tags`` is always [] (no classifier
    runtime — documented stub)."""
    text_chunks = (html or "").split(DEL)
    text_chunks = filter_documents_embeddings(
        text_chunks, embed_fn, semantic_filter, sim_threshold
    )
    if not text_chunks:
        return []
    labels = cluster_labels(
        [embed_fn(c) for c in text_chunks], max_dist, linkage_method
    )
    clusters: dict[int, list[str]] = {}
    for idx, label in enumerate(labels):
        clusters.setdefault(label, []).append(text_chunks[idx])
    filtered = {
        cid: texts
        for cid, texts in clusters.items()
        if len(" ".join(texts).split()) >= word_count_threshold
    }
    return [
        {"index": int(cid), "tags": [], "content": " ".join(filtered[cid])}
        for cid in sorted(filtered)
    ]


COSINE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("cluster_index", T.IntegerType()),
        T.StructField("content", T.StringType()),
    ]
)


def cosine_extract_pages(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    embed_fn: Callable[[str], list[float]] = hash_embed,
    semantic_filter: str | None = None,
    word_count_threshold: int = 10,
    max_dist: float = 0.2,
    linkage_method: str = "ward",
    sim_threshold: float = 0.3,
) -> DataFrame:
    """Per-page semantic clustering → one row per kept cluster."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf[url_col], pdf[html_col]):
                for c in cosine_extract(
                    html, embed_fn, semantic_filter, word_count_threshold,
                    max_dist, linkage_method, sim_threshold,
                ):
                    rows.append((url, c["index"], c["content"]))
            yield pd.DataFrame(rows, columns=["url", "cluster_index", "content"])

    return pages.select(url_col, html_col).mapInPandas(gen, COSINE_SCHEMA)
