"""Adaptive-crawl confidence metrics as DataFrame aggregates.

The reference's StatisticalStrategy keeps per-process dicts of term/
document frequencies and computes coverage / consistency / saturation /
confidence over them (/root/reference/crawl4ai/adaptive_crawler.py:
confidence :311-328, coverage :330-369, consistency :371-396,
saturation :398-413).  Here the knowledge base is a DataFrame of
(doc_id, text); the stats become explode → groupBy aggregates and the
O(n²) consistency term a self-join over distinct term sets (the
knowledge base is tens of pages by construction — the crawl stops at
confidence ≥ threshold — so the quadratic pair count is tiny).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_expr


def term_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(term, tf, df): corpus-wide term frequency + document frequency —
    the reference's ``term_frequencies`` / ``document_frequencies`` dicts
    (adaptive_crawler.py:576-587) as one aggregation."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens_expr(F.lower(F.col(text_col)))).alias("term")
    )
    return toks.groupBy("term").agg(
        F.count("*").alias("tf"), F.countDistinct("doc_id").alias("df")
    )


def coverage(docs: DataFrame, query: str, text_col: str = "text", id_col: str = "doc_id") -> float:
    """Coverage ∈ [0,1] (adaptive_crawler.py:330-369): per query term
    (df/N)·(1 + 0.5·log(1+tf)/log(1+max_tf)), averaged, √-curved."""
    n_docs = docs.count()
    if n_docs == 0:
        return 0.0
    terms = [t for t in query.lower().split() if t]
    if not terms:
        return 0.0
    stats = term_stats(docs, text_col, id_col)
    max_tf = stats.agg(F.max("tf")).first()[0] or 1
    rows = {r["term"]: r for r in stats.filter(F.col("term").isin(terms)).collect()}
    scores = []
    for t in terms:
        r = rows.get(t)
        if r is None or r["df"] == 0:
            scores.append(0.0)
            continue
        doc_cov = r["df"] / n_docs
        freq_signal = math.log(1 + r["tf"]) / math.log(1 + max_tf) if max_tf > 0 else 0.0
        scores.append(doc_cov * (1 + 0.5 * freq_signal))
    return min(1.0, math.sqrt(sum(scores) / len(scores)))


def consistency_pairs(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Pairwise Jaccard of document term sets (adaptive_crawler.py:371-396)
    — (id_a, id_b, jaccard)."""
    sets = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(tokens_expr(F.lower(F.col(text_col)))).alias("terms"),
    ).filter(F.size("terms") > 0)
    a = sets.select(F.col("doc_id").alias("id_a"), F.col("terms").alias("ta"))
    b = sets.select(F.col("doc_id").alias("id_b"), F.col("terms").alias("tb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("ta", "tb")).cast("double")
    union = F.size(F.array_union("ta", "tb")).cast("double")
    return pairs.select("id_a", "id_b", (inter / union).alias("jaccard"))


def consistency(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> float:
    if docs.count() < 2:
        return 1.0
    row = consistency_pairs(docs, text_col, id_col).agg(F.avg("jaccard")).first()
    return float(row[0]) if row[0] is not None else 0.0


def saturation(new_terms_history: list[int]) -> float:
    """1 − recent/initial new-term rate (adaptive_crawler.py:398-413)."""
    if len(new_terms_history) < 2:
        return 0.0
    recent = new_terms_history[-1] if new_terms_history[-1] > 0 else 1
    initial = new_terms_history[0] if new_terms_history[0] > 0 else 1
    return max(0.0, min(1.0 - recent / initial, 1.0))


def confidence(
    docs: DataFrame, query: str, new_terms_history: list[int],
    text_col: str = "text", id_col: str = "doc_id",
) -> dict:
    """0.4·coverage + 0.3·consistency + 0.3·saturation
    (adaptive_crawler.py:311-328)."""
    cov = coverage(docs, query, text_col, id_col)
    con = consistency(docs, text_col, id_col)
    sat = saturation(new_terms_history)
    return {
        "coverage": cov,
        "consistency": con,
        "saturation": sat,
        "confidence": 0.4 * cov + 0.3 * con + 0.3 * sat,
    }


def new_terms_per_wave(docs_with_wave: DataFrame, text_col: str = "text") -> DataFrame:
    """(wave_id, new_terms): terms first seen in each wave — the
    ``new_terms_history`` list as an aggregation (min-wave per term)."""
    toks = docs_with_wave.select(
        "wave_id", F.explode(F.array_distinct(tokens_expr(F.lower(F.col(text_col))))).alias("term")
    )
    first = toks.groupBy("term").agg(F.min("wave_id").alias("wave_id"))
    return first.groupBy("wave_id").agg(F.count("*").alias("new_terms"))
