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

from pyspark.sql import Column


def adaptive_tokens_expr(text: Column) -> Column:
    """The adaptive crawler's tokenizer (adaptive_crawler.py `_tokenize`):
    punctuation → spaces, whitespace split, tokens shorter than 3 chars
    dropped.  (Java/RE2 ``\\w`` is ASCII where Python's is unicode — the
    engines agree on ASCII corpora.)"""
    cleaned = F.regexp_replace(text, r"[^\w\s]", " ")
    return F.filter(F.split(cleaned, r"\s+"), lambda t: F.length(t) > 2)


def term_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(term, tf, df): corpus-wide term frequency + document frequency —
    the reference's ``term_frequencies`` / ``document_frequencies`` dicts
    (adaptive_crawler.py:576-587) as one aggregation."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(adaptive_tokens_expr(F.lower(F.col(text_col)))).alias("term"),
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
    terms = _tokenize_py(query.lower())
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
        F.array_distinct(adaptive_tokens_expr(F.lower(F.col(text_col)))).alias("terms"),
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
    (adaptive_crawler.py:311-328); an EMPTY knowledge base is 0.0
    outright (:313-315) — consistency's <2-docs fallback of 1.0 must not
    leak a 0.3 floor into a zero-document crawl."""
    if docs.limit(1).count() == 0:
        return {"coverage": 0.0, "consistency": 0.0, "saturation": 0.0, "confidence": 0.0}
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
        "wave_id", F.explode(F.array_distinct(adaptive_tokens_expr(F.lower(F.col(text_col))))).alias("term")
    )
    first = toks.groupBy("term").agg(F.min("wave_id").alias("wave_id"))
    return first.groupBy("wave_id").agg(F.count("*").alias("new_terms"))


def _tokenize_py(text: str) -> list[str]:
    """Python twin of :func:`adaptive_tokens_expr` (reference `_tokenize`)."""
    import re as _re

    return [t for t in _re.sub(r"[^\w\s]", " ", text).split() if len(t) > 2]


def rank_links(
    links: DataFrame,
    query: str,
    kb_vocab: DataFrame | None,
    relevance_weight: float = 0.5,
    novelty_weight: float = 0.3,
    authority_weight: float = 0.2,
) -> DataFrame:
    """Expected-information-gain link ranking (adaptive_crawler.py:415-498):

    * relevance = |query ∩ link terms| / |query terms| (term overlap of the
      link's text+title; the contextual-BM25 shortcut applies when a
      ``contextual_score`` column is present and > 0);
    * novelty = fraction of link terms absent from the knowledge-base
      vocabulary (no KB → 1.0; no terms → 0.5);
    * authority = 1.0 (the reference's placeholder, :427-428);
    * score = 0.5·rel + 0.3·nov + 0.2·auth (AdaptiveConfig defaults).

    ``links``: (href, text, title[, contextual_score]); ``kb_vocab``: one
    ``term`` column.  Returns links + (relevance, novelty, score), sorted
    desc.
    """
    q_terms = sorted(set(_tokenize_py(query.lower())))
    link_text = F.lower(F.concat_ws(" ", F.coalesce(F.col("text"), F.lit("")),
                                    F.coalesce(F.col("title"), F.lit(""))))
    lterms = F.array_distinct(adaptive_tokens_expr(link_text))
    with_terms = links.withColumn("_lt", lterms)

    if q_terms:
        q_arr = F.array(*[F.lit(t) for t in q_terms])
        overlap = F.size(F.array_intersect(F.col("_lt"), q_arr)).cast("double")
        relevance = F.when(F.size("_lt") == 0, 0.0).otherwise(overlap / len(q_terms))
    else:
        relevance = F.lit(0.0)
    if "contextual_score" in links.columns:
        # the contextual shortcut applies only when the link HAS text —
        # an empty link_text returns 0.0 before the shortcut (:455-461)
        relevance = F.when(F.trim(link_text) == "", F.lit(0.0)).when(
            F.col("contextual_score").isNotNull() & (F.col("contextual_score") > 0),
            F.col("contextual_score"),
        ).otherwise(relevance)

    if kb_vocab is None:
        novelty = F.lit(1.0)
        scored = with_terms.withColumn("relevance", relevance).withColumn("novelty", novelty)
    else:
        exploded = with_terms.select("href", F.explode_outer("_lt").alias("term"))
        known = kb_vocab.select(F.col("term"), F.lit(True).alias("_known"))
        frac = (
            exploded.join(F.broadcast(known), "term", "left")
            .groupBy("href")
            .agg(
                (
                    F.sum(F.when(F.col("_known").isNull() & F.col("term").isNotNull(), 1).otherwise(0))
                    / F.greatest(F.count(F.col("term")), F.lit(1))
                ).alias("_new_frac"),
                F.count(F.col("term")).alias("_n_terms"),
            )
        )
        scored = (
            with_terms.withColumn("relevance", relevance)
            .join(frac, "href", "left")
            .withColumn(
                "novelty",
                F.when(F.coalesce(F.col("_n_terms"), F.lit(0)) == 0, 0.5).otherwise(
                    F.col("_new_frac")
                ),
            )
            .drop("_new_frac", "_n_terms")
        )
    score = (
        F.lit(relevance_weight) * F.col("relevance")
        + F.lit(novelty_weight) * F.col("novelty")
        + F.lit(authority_weight) * F.lit(1.0)
    )
    # the reference sorts with Python's STABLE sort (:438) — ties keep
    # discovery/insertion order, which a ``_order`` column carries; href
    # is only the fallback when the caller provides no order
    tie = F.col("_order").asc() if "_order" in links.columns else F.col("href").asc()
    return scored.withColumn("score", score).drop("_lt").orderBy(
        F.col("score").desc(), tie
    )


def digest(
    spark,
    fetch_text_fn,
    start_url: str,
    query: str,
    confidence_threshold: float = 0.7,
    max_pages: int = 20,
    top_k_links: int = 3,
):
    """The adaptive/progressive crawl loop (adaptive_crawler.py:1308-1453):
    crawl → update term stats → compute confidence → rank pending links →
    crawl top-K → repeat until confidence ≥ threshold or max_pages.

    ``fetch_text_fn(urls: list[str]) -> DataFrame(url, text, links)`` where
    ``links`` is array<struct<href,text,title>> — one Spark job per batch
    (the vectorized analog of `_crawl_with_preview`).

    Returns dict: kb (DataFrame url,text), metrics history, crawled order.
    """
    crawled: list[str] = []
    kb_rows: list[tuple] = []
    pending: dict[str, tuple] = {}
    history: list[dict] = []
    new_terms_history: list[int] = []
    vocab: set[str] = set()

    def crawl_batch(urls):
        batch = fetch_text_fn(urls)
        for r in batch.collect():
            crawled.append(r["url"])
            kb_rows.append((r["url"], r["text"]))
            new = set(_tokenize_py((r["text"] or "").lower())) - vocab
            vocab.update(new)
            new_terms_history.append(len(new))
            for ln in r["links"] or []:
                if ln["href"] not in pending and ln["href"] not in set(crawled):
                    pending[ln["href"]] = (ln["href"], ln["text"], ln["title"])

    crawl_batch([start_url])
    m = None
    while len(crawled) < max_pages:
        kb = spark.createDataFrame(kb_rows, "url string, text string")
        m = confidence(kb, query, new_terms_history, id_col="url")
        history.append(dict(m, pages=len(crawled)))
        if m["confidence"] >= confidence_threshold:
            break
        cand = [
            (i, *v)
            for i, (k, v) in enumerate(pending.items())
            if k not in set(crawled)
        ]
        if not cand:
            break
        links_df = spark.createDataFrame(
            cand, "_order int, href string, text string, title string"
        )
        vocab_df = spark.createDataFrame([(t,) for t in sorted(vocab)], "term string")
        ranked = rank_links(links_df, query, vocab_df)
        batch = [r["href"] for r in ranked.limit(top_k_links).collect()]
        if not batch:
            break
        for h in batch:
            pending.pop(h, None)
        crawl_batch(batch)
        m = None  # metrics for this batch not yet computed

    kb = spark.createDataFrame(kb_rows, "url string, text string")
    if m is None:
        # only the max_pages / post-crawl exits still owe a final metrics
        # row; threshold/no-candidate breaks already appended theirs
        m = confidence(kb, query, new_terms_history, id_col="url")
        history.append(dict(m, pages=len(crawled)))
    return {"kb": kb, "crawl_order": crawled, "metrics": history, "confidence": m}


# ---------------------------------------------------------------------------
# Knowledge-base JSONL export/import (adaptive_crawler.py:1761-1875)
# ---------------------------------------------------------------------------

KB_SCHEMA = (
    "url string, timestamp string, success boolean, query string, "
    "content string, crawl_order int, confidence_at_crawl double, "
    "total_documents int"
)


def export_knowledge_base(kb: DataFrame, path: str) -> None:
    """JSONL export — one document per line (df.write.json), the
    reference's export_knowledge_base record shape flattened: url /
    timestamp / success / query / content plus the crawl_metadata
    fields (crawl_order, confidence_at_crawl, total_documents)."""
    kb.write.mode("overwrite").json(path)


def import_knowledge_base(spark, path: str) -> DataFrame:
    """Round-trip import with the export schema (absent fields null —
    mirrors the reference's MockCrawlResult defaults)."""
    return spark.read.schema(KB_SCHEMA).json(path)
