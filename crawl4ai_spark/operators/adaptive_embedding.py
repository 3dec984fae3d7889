"""EmbeddingStrategy adaptive crawl — semantic-space coverage variant.

Grafts the reference's second adaptive strategy (adaptive_crawler.py:
617-1269, EmbeddingStrategy) next to the statistical one
(operators/adaptive.py).  The algebra is model-free: everything operates
on embedding vectors, so the embedding PROVIDER is an input — the
reference calls an embedding API + an LLM for query expansion
(adaptive_crawler.py:646-654, 700-737), neither of which exists in this
container, so query variations are an explicit argument and a
deterministic feature-hashing embedder (public algorithm) stands in for
the model in tests/fixtures.  Everything downstream of the vectors is
the reference's math, transcribed exactly:

* **query space** (:700-781) — [query] + variations, 80/20 train/val
  split with ≥ 2 validation queries.  Divergence pinned: the reference
  shuffles with an UNSEEDED random.shuffle before splitting; we keep the
  given order so runs are reproducible (documented, not hidden).
* **coverage gaps** (:820-848) — per train-query min cosine distance to
  the knowledge base; empty KB ⇒ gap 1.0.
* **link selection** (:850-965) — per candidate link: scaled improvement
  (2×) summed over gaps outside ``coverage_radius`` that the link moves
  closer, averaged over gaps needing help, times (1 − overlap penalty)
  where penalty = 2 × (max KB sim − ``overlap_threshold``)⁺; optional
  0.8/0.2 blend with a contextual score.
* **confidence** (:967-994) — mean (or τ-hit-rate) of best cosine per
  train query.
* **validation** (:1098-1132) — mean(1 − min distance) over held-out
  queries, embedded once.
* **stopping** (:1134-1183) — hard floor ``min_confidence`` ⇒
  irrelevant; max_pages / no pending; convergence when the mean absolute
  confidence delta drops below ``min_relative_improvement × confidence``,
  accepted only if validation ≥ ``validation_min_score``.
* **KB dedup** (:1212-1263) — a new batch is compared against the
  EXISTING KB only (batch-mates are not cross-checked — the reference
  appends after the loop; pinned in tests), kept when max sim < 0.95.
* **quality confidence** (:1185-1210) — validated runs map learning
  score 0.4-0.7 → 0.7-0.95; unvalidated × 0.8.

Spark shape: the per-wave kernels (gaps, best-similarity, link scoring,
batch dedup) are DataFrame operators — queries/gaps are broadcast-sized
by construction, the KB/link sides stream, and every order-sensitive
float reduction is a ``sort_array → aggregate`` fold so results are
bit-stable under any partitioning (the pure-Python oracle replays the
identical fold order).  The digest loop itself is driver-side like the
reference's, one Spark job per wave.
"""

from __future__ import annotations

import zlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import cosine_expr as _raw_cosine_expr

EMBED_DIM = 12


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine with a zero-norm guard: 0.0 instead of NaN (0.0/0.0).
    Without it a single all-zero embedding — hash_embed of whitespace-
    only text — poisons every F.max (NaN sorts above all doubles in
    Spark), silently rejecting all later KB batches and NaN-ing the
    confidence.  The oracle's _emb_cos mirrors the same guard."""
    return F.nanvl(_raw_cosine_expr(a, b), F.lit(0.0))


def hash_embed(text: str, dim: int = EMBED_DIM) -> list[float]:
    """Deterministic feature-hashing embedder (the model stand-in):
    signed token counts hashed into ``dim`` buckets — the public
    hashing-trick, not a port of any model."""
    vec = [0.0] * dim
    for tok in (text or "").lower().split():
        h = zlib.crc32(tok.encode())
        vec[h % dim] += 1.0 if (h >> 16) & 1 else -1.0
    return vec


def split_query_space(
    query: str, variations: list[str]
) -> tuple[list[str], list[str]]:
    """Train/validation split (:770-777): original query always trains;
    at least 2 (or 20% of) variations are held out.  Order-preserving
    (pinned divergence from the reference's unseeded shuffle)."""
    n_val = max(2, int(len(variations) * 0.2)) if variations else 0
    val = variations[len(variations) - n_val :]
    train = [query] + variations[: len(variations) - n_val]
    return train, val


def _stable_fold_sum(pairs_col: Column) -> Column:
    """Bit-stable double sum: fold over an array already sorted by key."""
    return F.aggregate(pairs_col, F.lit(0.0), lambda acc, x: acc + x["v"])


def best_similarity(
    kb: DataFrame, queries: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Per-query best cosine similarity against the KB → (query_id,
    best_sim).  Queries broadcast (small by contract); KB streams."""
    q = F.broadcast(
        queries.select(F.col("query_id"), F.col(vec_col).alias("_q"))
    )
    joined = kb.select(F.col(vec_col).alias("_d")).crossJoin(q)
    sim = cosine_expr(F.col("_q"), F.col("_d"))
    return joined.groupBy("query_id").agg(F.max(sim).alias("best_sim"))


def coverage_gaps(
    kb: DataFrame | None, queries: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """(query_id, embedding, gap): gap = 1 − best cosine sim; empty/None
    KB ⇒ 1.0 for every query (:824-828)."""
    base = queries.select("query_id", F.col(vec_col).alias("embedding"))
    if kb is None:
        return base.withColumn("gap", F.lit(1.0))
    best = best_similarity(kb, queries, vec_col)
    return (
        base.join(best, "query_id", "left")
        .withColumn("gap", F.lit(1.0) - F.coalesce(F.col("best_sim"), F.lit(0.0)))
        .drop("best_sim")
    )


def select_links_for_expansion(
    links: DataFrame,
    gaps: DataFrame,
    kb: DataFrame | None,
    coverage_radius: float = 0.2,
    overlap_threshold: float = 0.85,
    vec_col: str = "embedding",
    gap_counts: tuple[int, int] | None = None,
) -> DataFrame:
    """Score candidate links by gap-filling efficiency (:850-965).

    ``links``: (href, embedding[, contextual_score][, _order]);
    ``gaps``: coverage_gaps output.  Returns links + score, sorted desc
    (stable by _order when present — the reference's sorted() is stable).
    ``gap_counts`` = (n_gaps, n_gaps_above_radius) when the caller already
    knows them (the digest loop does) — skips two count jobs per wave.
    An empty (non-None) ``kb`` degrades correctly: the overlap left-join
    yields NULL max-sim → zero penalty.
    """
    helped = gaps.filter(F.col("gap") > coverage_radius).select(
        "query_id", F.col("embedding").alias("_g"), F.col("gap").alias("_gd")
    )
    if gap_counts is not None:
        n_gaps, gnh = gap_counts
    else:
        n_gaps = gaps.count()
        gnh = helped.count()

    link_cols = [c for c in links.columns if c != vec_col]
    if n_gaps == 0:
        scored = links.withColumn("score", F.lit(0.0))
    else:
        if gnh == 0:
            reduction = links.select("href").withColumn("_gr", F.lit(0.0))
        else:
            cand = links.select("href", F.col(vec_col).alias("_l")).crossJoin(
                F.broadcast(helped)
            )
            new_d = F.lit(1.0) - cosine_expr(F.col("_l"), F.col("_g"))
            imp = F.when(new_d < F.col("_gd"), (F.col("_gd") - new_d) * 2.0).otherwise(0.0)
            # order-stable sum: fold improvements sorted by query_id
            reduction = (
                cand.select("href", F.struct(F.col("query_id").alias("k"), imp.alias("v")).alias("_s"))
                .groupBy("href")
                .agg(_stable_fold_sum(F.sort_array(F.collect_list("_s"))).alias("_ti"))
                .withColumn("_gr", F.col("_ti") / F.lit(float(gnh)))
                .drop("_ti")
            )
        if kb is None:
            with_pen = reduction.withColumn("_pen", F.lit(0.0))
        else:
            # KB is bounded by max_pages (the reference holds it in RAM,
            # :1240) → broadcast; the LINK side is the scale dimension
            overlap = (
                links.select("href", F.col(vec_col).alias("_l"))
                .crossJoin(F.broadcast(kb.select(F.col(vec_col).alias("_d"))))
                .groupBy("href")
                .agg(F.max(cosine_expr(F.col("_l"), F.col("_d"))).alias("_ms"))
            )
            with_pen = reduction.join(overlap, "href", "left").withColumn(
                "_pen",
                F.when(
                    F.col("_ms") > overlap_threshold,
                    (F.col("_ms") - overlap_threshold) * 2.0,
                ).otherwise(0.0),
            ).drop("_ms")
        score = F.col("_gr") * (F.lit(1.0) - F.col("_pen"))
        scored = links.join(with_pen, "href", "left").withColumn(
            "score", F.coalesce(score, F.lit(0.0))
        ).drop("_gr", "_pen")
        # contextual blend only on the gaps-present branch (:957-960 is
        # inside the else; with no gaps the score stays 0.0)
        if "contextual_score" in links.columns:
            scored = scored.withColumn(
                "score",
                F.when(
                    F.col("contextual_score").isNotNull()
                    & (F.col("contextual_score") != 0.0),
                    F.col("score") * 0.8 + F.col("contextual_score") * 0.2,
                ).otherwise(F.col("score")),
            )
    tie = F.col("_order").asc() if "_order" in links.columns else F.col("href").asc()
    return scored.orderBy(F.col("score").desc(), tie)


def kb_dedup_batch(
    kb: DataFrame | None, batch: DataFrame, threshold: float = 0.95, vec_col: str = "embedding"
) -> DataFrame:
    """Rows of ``batch`` whose max cosine sim against the EXISTING KB is
    below ``threshold`` (:1240-1263).  Batch-mates are deliberately NOT
    compared against each other — the reference appends to the KB only
    after the whole batch is checked.  An empty (non-None) ``kb``
    degrades correctly: NULL max-sim keeps every row."""
    if kb is None:
        return batch
    sims = (
        batch.select("url", F.col(vec_col).alias("_b"))
        .crossJoin(F.broadcast(kb.select(F.col(vec_col).alias("_d"))))
        .groupBy("url")
        .agg(F.max(cosine_expr(F.col("_b"), F.col("_d"))).alias("_ms"))
    )
    return (
        batch.join(sims, "url", "left")
        .filter(F.coalesce(F.col("_ms"), F.lit(-2.0)) < threshold)
        .drop("_ms")
    )


def quality_confidence(
    learning_score: float,
    validation_passed: bool,
    validation_score: float,
    validation_min: float = 0.3,
    quality_min: float = 0.7,
    quality_max: float = 0.95,
    scale_factor: float = 0.833,
) -> float:
    """Display-confidence mapping (:1185-1210)."""
    if validation_passed and validation_score > validation_min:
        if learning_score < 0.4:
            return quality_min
        if learning_score > 0.7:
            return quality_max
        return quality_min + (learning_score - 0.4) * scale_factor
    return learning_score * 0.8


def embedding_digest(
    spark,
    fetch_text_fn,
    start_url: str,
    query: str,
    query_variations: list[str],
    embed_fn=hash_embed,
    max_depth: int = 5,
    max_pages: int = 20,
    top_k_links: int = 3,
    min_gain_threshold: float = 0.1,
    coverage_radius: float = 0.2,
    overlap_threshold: float = 0.85,
    min_confidence: float = 0.1,
    min_relative_improvement: float = 0.1,
    validation_min_score: float = 0.3,
    kb_sim_threshold: float = 0.95,
    coverage_tau: float | None = None,
) -> dict:
    """The embedding digest loop (adaptive_crawler.py:1308-1453 driving
    EmbeddingStrategy).  ``fetch_text_fn(urls) -> DataFrame(url, text,
    links array<struct<href,text,title>>)`` exactly like
    :func:`adaptive.digest`; one Spark job per wave for fetch + each
    vector kernel.  Returns fetch order, KB, confidence history, and
    final quality confidence."""
    train_q, val_q = split_query_space(query, query_variations)
    # per-wave driver tables are tiny by contract (queries ~n_variations,
    # KB ≤ max_pages): one partition each keeps every cross join at one
    # task instead of defaultParallelism² cartesian splits
    queries_df = spark.createDataFrame(
        [(i, q, embed_fn(q)) for i, q in enumerate(train_q)],
        "query_id int, qtext string, embedding array<double>",
    ).coalesce(1).cache()
    val_df = (
        spark.createDataFrame(
            [(i, q, embed_fn(q)) for i, q in enumerate(val_q)],
            "query_id int, qtext string, embedding array<double>",
        ).coalesce(1).cache()
        if val_q
        else None
    )

    crawled: list[str] = []          # fetch order (crawled_urls as a set)
    kb_rows: list[tuple] = []        # (url, embedding) — deduped KB
    pending: dict[str, tuple] = {}   # href → (text, title, order)
    history: list[float] = []        # confidence_history (:1152)
    metrics: dict = {}
    validation_passed = False
    order_counter = [0]

    def kb_df() -> DataFrame | None:
        if not kb_rows:
            return None
        return spark.createDataFrame(
            kb_rows, "url string, embedding array<double>"
        ).coalesce(1)

    crawled_set: set[str] = set()

    def crawl_batch(urls: list[str]) -> None:
        batch = fetch_text_fn(urls)
        fetched = {r["url"]: r for r in batch.collect()}
        # preserve request order (the reference crawls sequentially)
        embedded, links = [], []
        for u in urls:
            r = fetched.get(u)
            if r is None:
                continue
            crawled.append(u)
            crawled_set.add(u)
            content = (r["text"] or "")[:5000]  # :1222 text cap
            if content:
                embedded.append((u, embed_fn(content)))
            for ln in r["links"] or []:
                if ln["href"] not in crawled_set and ln["href"] not in pending:
                    pending[ln["href"]] = (ln["text"], ln["title"], order_counter[0])
                    order_counter[0] += 1
        if not embedded:
            return
        new_df = spark.createDataFrame(
            embedded, "url string, embedding array<double>"
        ).coalesce(1)
        kept = kb_dedup_batch(kb_df(), new_df, threshold=kb_sim_threshold)
        kept_urls = {r["url"] for r in kept.select("url").collect()}
        for u, emb in embedded:  # append in fetch order (driver-deterministic)
            if u in kept_urls:
                kb_rows.append((u, emb))

    train_emb = [embed_fn(q) for q in train_q]

    def wave_best() -> list[float]:
        """One Spark job: best cosine per train query vs the current KB
        (0.0 per query when the KB is empty).  Feeds BOTH the confidence
        and the gap table for the wave — the kernels' second evaluation
        is driver-side arithmetic on these collected doubles, in the
        same IEEE order the oracle replays."""
        kb = kb_df()
        if kb is None:
            return [0.0] * len(train_emb)
        rows = {r["query_id"]: r["best_sim"] for r in best_similarity(kb, queries_df).collect()}
        return [rows.get(i, 0.0) for i in range(len(train_emb))]

    def conf_from_best(best: list[float]) -> float:
        if not kb_rows:
            return 0.0
        if coverage_tau is not None:
            return sum(1.0 for b in best if b >= coverage_tau) / len(best)
        acc = 0.0
        for b in best:  # driver-side sequential mean: bit-stable
            acc += b
        return acc / len(best)

    def confidence_now() -> float:
        return conf_from_best(wave_best())

    def validation_now() -> float:
        kb = kb_df()
        if kb is None or val_df is None:
            return 0.0
        rows = {r["query_id"]: r["best_sim"] for r in best_similarity(kb, val_df).collect()}
        if not rows:
            return 0.0
        acc = 0.0
        for i in sorted(rows):
            # score = 1 − min_distance = 1 − (1 − best_sim) = best_sim (:1125)
            acc += rows[i]
        return acc / len(rows)

    crawl_batch([start_url])
    depth = 0
    while depth < max_depth:
        best = wave_best()
        conf = conf_from_best(best)
        metrics["confidence"] = conf
        # ---- should_stop (:1134-1183)
        if conf < min_confidence and crawled:
            metrics["stopped_reason"] = "below_minimum_relevance_threshold"
            break
        if len(crawled) >= max_pages or not pending:
            break
        history.append(conf)
        if len(history) >= 2:
            diffs = list(zip(history[:-1], history[1:]))
            avg_improvement = sum(abs(b - a) for a, b in diffs) / len(diffs)
            metrics["avg_improvement"] = avg_improvement
            if avg_improvement < min_relative_improvement * conf:
                val_score = validation_now()
                metrics["validation_confidence"] = val_score
                if val_score > validation_min_score:
                    metrics["stopped_reason"] = "converged_validated"
                    validation_passed = True
                    break
        # ---- rank_links (:1067-1096)
        uncrawled = [
            (href, t, ti, o)
            for href, (t, ti, o) in pending.items()
            if href not in crawled_set
        ]
        if not uncrawled:
            break
        # textless links are never embedded, hence never scored (:877-879)
        link_rows = []
        for href, t, ti, o in uncrawled:
            link_text = " ".join(filter(None, [t, ti]))
            if link_text.strip():
                link_rows.append((href, o, embed_fn(link_text)))
        if not link_rows:
            break
        links_df = spark.createDataFrame(
            link_rows, "href string, _order int, embedding array<double>"
        ).coalesce(1)
        # gap table from the wave's collected best-sims: gap = 1 − best
        # (the identical double op coverage_gaps would run JVM-side)
        gap_rows = [
            (qi, train_emb[qi], 1.0 - best[qi]) if kb_rows else (qi, train_emb[qi], 1.0)
            for qi in range(len(train_emb))
        ]
        gaps = spark.createDataFrame(
            gap_rows, "query_id int, embedding array<double>, gap double"
        ).coalesce(1)
        gnh = sum(1 for _, _, g in gap_rows if g > coverage_radius)
        ranked = select_links_for_expansion(
            links_df, gaps, kb_df(),
            coverage_radius=coverage_radius, overlap_threshold=overlap_threshold,
            gap_counts=(len(gap_rows), gnh),
        )
        top = ranked.select("href", "score").limit(top_k_links).collect()
        if not top:
            break
        if top[0]["score"] < min_gain_threshold:
            break
        to_crawl = [r["href"] for r in top if r["href"] not in crawled_set]
        if not to_crawl:
            break
        for h in to_crawl:
            pending.pop(h, None)
        crawl_batch(to_crawl)
        depth += 1

    learning = confidence_now()
    metrics["learning_score"] = learning
    final_conf = quality_confidence(
        learning, validation_passed, metrics.get("validation_confidence", 0.0),
        validation_min=validation_min_score,
    )
    metrics["confidence"] = final_conf
    queries_df.unpersist()
    if val_df is not None:
        val_df.unpersist()
    return {
        "crawl_order": crawled,
        "kb_urls": [u for u, _ in kb_rows],
        "confidence_history": history,
        "metrics": metrics,
        "confidence": final_conf,
        "depth_reached": depth,
    }
