"""Link-preview head-enrichment pipeline (link_preview.py:71-380).

The composed operator the reference runs per page after scraping:

1. **candidate filter** (`_filter_links`, :112-175): internal links
   first, then external (each in page extraction order), fnmatch
   include/exclude patterns, then the ``max_links`` cut — which the
   reference applies BEFORE the order-preserving dedup (:157-170, pinned
   quirk) — and finally first-occurrence dedup.
2. **head extraction** → here a join against the ``heads`` dimension
   table (url → head fields + status), the wave-level analog of the
   seeder's concurrent head fetches.
3. **relevance scoring** — when a query is configured the seeder scores
   each head doc with collective BM25, min-max normalized over the
   candidate corpus (async_url_seeder.py:1681-1725) → the link's
   ``contextual_score``.
4. **merge** (`_merge_head_data`, :276-380): head_data + status joined
   back onto the edge rows; ``total_score`` =
   calculate_total_score(intrinsic, contextual) (utils.py:3495-3540 —
   functions/links.total_score_expr).

Scale shape: two window functions per page group (rank + dedup), one
broadcast-or-shuffle join on href, one BM25 aggregation over the
candidate head corpus — no Python in the plan except nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.links import total_score_expr
from .bm25 import bm25_scores
from .config_match import _fn_rx


def _match_any(url: Column, patterns: list[str]) -> Column:
    cols = [url.rlike(_fn_rx(p)) for p in patterns]
    out = cols[0]
    for c in cols[1:]:
        out = out | c
    return out


def filter_candidate_links(
    edges: DataFrame,
    include_internal: bool = True,
    include_external: bool = False,
    include_patterns: list[str] | None = None,
    exclude_patterns: list[str] | None = None,
    max_links: int = 0,
    src_col: str = "src_url",
    href_col: str = "href",
    seq_col: str = "link_seq",
) -> DataFrame:
    """_filter_links as window algebra; adds ``preview_rank`` (1-based
    position in the reference's filtered list per page)."""
    e = edges
    keep = F.lit(False)
    if include_internal:
        keep = keep | ~F.col("is_external")
    if include_external:
        keep = keep | F.col("is_external")
    e = e.filter(keep)
    if include_patterns:
        e = e.filter(_match_any(F.col(href_col), include_patterns))
    if exclude_patterns:
        e = e.filter(~_match_any(F.col(href_col), exclude_patterns))
    # reference order: all internal (extraction order), then all external
    order = [F.col("is_external").asc(), F.col(seq_col).asc()]
    if max_links > 0:
        w = Window.partitionBy(src_col).orderBy(*order)
        e = e.withColumn("_pos", F.row_number().over(w)).filter(
            F.col("_pos") <= max_links
        )
    else:
        e = e.withColumn("_pos", F.lit(None).cast("int"))
    # order-preserving dedup AFTER the cut (pinned quirk)
    w_first = Window.partitionBy(src_col, href_col).orderBy(*order)
    e = e.withColumn("_occ", F.row_number().over(w_first)).filter(F.col("_occ") == 1)
    w_rank = Window.partitionBy(src_col).orderBy(*order)
    return e.withColumn("preview_rank", F.row_number().over(w_rank)).drop("_pos", "_occ")


def link_preview(
    edges: DataFrame,
    heads: DataFrame,
    query_terms: list[str] | None = None,
    include_internal: bool = True,
    include_external: bool = False,
    include_patterns: list[str] | None = None,
    exclude_patterns: list[str] | None = None,
    max_links: int = 0,
    score_links: bool = True,
    intrinsic_col: str | None = "intrinsic_score",
    src_col: str = "src_url",
    href_col: str = "href",
) -> DataFrame:
    """Full composition → candidate edges enriched with head fields,
    ``head_extraction_status`` ('valid' when the head table has the url,
    'not_processed' otherwise — unmatched links keep no head data, as
    the reference leaves them unchanged), ``contextual_score`` (BM25 over
    head_text, min-max normalized across the candidate corpus) and
    ``total_score``.

    ``heads`` columns: url, head_text (+ any passthrough fields kept as
    head_* columns)."""
    cand = filter_candidate_links(
        edges,
        include_internal=include_internal,
        include_external=include_external,
        include_patterns=include_patterns,
        exclude_patterns=exclude_patterns,
        max_links=max_links,
        src_col=src_col,
        href_col=href_col,
    )
    h = heads.select(
        F.col("url").alias(href_col),
        *[F.col(c).alias(f"head_{c}") for c in heads.columns if c not in ("url",)],
    )
    # equi-join on href: Spark broadcasts automatically when heads is
    # small; at crawl scale this is a shuffle join on the canonical url —
    # do NOT force a broadcast (the head table grows with the crawl)
    joined = cand.join(h, href_col, "left")
    joined = joined.withColumn(
        "head_extraction_status",
        F.when(F.col("head_head_text").isNotNull(), F.lit("valid")).otherwise(
            F.lit("not_processed")
        ),
    ).withColumnRenamed("head_head_text", "head_text")

    query_provided = bool(query_terms)
    if query_provided:
        corpus = (
            joined.filter(F.col("head_text").isNotNull())
            .select(F.col(href_col).alias("doc_id"), F.col("head_text").alias("text"))
            .dropDuplicates(["doc_id"])
        )
        scores = bm25_scores(corpus, query_terms, normalize=True).select(
            F.col("doc_id").alias(href_col), F.col("bm25").alias("contextual_score")
        )
        joined = joined.join(scores, href_col, "left")
    else:
        joined = joined.withColumn("contextual_score", F.lit(None).cast("double"))

    intrinsic = F.col(intrinsic_col) if intrinsic_col else None
    total = total_score_expr(
        intrinsic,
        F.col("contextual_score"),
        score_links_enabled=score_links,
        query_provided=query_provided,
    )
    # reference quirk: a link whose head was never processed keeps the
    # ORIGINAL link untouched (no total recompute) — model as total only
    # for processed rows when scoring is on
    return joined.withColumn(
        "total_score",
        F.when(F.col("head_extraction_status") == "valid", total).otherwise(
            F.lit(None).cast("double")
        ),
    )
