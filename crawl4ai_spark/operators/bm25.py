"""BM25 ranking in pure DataFrame algebra.

The reference scores seeded URLs with ``rank_bm25.BM25Okapi`` over
head-text documents (async_url_seeder.py:1681-1725, doc build
:1444-1495) and a simplified BM25 inside ContentRelevanceFilter
(deep_crawling/filters.py:566-585).  Here the classic pipeline is
re-expressed as explode → groupBy aggregates so it runs JVM-side and
scales: tf per (doc, term), df per term, dl per doc, avgdl as a
broadcast scalar — one shuffle for the tf aggregation, one tiny
broadcast for the term stats.

The IDF uses the non-negative Lucene variant
``ln(1 + (N - df + 0.5)/(df + 0.5))`` so no epsilon floor is needed
(rank_bm25 floors negative IDFs instead; for the |q| ≪ N regimes both
formulations rank identically).

Scale notes: ``df``/``avgdl`` are O(|vocab ∩ query|) and O(1) — they
broadcast.  The only big shuffle is the per-doc tf groupBy, which is
map-side combined by Spark.  Min-max normalization (the seeder's
:1706-1721) adds one scalar agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens_expr


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = False,
) -> DataFrame:
    """(doc_id, bm25) for every input doc (0.0 when no term matches).

    With ``normalize=True`` adds the seeder's min-max normalization to
    [0,1] (all-equal scores → 0.5, async_url_seeder.py:1717-1721).
    """
    # rank_bm25.get_scores sums a contribution PER QUERY-TOKEN OCCURRENCE
    # — a repeated query token weights its term that many times; count
    # multiplicities instead of dedup'ing
    qcount: dict[str, int] = {}
    for t in query_terms:
        t = t.lower()
        qcount[t] = qcount.get(t, 0) + 1
    terms = sorted(qcount)
    # null text ⇒ empty doc (dl=0), as the reference treats missing head
    # text — without the coalesce, null toks poison dl and avgdl
    text = F.coalesce(F.col(text_col), F.lit(""))
    base = docs.select(F.col(id_col).alias("doc_id"), tokens_expr(F.lower(text)).alias("toks"))
    # pin once: dl feeds the count/avg scalar, the tf explode AND the
    # final left join — without the pin the whole upstream plan (unions,
    # filters, dedups at seed_urls scale) re-executes per action
    dl = base.select("doc_id", F.size("toks").cast("double").alias("dl")).localCheckpoint(
        eager=False
    )

    srow = dl.agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl")).first()
    n_docs = int(srow["n"])
    if n_docs == 0:
        return dl.select("doc_id", F.lit(0.0).alias("bm25"))
    avgdl = float(srow["avgdl"] or 1.0)

    toks = base.select("doc_id", F.explode("toks").alias("term")).filter(F.col("term").isin(terms))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").cast("double").alias("tf"))

    df_stats = tf.groupBy("term").agg(F.countDistinct("doc_id").cast("double").alias("df"))
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    qweight = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(t) for t in terms]),
            F.array(*[F.lit(float(qcount[t])) for t in terms]),
        ),
        F.col("term"),
    )
    df_stats = df_stats.withColumn("idf", idf * qweight)

    scored = (
        tf.join(F.broadcast(df_stats), "term")
        .join(dl, "doc_id")
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(float(avgdl)))),
        )
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("bm25"))
    )
    out = dl.select("doc_id").join(scored, "doc_id", "left").withColumn(
        "bm25", F.coalesce(F.col("bm25"), F.lit(0.0))
    )
    if normalize:
        stats = out.agg(F.min("bm25").alias("mn"), F.max("bm25").alias("mx")).first()
        if stats["mn"] is None:
            return out  # empty input: nothing to normalize
        mn, mx = float(stats["mn"]), float(stats["mx"])
        if mx - mn < 1e-12:
            out = out.withColumn("bm25", F.lit(0.5))
        else:
            out = out.withColumn("bm25", (F.col("bm25") - F.lit(mn)) / F.lit(mx - mn))
    return out


def bm25_sql(
    query_terms: list[str], k1: float = 1.2, b: float = 0.75,
    relation: str = "documents",
) -> str:
    """DuckDB twin of :func:`bm25_scores` over ``relation`` (a table,
    view, or outer CTE providing doc_id/text; default the ``documents``
    view) — used by the driver oracle (same formula, same token
    definition)."""
    qcount: dict[str, int] = {}
    for t in query_terms:
        t = t.lower()
        qcount[t] = qcount.get(t, 0) + 1
    terms = sorted(qcount)
    if not terms:
        return f"""
SELECT doc_id, 0.0 AS bm25 FROM {relation}
"""

    def lit(t: str) -> str:
        return "'" + t.replace("'", "''") + "'"

    terms_sql = ", ".join(lit(t) for t in terms)
    qw_cases = " ".join(f"WHEN {lit(t)} THEN {float(c)}" for t, c in qcount.items())
    qw = f"(CASE term {qw_cases} ELSE 1.0 END)"
    return f"""
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(coalesce(text, ''))), '\\s+'), x -> x <> '') AS toks
  FROM {relation}
), dl AS (
  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM base
), stats AS (
  SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM base)
  WHERE term IN ({terms_sql})
  GROUP BY doc_id, term
), dfs AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id,
         SUM(ln(1.0 + (stats.n_docs - dfs.df + 0.5) / (dfs.df + 0.5)) * {qw}
             * (tf.tf * ({k1} + 1.0))
             / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / stats.avgdl))) AS bm25
  FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT dl.doc_id, COALESCE(scored.bm25, 0.0) AS bm25
FROM dl LEFT JOIN scored USING (doc_id)
"""
