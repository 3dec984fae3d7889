"""Seeds-ingest job: the AsyncUrlSeeder pipeline re-expressed in
DataFrame algebra (SURVEY §7.2 milestone 10).

Reference flow (async_url_seeder.py:364-549): stream candidate URLs from
sitemap/Common-Crawl sources → glob pattern match (`_match`, :178-183) →
nonsense-URL reject (`_is_nonsense_url`, :1585-1679) → cross-source
dedup (:451-454) → optional BM25 relevance scoring over head text
(:1681-1725) → relevance sort + ``max_urls`` cut (:483-502, 536-549).

Spark mapping: unionByName of source DataFrames → boolean column
filters (all JVM-side string ops) → dropDuplicates → BM25 via the
bm25 module's aggregates → orderBy(desc).limit(max_urls).  The
bounded-queue producer/consumer concurrency of the reference is
Spark's own parallelism.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_UTILITY_FILES = [
    "ads.txt", "humans.txt", "security.txt", ".well-known/security.txt",
    "crossdomain.xml", "browserconfig.xml", "manifest.json",
    "apple-app-site-association", ".well-known/apple-app-site-association",
    "favicon.ico", "apple-touch-icon.png", "android-chrome-192x192.png",
]

_NON_CONTENT_PATHS = [
    "/wp-admin", "/wp-includes", "/wp-content/uploads",
    "/admin", "/login", "/signin", "/signup", "/register",
    "/checkout", "/cart", "/account", "/profile",
    "/search", "/404", "/error",
    "/.git", "/.svn", "/.hg",
    "/cgi-bin", "/scripts", "/includes",
]

_PRINT_PATTERNS = ["?print=", "&print=", "/print/", "_print."]

_SHORT_PATH_WHITELIST = ["/", "/en", "/de", "/fr", "/es", "/it"]


def path_expr(url: Column) -> Column:
    """Lowercased urlparse().path for absolute http(s) URLs."""
    return F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1))


def _ends_with_any(col: Column, suffixes: list[str]) -> Column:
    out = F.lit(False)
    for s in suffixes:
        out = out | col.endswith(s)
    return out


def _contains_any(col: Column, needles: list[str]) -> Column:
    out = F.lit(False)
    for n in needles:
        out = out | col.contains(n)
    return out


def is_nonsense_url_expr(url: Column) -> Column:
    """`_is_nonsense_url` (async_url_seeder.py:1585-1679) as a boolean
    column expression — active rules only (the reference's commented-out
    rule groups 4-8 are likewise omitted)."""
    path = path_expr(url)
    url_lower = F.lower(url)

    robots_sitemap = _ends_with_any(path, ["/robots.txt", "/sitemap.xml", "/sitemap_index.xml"])
    sitemap_var = path.contains("/sitemap") & _ends_with_any(path, [".xml", ".xml.gz", ".txt"])
    utility = _ends_with_any(path, [f"/{f}" for f in _UTILITY_FILES])
    # any path part starting with '.' ⇒ the path contains "/."
    hidden = path.contains("/.")
    non_content = _contains_any(path, _NON_CONTENT_PATHS)
    printish = _contains_any(url_lower, _PRINT_PATTERNS)
    stripped = F.regexp_replace(F.regexp_replace(path, "^/+", ""), "/+$", "")
    short = (F.length(stripped) < 3) & ~path.isin(_SHORT_PATH_WHITELIST)

    return robots_sitemap | sitemap_var | utility | hidden | non_content | printish | short


def _glob_to_regex(pattern: str) -> str:
    """Simple glob → anchored regex, identical semantics in Java regex and
    RE2 (no fnmatch dialect quirks): '*' → '.*', '?' → '.', rest escaped."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^(?s)" + "".join(out) + "$"


def glob_match_expr(url: Column, pattern: str) -> Column:
    """`_match` (async_url_seeder.py:178-183): fnmatch against the full
    URL, the scheme-stripped form, and the www-stripped form."""
    rx = _glob_to_regex(pattern)
    canon = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    no_www = F.regexp_replace(canon, r"^www\.", "")
    return url.rlike(rx) | canon.rlike(rx) | no_www.rlike(rx)


def seed_urls(
    sources: list[DataFrame],
    pattern: str = "*",
    filter_nonsense: bool = True,
    query_terms: list[str] | None = None,
    max_urls: int = -1,
    url_col: str = "url",
    head_text_col: str = "head_text",
) -> DataFrame:
    """The full seeds-ingest job.  Each source needs ``url`` (and
    ``head_text`` when scoring).  Returns (url[, relevance_score])
    sorted by relevance when scoring, cut to ``max_urls`` (≤0 = all)."""
    seeds = sources[0]
    for s in sources[1:]:
        seeds = seeds.unionByName(s)  # source="sitemap+cc" union (:407-438)
    if pattern != "*":
        seeds = seeds.filter(glob_match_expr(F.col(url_col), pattern))
    if filter_nonsense:
        seeds = seeds.filter(~is_nonsense_url_expr(F.col(url_col)))
    seeds = seeds.dropDuplicates([url_col])  # cross-source dedup (:451-454)

    if query_terms:
        from .bm25 import bm25_scores

        scored = bm25_scores(
            seeds, query_terms, text_col=head_text_col, id_col=url_col, normalize=True
        ).withColumnRenamed("doc_id", url_col).withColumnRenamed("bm25", "relevance_score")
        seeds = seeds.join(scored, url_col).orderBy(
            F.col("relevance_score").desc(), F.col(url_col).asc()
        )
    if max_urls and max_urls > 0:
        seeds = seeds.limit(max_urls)
    return seeds


# ---------------------------------------------------------------------------
# URL relevance fallback scorer (async_url_seeder.py:1497-1583)
# ---------------------------------------------------------------------------


def url_relevance_score(query: str, url: str) -> float:
    """Exact transcription of _calculate_url_relevance_score — the
    scoring used whenever BM25 head text is unavailable in seeding:
    exact/substring part matches (1.0/0.9), per-token best coverage
    (0.7/0.6·coverage), 3-gram Jaccard (0.5·j), then a 1/(i+1)-weighted
    average of the scores sorted descending, capped at 1.0."""
    from urllib.parse import urlparse

    query_lower = query.lower()
    parsed = urlparse(url)
    domain = parsed.netloc.replace("www.", "")
    path = parsed.path.strip("/")
    domain_parts = domain.split(".")
    path_parts = [p for p in path.split("/") if p]
    param_parts: list[str] = []
    if parsed.query:
        for param in parsed.query.split("&"):
            if "=" in param:
                key, value = param.split("=", 1)
                param_parts.extend([key, value])
    all_parts = domain_parts + path_parts + param_parts

    scores: list[float] = []
    query_tokens = query_lower.split()
    for part in all_parts:
        part_lower = part.lower()
        if query_lower in part_lower:
            scores.append(1.0)
        elif part_lower in query_lower:
            scores.append(0.9)
    for token in query_tokens:
        token_scores = []
        for part in all_parts:
            part_lower = part.lower()
            if token in part_lower:
                token_scores.append(0.7 * (len(token) / len(part_lower)))
            elif part_lower in token:
                token_scores.append(0.6 * (len(part_lower) / len(token)))
        if token_scores:
            scores.append(max(token_scores))

    def get_ngrams(text: str, n: int = 3) -> set:
        return set(text[i : i + n] for i in range(len(text) - n + 1))

    url_text = " ".join(all_parts).lower()
    if len(query_lower) >= 3 and len(url_text) >= 3:
        query_ngrams = get_ngrams(query_lower)
        url_ngrams = get_ngrams(url_text)
        if query_ngrams and url_ngrams:
            inter = len(query_ngrams & url_ngrams)
            union = len(query_ngrams | url_ngrams)
            scores.append(0.5 * (inter / union if union > 0 else 0))

    if not scores:
        return 0.0
    scores.sort(reverse=True)
    weighted = 0.0
    total_weight = 0.0
    for i, score in enumerate(scores):
        weight = 1 / (i + 1)
        weighted += score * weight
        total_weight += weight
    final = weighted / total_weight if total_weight > 0 else 0
    return min(final, 1.0)


def url_relevance_udf(query: str):
    """Arrow-batched column form of the fallback scorer."""
    import pandas as pd
    from pyspark.sql import types as T

    def score(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: url_relevance_score(query, u))

    # annotate explicitly: deferred annotations ('pd.Series' strings)
    # don't resolve inside a closure for pandas_udf inference
    score.__annotations__ = {"urls": pd.Series, "return": pd.Series}
    return F.pandas_udf(score, T.DoubleType())


def seed_pipeline(
    spark,
    robots: DataFrame,
    sitemap_store: DataFrame,
    pattern: str = "*",
    query: str | None = None,
    head_texts: DataFrame | None = None,
    extra_sources: list[DataFrame] | None = None,
    max_urls: int = -1,
    max_sitemap_rounds: int = 5,
) -> DataFrame:
    """The complete AsyncUrlSeeder.urls() flow end-to-end
    (async_url_seeder.py:364-549): sitemap DISCOVERY from the robots
    dimension table (conventional locations + declared ``Sitemap:``
    lines) → sitemap-index EXPANSION (iterative, gz, relative locs) →
    optional extra sources (e.g. a Common-Crawl url table) unioned in →
    glob pattern + nonsense filters → cross-source dedup → relevance
    scoring (collective BM25 over ``head_texts`` when provided, else the
    URL-relevance fallback scorer when a query is given) → sort +
    ``max_urls`` cut.

    Returns (url[, relevance_score]).
    """
    from .sitemap import expand_sitemaps, select_host_sitemaps

    # first-SUCCESS chain per host (reference :896-970): /sitemap.xml,
    # else /sitemap_index.xml, else ALL robots-declared Sitemap: lines
    cands = select_host_sitemaps(robots, sitemap_store).select("sitemap_url")
    expanded = expand_sitemaps(
        spark, cands, sitemap_store, max_rounds=max_sitemap_rounds
    ).select("url")
    sources = [expanded] + [s.select("url") for s in (extra_sources or [])]

    if query and head_texts is not None:
        with_heads = sources[0]
        for s in sources[1:]:
            with_heads = with_heads.unionByName(s)
        with_heads = with_heads.join(
            head_texts.select("url", "head_text"), "url", "left"
        ).withColumn("head_text", F.coalesce(F.col("head_text"), F.lit("")))
        return seed_urls(
            [with_heads], pattern=pattern, query_terms=query.lower().split(),
            max_urls=max_urls,
        )
    out = seed_urls(sources, pattern=pattern, max_urls=-1)
    if query:
        # BM25 unavailable (no head text) → URL-relevance fallback
        # (async_url_seeder.py:1497-1583), same sort + cut discipline
        out = out.withColumn(
            "relevance_score", url_relevance_udf(query)(F.col("url"))
        ).orderBy(F.col("relevance_score").desc(), F.col("url").asc())
    if max_urls and max_urls > 0:
        out = out.limit(max_urls)
    return out
