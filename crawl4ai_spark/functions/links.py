"""Link quality scoring as Catalyst column expressions.

Re-expresses the reference's parser-agnostic link scoring
(`calculate_link_intrinsic_score`, /root/reference/crawl4ai/utils.py:3380-3492,
and `calculate_total_score`, utils.py:3495-3540) as pure column
expressions over an edges table (src_url, href, text, title, rel,
class, page terms).  Entirely JVM-side — this runs per discovered link
in the frontier-expansion hot path, where the reference calls a Python
function per `<a>` tag.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_NAV_CLASSES = ["nav", "menu", "primary", "main", "important"]
_BAD_CLASSES = ["ad", "sponsor", "track", "promo", "banner"]
_GOOD_RELS = ["canonical", "next", "prev", "chapter"]
_BAD_RELS = ["nofollow", "sponsored", "ugc"]
_GOOD_PATHS = ["/docs/", "/api/", "/guide/", "/tutorial/", "/reference/", "/manual/"]
_MEDIUM_PATHS = ["/blog/", "/article/", "/post/", "/news/"]
_BAD_PATHS = ["/admin/", "/login/", "/cart/", "/checkout/", "/track/", "/click/"]
_GENERIC_TEXTS = ["click here", "read more", "more info", "link", "here"]
_DOC_KEYWORDS = ["api", "reference", "guide", "tutorial", "example"]

_PUNCT = '.,!?;:"()[]{}'
# regex character class of the punctuation stripped from term words
_PUNCT_RE = r'[.,!?;:"()\[\]{}]'


def _contains_any(col: Column, needles: list[str]) -> Column:
    out = F.lit(False)
    for n in needles:
        out = out | col.contains(n)
    return out


def link_words_expr(text: Column) -> Column:
    """Distinct lowercased words of the link text with surrounding
    punctuation stripped, length > 2 (utils.py:3470-3473 semantics)."""
    words = F.filter(F.split(F.trim(text), r"\s+"), lambda w: w != "")
    stripped = F.transform(
        words,
        lambda w: F.lower(
            F.regexp_replace(F.regexp_replace(w, f"^{_PUNCT_RE}+", ""), f"{_PUNCT_RE}+$", "")
        ),
    )
    return F.array_distinct(F.filter(stripped, lambda w: F.length(w) > 2))


def intrinsic_score_expr(
    text: Column,
    url: Column,
    title: Column,
    cls: Column,
    rel: Column,
    page_terms: Column | None = None,
    is_docs_site: Column | None = None,
) -> Column:
    """0-10 link quality score (utils.py:3380-3492, exact rule set)."""
    score = F.lit(0.0)

    # 1. attribute quality
    score = score + F.when(F.length(F.trim(F.coalesce(title, F.lit("")))) > 3, 1.0).otherwise(0.0)
    class_str = F.lower(F.coalesce(cls, F.lit("")))
    score = score + F.when(_contains_any(class_str, _NAV_CLASSES), 1.5).otherwise(0.0)
    score = score - F.when(_contains_any(class_str, _BAD_CLASSES), 1.0).otherwise(0.0)
    rel_str = F.lower(F.coalesce(rel, F.lit("")))
    score = score + F.when(_contains_any(rel_str, _GOOD_RELS), 1.0).otherwise(0.0)
    score = score - F.when(_contains_any(rel_str, _BAD_RELS), 0.5).otherwise(0.0)

    # 2. URL structure
    url_lower = F.lower(url)
    score = score + (
        F.when(_contains_any(url_lower, _GOOD_PATHS), 2.0)
        .when(_contains_any(url_lower, _MEDIUM_PATHS), 1.0)
        .otherwise(0.0)
    )
    score = score - F.when(_contains_any(url_lower, _BAD_PATHS), 1.5).otherwise(0.0)
    url_depth = F.length(url) - F.length(F.regexp_replace(url, "/", "")) - 2
    score = score + F.when(url_depth <= 2, 1.0).otherwise(0.0)
    score = score - F.when(url_depth > 5, 0.5).otherwise(0.0)
    score = score + F.when(url.startswith("https://"), 0.5).otherwise(0.0)

    # 3. text quality
    text_clean = F.trim(F.coalesce(text, F.lit("")))
    score = score + F.when(F.length(text_clean) > 3, 1.0).otherwise(0.0)
    word_count = F.size(F.filter(F.split(text_clean, r"\s+"), lambda w: w != ""))
    score = score + F.when(word_count >= 2, 0.5).otherwise(0.0)
    score = score + F.when(word_count >= 4, 0.5).otherwise(0.0)
    score = score - F.when(F.lower(text_clean).isin(_GENERIC_TEXTS), 1.0).otherwise(0.0)

    # 4. contextual relevance vs pre-computed page terms
    if page_terms is not None:
        words = link_words_expr(text_clean)
        overlap = F.size(F.array_intersect(words, page_terms)).cast("double")
        ratio = overlap / F.least(F.size(words), F.lit(10)).cast("double")
        score = score + F.when(
            (F.size(words) > 0) & (overlap > 0), ratio * 2.0
        ).otherwise(0.0)

    # 5. docs-site keyword bonus
    if is_docs_site is not None:
        score = score + F.when(
            is_docs_site & _contains_any(F.lower(F.coalesce(text, F.lit(""))), _DOC_KEYWORDS),
            1.0,
        ).otherwise(0.0)

    return F.greatest(F.lit(0.0), F.least(score, F.lit(10.0)))


def total_score_expr(
    intrinsic: Column | None,
    contextual: Column | None,
    score_links_enabled: bool = True,
    query_provided: bool = False,
) -> Column:
    """Combined 0-10 score with the reference's fallbacks
    (utils.py:3495-3540): disabled → 5.0; intrinsic-only → clamp;
    both → 0.7*intrinsic + 0.3*min(contextual*10, 10)."""
    if not score_links_enabled:
        return F.lit(5.0)
    i = F.coalesce(intrinsic, F.lit(0.0)) if intrinsic is not None else F.lit(0.0)
    if not query_provided or contextual is None:
        return F.greatest(F.lit(0.0), F.least(i, F.lit(10.0)))
    c = F.coalesce(contextual, F.lit(0.0))
    total = i * 0.7 + F.least(c * 10.0, F.lit(10.0)) * 0.3
    return F.greatest(F.lit(0.0), F.least(total, F.lit(10.0)))
