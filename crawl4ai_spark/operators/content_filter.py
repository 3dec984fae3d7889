"""Content filters: PruningContentFilter + chunk-level BM25ContentFilter.

Transcribed from the reference's content_filter_strategy.py (BM25
:381-531, Pruning :533-778, shared base :33-380) onto the stdlib DOM —
the reference runs these per page on BeautifulSoup; here the same
algorithms run per row inside Arrow-batched pandas UDFs, and the
chunk-level BM25 is ALSO exposed as long-form DataFrame rows
(:func:`page_chunks_bm25`) so the scoring is oracle-checkable and
aggregable at corpus scale.

Pinned divergence: the reference stems tokens with snowballstemmer by
default (use_stemming=True).  No stemmer library exists in this
container, so stemming is off here; requesting it raises.
"""

from __future__ import annotations

import math
import re
from collections import deque
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.dom import DomNode, ensure_body, parse_dom

EXCLUDED_TAGS = {
    "nav", "footer", "header", "aside", "script", "style", "form",
    "iframe", "noscript",
}
HEADER_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}
NEGATIVE_PATTERNS = re.compile(
    r"nav|footer|header|sidebar|ads|comment|promo|advert|social|share", re.I
)

# content_filter_strategy.py:425-438 — BM25 priority tag weights
PRIORITY_TAGS = {
    "h1": 5.0, "h2": 4.0, "h3": 3.0, "title": 4.0, "strong": 2.0,
    "b": 1.5, "em": 1.5, "blockquote": 2.0, "code": 2.0, "pre": 1.5,
    "th": 1.5,
}

# extract_text_chunks inline set (content_filter_strategy.py:170-199)
INLINE_TAGS = {
    "a", "abbr", "acronym", "b", "bdo", "big", "br", "button", "cite",
    "code", "dfn", "em", "i", "img", "input", "kbd", "label", "map",
    "object", "q", "samp", "script", "select", "small", "span", "strong",
    "sub", "sup", "textarea", "time", "tt", "var",
}
CHUNK_HEADER_TAGS = HEADER_TAGS | {"header"}

# utils.py:2618-2633 noise set
_NOISE = {"ccp", "up", "↑", "▲", "⬆️", "a", "an", "at", "by", "in", "of", "on", "to", "the"}

# utils.py:2635-2815 STOP_WORDS (full transcription)
_STOP_WORDS = set("""
a an and are as at be by for from has he in is it its of on that the to was
were will with i you she we they me him her us them my your his our their
mine yours hers ours theirs myself yourself himself herself itself ourselves
themselves am been being have had having do does did doing about above across
after against along among around before behind below beneath beside between
beyond down during except inside into near off out outside over past through
toward under underneath until up upon within but or nor yet so although
because since unless this these those what which who whom whose when where
why how all any both each few more most other some such can cannot can't
could couldn't may might must mustn't shall should shouldn't won't would
wouldn't not n't no none
""".split())


def clean_tokens(tokens: list[str]) -> list[str]:
    """utils.py:2601-2837 exact: len>2, not noise/stop, no arrow prefixes."""
    return [
        t
        for t in tokens
        if len(t) > 2
        and t not in _NOISE
        and t not in _STOP_WORDS
        and not t.startswith("↑")
        and not t.startswith("▲")
        and not t.startswith("⬆")
    ]


# ---------------------------------------------------------------------------
# shared base helpers (RelevantContentFilter, :33-380)
# ---------------------------------------------------------------------------


def extract_page_query(root: DomNode, body: DomNode, user_query: str | None) -> str:
    """:124-155 — title + h1 + meta keywords/description, else the first
    paragraph longer than 150 chars."""
    if user_query:
        return user_query
    query_parts: list[str] = []
    title_el = root.find("title")
    if title_el is not None:
        # BS4 parity: soup.title.string is None when <title> has element
        # children (the reference's try/except then skips it, :134-138)
        t = title_el.string
        if t:
            query_parts.append(t)
    h1 = root.find("h1")
    if h1 is not None:
        query_parts.append(h1.get_text())
    temp = ""
    for meta_name in ["keywords", "description"]:
        # BS4 attrs={"name": ...} matches the attribute value EXACTLY
        # (case-sensitive), :146 — no .lower() here
        for m in root.find_all("meta"):
            if m.get("name") == meta_name and m.get("content"):
                query_parts.append(m.get("content"))
                temp += m.get("content")
                break
    if not temp:
        for p in body.find_all("p"):
            if len(p.get_text()) > 150:
                query_parts.append(p.get_text()[:150])
                break
    return " ".join(filter(None, query_parts))


def extract_text_chunks(
    body: DomNode, min_word_threshold: int | None = None
) -> list[tuple[int, str, str, DomNode]]:
    """:157-255 — iterative DFS over the body; text accumulates until a
    non-inline block closes, flushing one chunk (index, text, header|
    content, closing element)."""
    chunks: list[tuple[int, str, str, DomNode]] = []
    current_text: list[str] = []
    chunk_index = 0

    def should_break_chunk(tag: DomNode) -> bool:
        return tag.tag not in INLINE_TAGS and not (tag.tag == "p" and len(current_text) == 0)

    stack: deque = deque([(body, False)])
    while stack:
        element, visited = stack.pop()
        if visited:
            if current_text and should_break_chunk(element):
                text = " ".join("".join(current_text).split())
                if text:
                    tag_type = "header" if element.tag in CHUNK_HEADER_TAGS else "content"
                    chunks.append((chunk_index, text, tag_type, element))
                    chunk_index += 1
                current_text = []
            continue
        if isinstance(element, str):
            if element.strip():
                current_text.append(element.strip())
            continue
        children = list(element.children)
        if not children:
            continue
        stack.append((element, True))
        for child in reversed(children):
            stack.append((child, False))
    if current_text:
        text = " ".join("".join(current_text).split())
        if text:
            chunks.append((chunk_index, text, "content", body))
    if min_word_threshold:
        chunks = [c for c in chunks if len(c[1].split()) >= min_word_threshold]
    return chunks


def clean_element(tag: DomNode) -> str:
    """:339-380 — serialize dropping script/style/aside/form/iframe/
    noscript and style/event/layout attributes."""
    unwanted_tags = {"script", "style", "aside", "form", "iframe", "noscript"}
    unwanted_attrs = {"style", "onclick", "onmouseover", "align", "bgcolor", "class", "id"}
    builder: list[str] = []

    def render(elem):
        if isinstance(elem, str):
            builder.append(elem.strip())
            return
        if elem.tag in unwanted_tags:
            return
        builder.append(f"<{elem.tag}")
        for k, v in elem.attrs.items():
            if k not in unwanted_attrs:
                builder.append(f' {k}="{v}"')
        builder.append(">")
        for child in elem.children:
            render(child)
        builder.append(f"</{elem.tag}>")

    render(tag)
    return "".join(builder)


# ---------------------------------------------------------------------------
# BM25ContentFilter (:381-531)
# ---------------------------------------------------------------------------

_K1, _B, _EPS = 1.5, 0.75, 0.25  # rank_bm25 BM25Okapi defaults


def bm25_okapi_scores(corpus: list[list[str]], query: list[str]) -> list[float]:
    """rank_bm25.BM25Okapi formula (public algorithm): idf = ln(N-n+0.5)
    - ln(n+0.5), negatives floored to epsilon·avg_idf."""
    n_docs = len(corpus)
    if n_docs == 0:
        return []
    dls = [len(d) for d in corpus]
    avgdl = sum(dls) / n_docs
    freq: dict[str, int] = {}
    for doc in corpus:
        for t in set(doc):
            freq[t] = freq.get(t, 0) + 1
    idf: dict[str, float] = {}
    idf_sum = 0.0
    neg: list[str] = []
    for t, n in freq.items():
        v = math.log(n_docs - n + 0.5) - math.log(n + 0.5)
        idf[t] = v
        idf_sum += v
        if v < 0:
            neg.append(t)
    avg_idf = idf_sum / len(idf) if idf else 0.0
    for t in neg:
        idf[t] = _EPS * avg_idf
    scores = []
    for doc, dl in zip(corpus, dls):
        tf: dict[str, int] = {}
        for t in doc:
            tf[t] = tf.get(t, 0) + 1
        s = 0.0
        for q in query:
            f = tf.get(q, 0)
            if f == 0 or q not in idf:
                continue
            s += idf[q] * (f * (_K1 + 1)) / (f + _K1 * (1 - _B + _B * dl / (avgdl or 1.0)))
        scores.append(s)
    return scores


def bm25_chunks(
    html: str,
    user_query: str | None = None,
    min_word_threshold: int | None = None,
    use_stemming: bool = False,
) -> list[tuple[int, str, str, float, float]]:
    """Per-chunk BM25 with tag weights → [(index, text, tag, raw_score,
    adjusted_score)] in document order (the scoring core of
    BM25ContentFilter.filter_content, :440-530)."""
    if use_stemming:
        raise NotImplementedError(
            "snowballstemmer is not available in this environment; the "
            "reference's use_stemming=True path cannot run here"
        )
    if not html or not isinstance(html, str):
        return []
    root = parse_dom(html)
    body = ensure_body(root)
    query = extract_page_query(root, body, user_query)
    if not query:
        return []
    candidates = extract_text_chunks(body, min_word_threshold)
    if not candidates:
        return []
    corpus = [clean_tokens(chunk.lower().split()) for _, chunk, _, _ in candidates]
    tokenized_query = clean_tokens(query.lower().split())
    scores = bm25_okapi_scores(corpus, tokenized_query)
    out = []
    for score, (index, chunk, _tag_type, tag) in zip(scores, candidates):
        weight = PRIORITY_TAGS.get(tag.tag, 1.0)
        out.append((index, chunk, tag.tag, score, score * weight))
    return out


def bm25_filter_content(
    html: str,
    user_query: str | None = None,
    bm25_threshold: float = 1.0,
    min_word_threshold: int | None = None,
) -> list[str]:
    """filter_content: chunks ≥ threshold, document order, cleaned HTML."""
    if not html or not isinstance(html, str):
        return []
    root = parse_dom(html)
    body = ensure_body(root)
    query = extract_page_query(root, body, user_query)
    if not query:
        return []
    candidates = extract_text_chunks(body, min_word_threshold)
    if not candidates:
        return []
    corpus = [clean_tokens(chunk.lower().split()) for _, chunk, _, _ in candidates]
    tokenized_query = clean_tokens(query.lower().split())
    scores = bm25_okapi_scores(corpus, tokenized_query)
    selected = [
        (index, tag)
        for score, (index, _chunk, _tt, tag) in zip(scores, candidates)
        if score * PRIORITY_TAGS.get(tag.tag, 1.0) >= bm25_threshold
    ]
    selected.sort(key=lambda x: x[0])
    return [clean_element(tag) for _idx, tag in selected]


# ---------------------------------------------------------------------------
# PruningContentFilter (:533-778)
# ---------------------------------------------------------------------------

TAG_IMPORTANCE = {
    "article": 1.5, "main": 1.4, "section": 1.3, "p": 1.2, "h1": 1.4,
    "h2": 1.3, "h3": 1.2, "div": 0.7, "span": 0.6,
}
TAG_WEIGHTS = {
    "div": 0.5, "p": 1.0, "article": 1.5, "section": 1.0, "span": 0.3,
    "li": 0.5, "ul": 0.5, "ol": 0.5, "h1": 1.2, "h2": 1.1, "h3": 1.0,
    "h4": 0.9, "h5": 0.8, "h6": 0.7,
}
METRIC_WEIGHTS = {
    "text_density": 0.4, "link_density": 0.2, "tag_weight": 0.2,
    "class_id_weight": 0.1, "text_length": 0.1,
}


def _class_id_weight(node: DomNode) -> float:
    """:768-778 — −0.5 per negative-pattern class list / id match."""
    score = 0.0
    if "class" in node.attrs:
        if NEGATIVE_PATTERNS.match(node.attrs.get("class") or ""):
            score -= 0.5
    if "id" in node.attrs:
        if NEGATIVE_PATTERNS.match(node.attrs.get("id") or ""):
            score -= 0.5
    return score


def composite_score(node: DomNode, min_word_threshold: int | None = None) -> float:
    """:728-766 — weighted mean of text density, link density, tag
    weight, class/id signal and log text length."""
    text = node.get_text(strip=True)
    text_len = len(text)
    tag_len = len(node.inner_html())
    link_text_len = sum(
        len(s.strip())
        for s in (a.string for a in node.find_all("a", recursive=False))
        if s
    )
    if min_word_threshold:
        word_count = text.count(" ") + 1
        if word_count < min_word_threshold:
            return -1.0
    score, total_weight = 0.0, 0.0
    density = text_len / tag_len if tag_len > 0 else 0
    score += METRIC_WEIGHTS["text_density"] * density
    total_weight += METRIC_WEIGHTS["text_density"]
    density = 1 - (link_text_len / text_len if text_len > 0 else 0)
    score += METRIC_WEIGHTS["link_density"] * density
    total_weight += METRIC_WEIGHTS["link_density"]
    score += METRIC_WEIGHTS["tag_weight"] * TAG_WEIGHTS.get(node.tag, 0.5)
    total_weight += METRIC_WEIGHTS["tag_weight"]
    score += METRIC_WEIGHTS["class_id_weight"] * max(0, _class_id_weight(node))
    total_weight += METRIC_WEIGHTS["class_id_weight"]
    score += METRIC_WEIGHTS["text_length"] * math.log(text_len + 1)
    total_weight += METRIC_WEIGHTS["text_length"]
    return score / total_weight if total_weight > 0 else 0


def _prune_tree(
    node: DomNode, threshold: float, threshold_type: str, min_word_threshold: int | None
) -> None:
    """:677-726 — bottom-up prune driven by the composite score."""
    if node is None:
        return
    score = composite_score(node, min_word_threshold)
    if threshold_type == "fixed":
        should_remove = score < threshold
    else:  # dynamic
        text_len = len(node.get_text(strip=True))
        tag_len = len(node.inner_html())
        link_text_len = sum(
            len(s.strip())
            for s in (a.string for a in node.find_all("a", recursive=False))
            if s
        )
        tag_importance = TAG_IMPORTANCE.get(node.tag, 0.7)
        text_ratio = text_len / tag_len if tag_len > 0 else 0
        link_ratio = link_text_len / text_len if text_len > 0 else 1
        t = threshold
        if tag_importance > 1:
            t *= 0.8
        if text_ratio > 0.4:
            t *= 0.9
        if link_ratio > 0.6:
            t *= 1.2
        should_remove = score < t
    if should_remove:
        node.decompose()
    else:
        for child in list(node.element_children()):
            _prune_tree(child, threshold, threshold_type, min_word_threshold)


def _remove_comments_and_unwanted(root: DomNode) -> None:
    # stdlib html.parser drops comments already; remove excluded tags
    for tag in EXCLUDED_TAGS:
        for el in list(root.find_all(tag)):
            el.decompose()


def pruning_filter_content(
    html: str,
    threshold: float = 0.48,
    threshold_type: str = "fixed",
    min_word_threshold: int | None = None,
) -> list[str]:
    """PruningContentFilter.filter_content (:626-664)."""
    if not html or not isinstance(html, str):
        return []
    root = parse_dom(html)
    body = ensure_body(root)
    _remove_comments_and_unwanted(root)
    _prune_tree(body, threshold, threshold_type, min_word_threshold)
    if body.parent is None:  # body itself pruned
        return []
    return [
        c.outer_html()
        for c in body.element_children()
        if len(c.get_text(strip=True)) > 0
    ]


# ---------------------------------------------------------------------------
# Spark surfaces
# ---------------------------------------------------------------------------

CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("chunk_idx", T.IntegerType()),
        T.StructField("chunk", T.StringType()),
        T.StructField("tag", T.StringType()),
        T.StructField("bm25", T.DoubleType()),
        T.StructField("adjusted", T.DoubleType()),
    ]
)


def page_chunks_bm25(
    pages: DataFrame,
    user_query: str | None = None,
    url_col: str = "url",
    html_col: str = "html",
    min_word_threshold: int | None = None,
) -> DataFrame:
    """Long-form per-chunk BM25 rows — the oracle-checkable scoring core."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf[url_col], pdf[html_col]):
                for idx, chunk, tag, raw, adj in bm25_chunks(
                    html, user_query=user_query, min_word_threshold=min_word_threshold
                ):
                    rows.append((url, idx, chunk, tag, raw, adj))
            yield pd.DataFrame(rows, columns=[f.name for f in CHUNK_SCHEMA.fields])

    return pages.select(url_col, html_col).mapInPandas(gen, CHUNK_SCHEMA)


PRUNE_SCORE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("node_idx", T.IntegerType()),
        T.StructField("tag", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("removed", T.BooleanType()),
    ]
)


def pruning_node_scores(
    pages: DataFrame,
    threshold: float = 0.48,
    url_col: str = "url",
    html_col: str = "html",
    min_word_threshold: int | None = None,
) -> DataFrame:
    """Composite-score introspection: one row per top-level body element
    with its PruningContentFilter score and the fixed-threshold verdict —
    the auditable core of the prune decision."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf[url_col], pdf[html_col]):
                body = ensure_body(parse_dom(html or ""))
                for i, child in enumerate(body.element_children()):
                    s = composite_score(child, min_word_threshold)
                    rows.append((url, i, child.tag, s, s < threshold))
            yield pd.DataFrame(rows, columns=[f.name for f in PRUNE_SCORE_SCHEMA.fields])

    return pages.select(url_col, html_col).mapInPandas(gen, PRUNE_SCORE_SCHEMA)


FIT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("fit_html", T.StringType()),
        T.StructField("fit_markdown", T.StringType()),
        T.StructField("n_blocks", T.IntegerType()),
    ]
)


def fit_content(
    pages: DataFrame,
    mode: str = "pruning",
    url_col: str = "url",
    html_col: str = "html",
    **kw,
) -> DataFrame:
    """fit_html + fit_markdown per page via the chosen filter."""
    from ..functions.markdown import html_to_markdown

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf[url_col], pdf[html_col]):
                try:
                    if mode == "pruning":
                        blocks = pruning_filter_content(html, **kw)
                    else:
                        blocks = bm25_filter_content(html, **kw)
                    fh = "\n".join("<div>{}</div>".format(s) for s in blocks)
                    fm = html_to_markdown(fh, url)
                except Exception:
                    blocks, fh, fm = [], "", ""
                rows.append((url, fh, fm, len(blocks)))
            yield pd.DataFrame(rows, columns=[f.name for f in FIT_SCHEMA.fields])

    return pages.select(url_col, html_col).mapInPandas(gen, FIT_SCHEMA)
