"""Scrape stage: fetched HTML → links / images / metadata.

Re-expresses the reference's LXMLWebScrapingStrategy
(content_scraping_strategy.py:607-909) and its prefetch short-circuit
(utils.py:2468-2513 quick_extract_links) as Arrow-batched ``mapInPandas``
transforms.  The sandbox has no lxml/bs4, so parsing uses the stdlib
``html.parser`` state machine — slower per byte than lxml but identical
in plumbing; swapping the parser is a one-function change.

Two modes, mirroring the reference's optimization:

* **link-only** (prefetch, the frontier-expansion default) — emits one
  row per <a href>; skips images/markdown entirely (= column pruning made
  explicit, since a UDF is opaque to Catalyst).
* **full** — also emits <img> rows with the reference's image-score
  heuristics (content_scraping_strategy.py:410-467) and page metadata.

Both are stateless per-row transforms: no shuffle, linear scaling.
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.urls import (
    get_base_domain,
    is_external_url,
    normalize_url,
    normalize_url_for_deep_crawl,
)

LINK_SCHEMA = T.StructType(
    [
        T.StructField("src_url", T.StringType()),
        T.StructField("href", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("rel", T.StringType()),
        T.StructField("class", T.StringType()),
        T.StructField("is_external", T.BooleanType()),
        T.StructField("link_seq", T.IntegerType()),
    ]
)

LINK_SCHEMA_CANON = T.StructType(LINK_SCHEMA.fields + [T.StructField("canon", T.StringType())])

IMAGE_REF_SCHEMA = T.StructType(
    [
        T.StructField("src_url", T.StringType()),
        T.StructField("img_src", T.StringType()),
        T.StructField("alt", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("img_class", T.StringType()),
        T.StructField("img_seq", T.IntegerType()),
        T.StructField("score", T.IntegerType()),
    ]
)

META_SCHEMA = T.StructType(
    [
        T.StructField("src_url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("n_links", T.IntegerType()),
        T.StructField("n_images", T.IntegerType()),
    ]
)

_IMG_FORMATS = ("jpg", "jpeg", "png", "webp", "avif", "gif")  # :449 exact (no svg)
_ICON_HINTS = ("button", "icon", "logo")  # :428-436 exact (no 'sprite')


def parse_srcset_expr(s):
    """``parse_srcset`` (content_scraping_strategy.py:42-59) as a pure
    column expression → array<struct<url,width>>.  Pinned quirks: width
    kept only when the 2nd token endswith 'w' (so '2x' densities → NULL),
    ALL trailing 'w's stripped, then truncated at the first '.'."""

    def variant(p):
        toks = F.filter(F.split(p, r"\s+"), lambda t: t != "")
        url = F.element_at(toks, 1)
        second = F.element_at(toks, 2)
        width = F.when(
            (F.size(toks) > 1) & second.endswith("w"),
            F.element_at(F.split(F.regexp_replace(second, "w+$", ""), r"\."), 1),
        ).otherwise(F.lit(None).cast("string"))
        return F.struct(url.alias("url"), width.alias("width"))

    parts = F.filter(
        F.transform(F.split(F.coalesce(s, F.lit("")), ","), lambda p: F.trim(p)),
        lambda p: p != "",
    )
    return F.transform(parts, variant)


_VOIDISH = {"br", "img", "hr", "input", "meta", "link", "area", "base", "col",
            "source", "track", "wbr", "embed", "param"}


class _PageParser(HTMLParser):
    """``links_only`` skips the image/title/meta branches entirely — the
    prefetch/frontier-expansion hot path pays no per-<img> dict cost."""

    def __init__(self, links_only: bool = False):
        super().__init__(convert_charrefs=True)
        self.links: list[dict] = []
        self.images: list[dict] = []
        self.base_href: str | None = None
        self.title = ""
        self.description = ""
        self.links_only = links_only
        self._in_a: dict | None = None
        self._in_title = False
        # (tag, class) ancestor stack for image parent/picture context
        self._stack: list[tuple[str, str]] = []

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "a" and a.get("href"):
            if self._in_a is not None:
                self._flush_a()  # lxml auto-closes a nested <a>; keep both
            self._in_a = {
                "href": a["href"],
                "text": [],
                "title": (a.get("title") or "").strip(),
                "rel": a.get("rel") or "",
                "class": a.get("class") or "",
            }
        elif tag == "img":
            if not self.links_only:
                parent_tag, parent_class = self._stack[-1] if self._stack else ("", "")
                self.images.append(
                    {
                        "src": a.get("src") or "",
                        "data_src": a.get("data-src") or "",
                        "alt": a.get("alt") or "",
                        "style": a.get("style") or "",
                        "width": a.get("width"),
                        "height": a.get("height"),
                        "class": a.get("class") or "",
                        "srcset": a.get("srcset") or "",
                        "data_srcset": a.get("data-srcset") or "",
                        "parent_tag": parent_tag,
                        "parent_class": parent_class,
                        "in_picture": any(t == "picture" for t, _c in self._stack),
                    }
                )
        elif tag == "base" and a.get("href") and self.base_href is None:
            self.base_href = (a["href"] or "").strip() or None
        elif tag == "title":
            if not self.links_only:
                self._in_title = True
        elif tag == "meta" and a.get("name") == "description":
            if not self.links_only:
                self.description = a.get("content") or ""
        if tag not in _VOIDISH:
            self._stack.append((tag, a.get("class") or ""))

    def _flush_a(self):
        # lxml text_content().strip(): ends stripped, internal whitespace kept
        self._in_a["text"] = "".join(self._in_a["text"]).strip()
        self.links.append(self._in_a)
        self._in_a = None

    def handle_endtag(self, tag):
        if tag == "a" and self._in_a is not None:
            self._flush_a()
        elif tag == "title":
            self._in_title = False
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i][0] == tag:
                del self._stack[i:]
                break

    def handle_data(self, data):
        if self._in_a is not None:
            self._in_a["text"].append(data)
        if self._in_title:
            self.title += data

    def close(self):
        super().close()
        if self._in_a is not None:
            self._flush_a()  # unclosed trailing <a> still emits (lxml recovers)


def _to_int(v) -> int | None:
    try:
        return int(str(v).rstrip("px")) if v is not None else None
    except ValueError:
        return None


def parse_page(url: str, html: str, links_only: bool = False) -> _PageParser:
    p = _PageParser(links_only=links_only)
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        pass
    return p


def image_score(img: dict, index: int, total: int) -> int:
    """Reference image heuristic (content_scraping_strategy.py:440-467
    exact): +1 each for isdigit width>150, isdigit height>150, alt
    present, first-half position, a known format substring in ANY of
    src/data-src/srcset/data-srcset ({jpg,jpeg,png,webp,avif,gif} — no
    svg), srcset-or-data-srcset present, and a <picture> ancestor."""
    s = 0
    w = img.get("width")
    if w and str(w).isdigit() and int(w) > 150:
        s += 1
    h = img.get("height")
    if h and str(h).isdigit() and int(h) > 150:
        s += 1
    if img.get("alt"):
        s += 1
    if total and index / total < 0.5:
        s += 1
    for u in (img.get("src"), img.get("data_src"), img.get("srcset"), img.get("data_srcset")):
        if u and any(f in u.lower() for f in _IMG_FORMATS):
            s += 1
            break
    if img.get("srcset") or img.get("data_srcset"):
        s += 1
    if img.get("in_picture"):
        s += 1
    return s


def _is_icon(img: dict) -> bool:
    """process_image's quick rejections (content_scraping_strategy.py:
    421-438 exact): display:none style, button/input PARENT, a
    button|icon|logo hint in any parent class, or in src, or in alt."""
    if "display:none" in (img.get("style") or ""):
        return True
    if (img.get("parent_tag") or "") in ("button", "input"):
        return True
    parent_classes = (img.get("parent_class") or "").split()
    if any(h in cls for cls in parent_classes for h in _ICON_HINTS):
        return True
    src = img.get("src") or ""
    alt = img.get("alt") or ""
    if (src and any(h in src for h in _ICON_HINTS)) or (
        alt and any(h in alt for h in _ICON_HINTS)
    ):
        return True
    return False


def extract_links(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    with_canon: bool = False,
) -> DataFrame:
    """Link-only scrape (prefetch mode): pages → edge rows.

    Hrefs are resolved/normalized against the page URL with the extended
    normalizer (as the reference scraper does at extraction time,
    content_scraping_strategy.py:244-311) and classified
    internal/external; per-page first-occurrence dedup preserved via
    link_seq.

    ``with_canon`` also emits the deep-crawl canonical URL (the seen-set
    identity) from the SAME Python pass.  This matters physically:
    chaining a second Python evaluator (pandas UDF) after this mapInPandas
    in one stage measured 3-5x slower than fusing the work here — two
    Python phases per task serialize through the JVM — so the frontier
    expansion always uses with_canon=True.
    """
    schema = LINK_SCHEMA_CANON if with_canon else LINK_SCHEMA

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf[url_col], pdf[html_col]):
                parser = parse_page(url, html, links_only=True)
                base = parser.base_href or url
                page_domain = get_base_domain(url)
                seen_page: set[str] = set()
                for i, ln in enumerate(parser.links):
                    raw = ln["href"]
                    if raw.startswith(("mailto:", "tel:", "javascript:", "data:")):
                        continue
                    norm = normalize_url(raw, base)
                    if not norm or norm in seen_page:
                        continue  # first occurrence wins per page
                    seen_page.add(norm)
                    row = (
                        url,
                        norm,
                        ln["text"],
                        ln["title"],
                        ln["rel"],
                        ln["class"],
                        is_external_url(norm, page_domain),
                        i,
                    )
                    if with_canon:
                        row = row + (normalize_url_for_deep_crawl(norm, url),)
                    rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return pages.select(url_col, html_col).mapInPandas(gen, schema)


def extract_image_refs(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    score_threshold: int = 2,
) -> DataFrame:
    """Full-scrape image pass: <img> rows with reference scoring; icon /
    logo decoys rejected early, low scores filtered (threshold semantics
    of async_configs.py image_score_threshold)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf[url_col], pdf[html_col]):
                parser = parse_page(url, html)
                total = len(parser.images)
                for i, img in enumerate(parser.images):
                    if _is_icon(img):
                        continue
                    s = image_score(img, i, total)
                    rows.append(
                        (
                            url,
                            img["src"] or img["data_src"],
                            img["alt"],
                            _to_int(img["width"]),
                            _to_int(img["height"]),
                            img["class"],
                            i,
                            s,
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_REF_SCHEMA.fields])

    out = pages.select(url_col, html_col).mapInPandas(gen, IMAGE_REF_SCHEMA)
    return out.filter(F.col("score") > F.lit(score_threshold))


def extract_metadata(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf[url_col], pdf[html_col]):
                p = parse_page(url, html)
                rows.append((url, p.title.strip(), p.description, len(p.links), len(p.images)))
            yield pd.DataFrame(rows, columns=[f.name for f in META_SCHEMA.fields])

    return pages.select(url_col, html_col).mapInPandas(gen, META_SCHEMA)


# ---------------------------------------------------------------------------
# table extraction (table_extraction.py:66-298 semantics)
# ---------------------------------------------------------------------------

TABLE_SCHEMA = T.StructType(
    [
        T.StructField("src_url", T.StringType()),
        T.StructField("table_idx", T.IntegerType()),
        T.StructField("caption", T.StringType()),
        T.StructField("summary", T.StringType()),
        T.StructField("headers", T.ArrayType(T.StringType())),
        T.StructField("rows", T.ArrayType(T.ArrayType(T.StringType()))),
        T.StructField("row_count", T.IntegerType()),
        T.StructField("column_count", T.IntegerType()),
    ]
)


class _Table:
    __slots__ = ("attrs", "rows", "caption", "has_caption", "thead_rows", "th_count",
                 "tag_count", "nested", "has_thead", "has_tbody", "first_row_has_th")

    def __init__(self, attrs):
        self.attrs = dict(attrs)
        self.rows = []        # list of (in_thead, [(tag, colspan_raw, text_parts)])
        self.caption = []     # caption TEXT NODES (reference takes .//caption/text()[0])
        self.has_caption = False  # caption ELEMENT present (scoring signal)
        self.thead_rows = 0
        self.th_count = 0
        self.tag_count = 0
        self.nested = 0
        self.has_thead = False
        self.has_tbody = False
        self.first_row_has_th = False


class _TableParser(HTMLParser):
    """Collect <table> structures with enough fidelity for the reference's
    data-table scoring + extraction (DefaultTableExtraction,
    table_extraction.py:66-298).  Non-nested tables are handled exactly;
    nested tables are tracked only as the −3 score signal."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.tables: list[_Table] = []
        self._stack: list[_Table] = []
        self._in_thead = 0
        self._in_caption = False
        self._cap_cur: list[str] | None = None  # current caption text node
        self._cell = None  # (tag, colspan_raw, parts)
        self._row = None
        # reference's .//tr[1]/th (table_extraction.py:160): the FIRST tr
        # of EACH section (table/thead/tbody) counts — track per-section
        self._section_tr_seen: list[bool] = []
        self._row_is_section_first = False

    def _flush_caption_node(self):
        if self._in_caption and self._cap_cur is not None and self._stack:
            self._stack[-1].caption.append("".join(self._cap_cur))
        self._cap_cur = None

    def handle_starttag(self, tag, attrs):
        self._flush_caption_node()  # a child element splits caption text nodes
        for t in self._stack:
            t.tag_count += 1
        if tag == "table":
            if self._stack:
                self._stack[-1].nested += 1
            t = _Table(attrs)
            self.tables.append(t)
            self._stack.append(t)
            self._section_tr_seen.append(False)
            return
        if not self._stack:
            return
        t = self._stack[-1]
        a = dict(attrs)
        if tag == "thead":
            t.has_thead = True
            self._in_thead += 1
            self._section_tr_seen.append(False)
        elif tag == "tbody":
            t.has_tbody = True
            self._section_tr_seen.append(False)
        elif tag == "caption":
            self._in_caption = True
            t.has_caption = True
        elif tag == "tr":
            self._row = (self._in_thead > 0, [])
            t.rows.append(self._row)
            if self._in_thead:
                t.thead_rows += 1
            self._row_is_section_first = not (
                self._section_tr_seen and self._section_tr_seen[-1]
            )
            if self._section_tr_seen:
                self._section_tr_seen[-1] = True
        elif tag in ("td", "th"):
            if self._row is None:
                self._row = (self._in_thead > 0, [])
                t.rows.append(self._row)
                self._row_is_section_first = len(t.rows) == 1
            # keep the RAW colspan attr: the reference int()s it at extract
            # time and a non-int drops the whole table (except-continue) —
            # _extract_table reproduces that by raising
            self._cell = (tag, a.get("colspan", 1), [])
            self._row[1].append(self._cell)
            if tag == "th":
                t.th_count += 1
                if self._row_is_section_first:
                    t.first_row_has_th = True

    def handle_endtag(self, tag):
        self._flush_caption_node()
        if tag == "table" and self._stack:
            self._stack.pop()
            self._row = None
            self._cell = None
            if self._section_tr_seen:
                self._section_tr_seen.pop()
        elif tag == "thead":
            self._in_thead = max(0, self._in_thead - 1)
            if self._section_tr_seen:
                self._section_tr_seen.pop()
        elif tag == "tbody":
            if self._section_tr_seen:
                self._section_tr_seen.pop()
        elif tag == "caption":
            self._in_caption = False
        elif tag in ("td", "th"):
            self._cell = None
        elif tag == "tr":
            self._row = None

    def handle_data(self, data):
        if self._in_caption and self._stack:
            if self._cap_cur is None:
                self._cap_cur = []
            self._cap_cur.append(data)
        elif self._cell is not None:
            self._cell[2].append(data)


def _score_table(t: _Table) -> float:
    """is_data_table scoring (table_extraction.py:131-210)."""
    score = 0.0
    if t.has_thead:
        score += 2
    if t.has_tbody:
        score += 1
    if t.th_count > 0:
        score += 2
        if t.has_thead or t.first_row_has_th:
            score += 1
    if t.nested > 0:
        score -= 3
    if (t.attrs.get("role") or "").lower() in ("presentation", "none"):
        score -= 3
    if not t.rows:
        return float("-inf")
    col_counts = [len(cells) for _, cells in t.rows]
    avg = sum(col_counts) / len(col_counts)
    variance = sum((c - avg) ** 2 for c in col_counts) / len(col_counts)
    if variance < 1:
        score += 2
    if t.has_caption:
        score += 2
    if t.attrs.get("summary"):
        score += 1
    total_text = sum(
        len("".join(parts).strip()) for _, cells in t.rows for _tg, _cs, parts in cells
    )
    ratio = total_text / (t.tag_count + 1e-5)
    if ratio > 20:
        score += 3
    elif ratio > 10:
        score += 2
    score += 0.5 * sum(1 for a in t.attrs if a and a.startswith("data-"))
    if col_counts and len(t.rows) >= 2 and avg >= 2:
        score += 2
    return score


def _extract_table(t: _Table) -> dict:
    """extract_table_data (table_extraction.py:212-295): colspan-expanded
    headers (thead first row th, else first row th|td), td-only body rows,
    alignment to max columns, default 'Column i' headers.

    Parity quirks pinned: caption = FIRST caption text node only
    (xpath .//caption/text()[0], :229-230); a non-integer colspan raises
    here so the caller drops the whole table, exactly like the
    reference's except-continue (:126-128 around int(colspan) at
    :240,:248,:257)."""
    caption = t.caption[0].strip() if t.caption else ""
    summary = (t.attrs.get("summary") or "").strip()
    headers: list[str] = []
    if t.has_thead and t.thead_rows:
        first_thead = next(cells for in_th, cells in t.rows if in_th)
        for tag, colspan, parts in first_thead:
            if tag == "th":
                headers.extend(["".join(parts).strip()] * int(colspan))
    elif t.rows:
        for tag, colspan, parts in t.rows[0][1]:
            headers.extend(["".join(parts).strip()] * int(colspan))
    rows = []
    for in_thead, cells in t.rows:
        if in_thead:
            continue
        row_data: list[str] = []
        for tag, colspan, parts in cells:
            if tag == "td":
                row_data.extend(["".join(parts).strip()] * int(colspan))
        if row_data:
            rows.append(row_data)
    max_cols = len(headers) if headers else (max((len(r) for r in rows), default=0))
    aligned = [r[:max_cols] + [""] * (max_cols - len(r)) for r in rows]
    if not headers and max_cols > 0:
        headers = [f"Column {i + 1}" for i in range(max_cols)]
    return {
        "caption": caption, "summary": summary,
        "headers": headers, "rows": aligned,
        "row_count": len(aligned), "column_count": max_cols,
    }


def extract_tables(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    table_score_threshold: float = 7,
    min_rows: int = 0,
    min_cols: int = 0,
) -> DataFrame:
    """Data tables per page (layout tables score-filtered out)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for url, html in zip(pdf[url_col], pdf[html_col]):
                p = _TableParser()
                try:
                    p.feed(html or "")
                except Exception:
                    continue
                idx = 0
                for t in p.tables:
                    if _score_table(t) < table_score_threshold:
                        continue
                    try:
                        d = _extract_table(t)
                    except Exception:
                        continue  # e.g. non-int colspan (reference :126-128)
                    if min_rows > 0 and d["row_count"] < min_rows:
                        continue
                    if min_cols > 0 and d["column_count"] < min_cols:
                        continue
                    out.append(
                        (url, idx, d["caption"], d["summary"], d["headers"], d["rows"],
                         d["row_count"], d["column_count"])
                    )
                    idx += 1
            yield pd.DataFrame(out, columns=[f.name for f in TABLE_SCHEMA.fields])

    return pages.select(url_col, html_col).mapInPandas(gen, TABLE_SCHEMA)


# ---------------------------------------------------------------------------
# Full page metadata (extract_metadata_using_lxml, utils.py — the metadata
# dict LXMLWebScrapingStrategy attaches to every result,
# content_scraping_strategy.py:690)
# ---------------------------------------------------------------------------
#
# lxml is absent, so this is a rule-for-rule analog on the stdlib DOM
# (pinned by tests; same precedent as preprocess_html_for_schema).  Pinned
# reference quirks: no <head> element → {} immediately (even when <title>
# exists in <body>); the second title fallback searches the WHOLE document;
# the third falls back to og:title/twitter:title @content (empty attr →
# None); og:/twitter:/article: metas are collected from the head only and
# dropped when either the attr name or the content strips to empty; later
# duplicates overwrite earlier ones (plain dict assignment).

FULL_META_SCHEMA = T.StructType(
    [
        T.StructField("src_url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("keywords", T.StringType()),
        T.StructField("author", T.StringType()),
        T.StructField("metadata_json", T.StringType()),
    ]
)


def _first_text_child(node) -> str | None:
    for c in node.children:
        if isinstance(c, str):
            return c
        return None  # lxml .text: nothing before the first child element
    return None


def page_metadata_lxml(html: str) -> dict:
    """extract_metadata_using_lxml parity on the stdlib DOM."""
    from ..functions.dom import parse_dom

    if not html:
        return {}
    try:
        root = parse_dom(html)
    except Exception:
        return {}
    heads = root.find_all("head")
    if not heads:
        return {}
    head = heads[0]
    metadata: dict = {}

    # title: head .//title/text()[0] → doc.find(".//title").text → og/twitter
    title = None
    tel = head.find("title")
    if tel is not None:
        for c in tel.children:
            if isinstance(c, str):
                title = c
                break
    if not title:
        tel = root.find("title")
        title = _first_text_child(tel) if tel is not None else None
    if not title:
        candidates = [
            m.get("content")
            for m in root.find_all("meta")
            if m.get("property") == "og:title"
        ] or [
            m.get("content")
            for m in root.find_all("meta")
            if m.get("name") == "twitter:title"
        ]
        title = candidates[0] if candidates else None
    metadata["title"] = title.strip() if title else None

    def _head_meta(name: str) -> str | None:
        for m in head.find_all("meta"):
            if m.get("name") == name:
                v = m.get("content")
                return v.strip() if v is not None else None
        return None

    metadata["description"] = _head_meta("description")
    metadata["keywords"] = _head_meta("keywords")
    metadata["author"] = _head_meta("author")

    for attr, prefix in (("property", "og:"), ("name", "twitter:"), ("property", "article:")):
        for m in head.find_all("meta"):
            key = (m.get(attr) or "").strip()
            if not key.startswith(prefix):
                continue
            content = (m.get("content") or "").strip()
            if key and content:
                metadata[key] = content
    return metadata


def extract_page_metadata(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """Arrow-batched map: the full metadata dict per page, fixed columns +
    the variable og/twitter/article keys as sorted JSON."""
    import json as _json

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf[url_col], pdf[html_col]):
                md = page_metadata_lxml(html)
                rows.append(
                    (
                        url,
                        md.get("title"),
                        md.get("description"),
                        md.get("keywords"),
                        md.get("author"),
                        _json.dumps(
                            {k: v for k, v in md.items()
                             if k not in ("title", "description", "keywords", "author")},
                            sort_keys=True,
                        ),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FULL_META_SCHEMA.fields])

    return pages.select(url_col, html_col).mapInPandas(gen, FULL_META_SCHEMA)


def fast_format_html(html_string: str) -> str:
    """Prettify-path formatter (utils.py fast_format_html, applied to
    cleaned_html when ``prettiify`` is set, async_webcrawler.py:739):
    tag/content split on '<'/'>' with a running two-space indent —
    transcribed; cross-executed against the reference's own code in tests."""
    indent = 0
    indent_str = "  "
    formatted = []
    parts = html_string.replace(">", ">\n").replace("<", "\n<").split("\n")
    for part in parts:
        if not part.strip():
            continue
        if part.startswith("</"):
            indent -= 1
            formatted.append(indent_str * indent + part)
        elif part.startswith("<") and part.endswith("/>"):
            formatted.append(indent_str * indent + part)
        elif part.startswith("<"):
            formatted.append(indent_str * indent + part)
            indent += 1
        else:
            content = part.strip()
            if content:
                formatted.append(indent_str * indent + content)
    return "\n".join(formatted)
