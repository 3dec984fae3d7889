"""Markdown generation (markdown_generation_strategy.py semantics).

Two layers:

* :func:`html_to_markdown` — an html→markdown converter over the stdlib
  DOM (functions/dom.py).  The reference delegates to its vendored
  CustomHTML2Text with ``body_width=0`` (no wrapping) and
  ``single_line_break``; this converter covers the same element set
  (headings, paragraphs, emphasis, links, images, lists, code/pre,
  blockquote, tables, hr/br) with those conventions.  Its output format
  is pinned by golden tests — it is this engine's markdown dialect, not
  a byte-clone of html2text.
* :func:`convert_links_to_citations` — EXACT transcription of
  DefaultMarkdownGenerator.convert_links_to_citations
  (markdown_generation_strategy.py:84-146): the LINK_PATTERN regex
  (:12), first-appearance numbering, ``text⟨n⟩`` / ``![text⟨n⟩]``
  replacements, fast_urljoin (:14-23) and the ``## References`` block.

:func:`generate_markdown` composes both with an optional content filter
(fit_markdown / fit_html, :233-240: filtered blocks wrapped in <div>).
The Spark surface is :func:`markdown_for_pages` — one Arrow-batched
mapInPandas pass, stateless, linear at any scale.
"""

from __future__ import annotations

import re
from typing import Callable, Iterator
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .dom import DomNode, parse_dom

# markdown_generation_strategy.py:12
LINK_PATTERN = re.compile(r'!?\[([^\]]+)\]\(([^)]+?)(?:\s+"([^"]*)")?\)')

_SKIP_TAGS = {"script", "style", "head", "noscript", "template", "iframe"}
_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
_BLOCK_TAGS = {
    "p", "div", "section", "article", "main", "aside", "header", "footer",
    "ul", "ol", "li", "table", "tr", "blockquote", "pre", "figure",
    "figcaption", "details", "summary", "nav", "form", "dl", "dt", "dd",
}


def fast_urljoin(base: str, url: str) -> str:
    """markdown_generation_strategy.py:14-23 exact."""
    if url.startswith(("http://", "https://", "mailto:", "//")):
        return url
    if url.startswith("/"):
        if base.endswith("/"):
            return base[:-1] + url
        return base + url
    return urljoin(base, url)


def _collapse(text: str) -> str:
    return re.sub(r"\s+", " ", text)


class _MdWriter:
    def __init__(
        self,
        base_url: str = "",
        ignore_links: bool = False,
        ignore_images: bool = False,
        protect_links: bool = False,
    ):
        self.blocks: list[str] = []
        self.cur: list[str] = []
        self.base_url = base_url
        # html2text option trio (html2text/__init__.py:68-72,511,525,556):
        # ignore_links skips the <a> machinery entirely (inner text only);
        # protect_links wraps href in <> BEFORE the baseurl join (:525 sets
        # attrs["href"] pre-join — quirk pinned); ignore_images drops <img>.
        self.ignore_links = ignore_links
        self.ignore_images = ignore_images
        self.protect_links = protect_links

    def resolve(self, url: str) -> str:
        # html2text absolutizes with PROPER urljoin when baseurl is set
        # (html2text/__init__.py:602) — unlike the citation pass's
        # fast_urljoin quirk, which then no-ops on the absolute result
        return urljoin(self.base_url, url) if self.base_url else url

    def text(self, s: str) -> None:
        self.cur.append(s)

    def flush(self) -> None:
        block = "".join(self.cur).strip()
        if block:
            self.blocks.append(block)
        self.cur = []


def _render_inline(node: DomNode, w: _MdWriter) -> None:
    for c in node.children:
        if isinstance(c, str):
            w.text(_collapse(c))
            continue
        _render_node(c, w)


def _render_node(n: DomNode, w: _MdWriter) -> None:
    tag = n.tag
    if tag in _SKIP_TAGS:
        return
    if tag in _HEADINGS:
        w.flush()
        w.text("#" * _HEADINGS[tag] + " ")
        _render_inline(n, w)
        w.flush()
        return
    if tag == "br":
        w.text("\n")
        return
    if tag == "hr":
        w.flush()
        w.text("* * *")
        w.flush()
        return
    if tag == "a":
        href = n.get("href") or ""
        title = n.get("title")
        label = _collapse(n.get_text()).strip()
        if not label:
            return
        if w.ignore_links or not href:
            w.text(label)
            return
        if w.protect_links:
            href = "<" + href + ">"  # pre-join bracketing (:525)
        href = w.resolve(href)
        w.text(f'[{label}]({href} "{title}")' if title else f"[{label}]({href})")
        return
    if tag == "img":
        if w.ignore_images:
            return
        alt = (n.get("alt") or "").strip()
        src = n.get("src") or ""
        title = n.get("title")
        if src:
            src = w.resolve(src)
            w.text(f'![{alt}]({src} "{title}")' if title else f"![{alt}]({src})")
        return
    if tag in ("strong", "b"):
        w.text("**")
        _render_inline(n, w)
        w.text("**")
        return
    if tag in ("em", "i"):
        w.text("*")
        _render_inline(n, w)
        w.text("*")
        return
    if tag == "code" and (n.parent is None or n.parent.tag != "pre"):
        w.text("`" + n.get_text() + "`")
        return
    if tag == "pre":
        w.flush()
        w.blocks.append("```\n" + n.get_text().strip("\n") + "\n```")
        return
    if tag == "blockquote":
        w.flush()
        inner = _MdWriter()
        _render_block_children(n, inner)
        inner.flush()
        for b in inner.blocks:
            w.blocks.append("\n".join("> " + ln for ln in b.split("\n")))
        return
    if tag in ("ul", "ol"):
        w.flush()
        idx = 1
        for c in n.element_children():
            if c.tag != "li":
                continue
            item = _MdWriter()
            _render_block_children(c, item)
            item.flush()
            body = "\n".join(item.blocks)
            marker = f"{idx}. " if tag == "ol" else "* "
            pad = " " * len(marker)
            lines = body.split("\n")
            w.blocks.append(
                "\n".join([marker + lines[0]] + [pad + ln for ln in lines[1:]])
            )
            idx += 1
        return
    if tag in ("table", "thead", "tbody"):
        # rows become pipe lines; header separator after a thead row
        w.flush()
        for tr in n.find_all("tr"):
            cells = [c for c in tr.element_children() if c.tag in ("td", "th")]
            if not cells:
                continue
            line = "| " + " | ".join(_collapse(c.get_text()).strip() for c in cells) + " |"
            w.blocks.append(line)
            if all(c.tag == "th" for c in cells):
                w.blocks.append("|" + "---|" * len(cells))
        return
    if tag in _BLOCK_TAGS:
        w.flush()
        _render_block_children(n, w)
        w.flush()
        return
    # inline/unknown: render contents in place
    _render_inline(n, w)


def _render_block_children(n: DomNode, w: _MdWriter) -> None:
    for c in n.children:
        if isinstance(c, str):
            w.text(_collapse(c))
        else:
            _render_node(c, w)


def html_to_markdown(
    html: str,
    base_url: str = "",
    ignore_links: bool = False,
    ignore_images: bool = False,
    protect_links: bool = False,
) -> str:
    """Convert HTML to markdown (single_line_break: one newline between
    blocks, no wrapping).  With ``base_url`` link/image urls are
    absolutized by proper urljoin, as html2text does with baseurl.
    ``ignore_links``/``ignore_images``/``protect_links`` mirror the
    html2text_options trio the reference exposes
    (markdown_generation_strategy.py:182-186)."""
    root = parse_dom(html or "")
    w = _MdWriter(base_url, ignore_links, ignore_images, protect_links)
    body = root.find("body") or root
    _render_block_children(body, w)
    w.flush()
    return "\n".join(w.blocks) + ("\n" if w.blocks else "")


def convert_links_to_citations(markdown: str, base_url: str = "") -> tuple[str, str]:
    """markdown_generation_strategy.py:84-146 — exact semantics."""
    link_map: dict[str, tuple[int, str]] = {}
    url_cache: dict[str, str] = {}
    parts: list[str] = []
    last_end = 0
    counter = 1
    for match in LINK_PATTERN.finditer(markdown):
        parts.append(markdown[last_end : match.start()])
        text, url, title = match.groups()
        if base_url and not url.startswith(("http://", "https://", "mailto:")):
            if url not in url_cache:
                url_cache[url] = fast_urljoin(base_url, url)
            url = url_cache[url]
        if url not in link_map:
            desc = []
            if title:
                desc.append(title)
            if text and text != title:
                desc.append(text)
            link_map[url] = (counter, ": " + " - ".join(desc) if desc else "")
            counter += 1
        num = link_map[url][0]
        parts.append(
            f"{text}⟨{num}⟩"
            if not match.group(0).startswith("!")
            else f"![{text}⟨{num}⟩]"
        )
        last_end = match.end()
    parts.append(markdown[last_end:])
    converted_text = "".join(parts)
    references = ["\n\n## References\n\n"]
    references.extend(
        f"⟨{num}⟩ {url}{desc}\n"
        for url, (num, desc) in sorted(link_map.items(), key=lambda x: x[1][0])
    )
    return converted_text, "".join(references)


def generate_markdown(
    html: str,
    base_url: str = "",
    content_filter: Callable[[str], list[str]] | None = None,
    citations: bool = True,
    html2text_options: dict | None = None,
) -> dict:
    """DefaultMarkdownGenerator.generate_markdown composition (:148-260):
    raw markdown → citations → optional fit_html/fit_markdown via a
    filter_content callable returning HTML block strings.

    Error isolation mirrors the reference's per-stage try/excepts
    (markdown_generation_strategy.py:208-253): a raw-conversion error
    error-strings raw_markdown; a citations error keeps raw and
    error-strings references; a content-filter error keeps raw+citations
    and error-strings only fit_markdown (fit_html blanked)."""
    opts = {
        k: bool((html2text_options or {}).get(k, False))
        for k in ("ignore_links", "ignore_images", "protect_links")
    }
    try:
        try:
            raw_markdown = html_to_markdown(html or "", base_url, **opts)
        except Exception as e:
            raw_markdown = f"Error converting HTML to markdown: {str(e)}"
        markdown_with_citations, references_markdown = raw_markdown, ""
        if citations:
            try:
                markdown_with_citations, references_markdown = convert_links_to_citations(
                    raw_markdown, base_url
                )
            except Exception as e:
                markdown_with_citations = raw_markdown
                references_markdown = f"Error generating citations: {str(e)}"
        fit_markdown, fit_html = "", ""
        if content_filter is not None:
            try:
                blocks = content_filter(html or "")
                fit_html = "\n".join("<div>{}</div>".format(s) for s in blocks)
                fit_markdown = html_to_markdown(fit_html, base_url, **opts)
            except Exception as e:
                fit_markdown = f"Error generating fit markdown: {str(e)}"
                fit_html = ""
        return {
            "raw_markdown": raw_markdown,
            "markdown_with_citations": markdown_with_citations,
            "references_markdown": references_markdown,
            "fit_markdown": fit_markdown,
            "fit_html": fit_html,
        }
    except Exception as e:  # outer catch (:251-260)
        error_msg = f"Error in markdown generation: {str(e)}"
        return {
            "raw_markdown": error_msg,
            "markdown_with_citations": error_msg,
            "references_markdown": "",
            "fit_markdown": "",
            "fit_html": "",
        }


MARKDOWN_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("raw_markdown", T.StringType()),
        T.StructField("markdown_with_citations", T.StringType()),
        T.StructField("references_markdown", T.StringType()),
        T.StructField("fit_markdown", T.StringType()),
        T.StructField("fit_html", T.StringType()),
    ]
)


def markdown_for_pages(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    content_filter: Callable[[str], list[str]] | None = None,
    citations: bool = True,
    html2text_options: dict | None = None,
) -> DataFrame:
    """Markdown columns for every page — one stateless Arrow pass."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf[url_col], pdf[html_col]):
                # generate_markdown never raises (reference-parity
                # per-stage error strings inside)
                r = generate_markdown(
                    html, base_url=url, content_filter=content_filter,
                    citations=citations, html2text_options=html2text_options,
                )
                rows.append(
                    (url, r["raw_markdown"], r["markdown_with_citations"],
                     r["references_markdown"], r["fit_markdown"], r["fit_html"])
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MARKDOWN_SCHEMA.fields])

    return pages.select(url_col, html_col).mapInPandas(gen, MARKDOWN_SCHEMA)
