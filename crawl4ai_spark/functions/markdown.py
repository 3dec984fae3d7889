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
import string
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
    # every whitespace EXCEPT nbsp collapses — \xa0 is html2text's
    # non-breaking space, surfaced (or unified to ' ') by the
    # unicode_snob option layer below, never merged with neighbors
    return re.sub(r"[^\S\xa0]+", " ", text)


# ---------------------------------------------------------------------------
# html2text option-parity layer — the escape regexes, entity unification
# table, and paragraph wrapper of the reference's vendored html2text
# (html2text/config.py:64-153, utils.py:6-10,162-232, __init__.py:964-1023),
# transcribed and cross-executed byte-identical per option in
# tests/test_markdown_contentfilter.py.
# ---------------------------------------------------------------------------

_RE_MD_CHARS = re.compile(r"([\\\[\]\(\)])")                 # escape_md set
_RE_MD_CHARS_ALL = re.compile(r"([`\*_{}\[\]\(\)#!])")       # escape_snob set
_RE_MD_DOT = re.compile(r"^(\s*\d+)(\.)(?=\s)", re.M)
_RE_MD_PLUS = re.compile(r"^(\s*)(\+)(?=\s)", re.M)
_RE_MD_DASH = re.compile(r"^(\s*)(-)(?=\s|\-)", re.M)
_RE_MD_BACKSLASH = re.compile(r"(\\)(?=[%s])" % re.escape(r"\`*_{}[]()#+-.!"))
_RE_LINK_IN_PARA = re.compile(r"(\[.*?\] ?\(.*?\))|(\[.*?\]:.*?)")
_RE_TABLE_SEP = re.compile(r" \| ")
_RE_SPACE_SIC = re.compile(r"\s\+")  # (sic — the vendored RE_SPACE pattern)
_RE_ORDERED_LIST = re.compile(r"\d+\.\s")
_RE_UNORDERED_LIST = re.compile(r"[-\*\+]\s")
_RE_ABS_URL = re.compile(r"^[a-zA-Z+]+://")  # absolute_url_matcher (:96)

# UNIFIABLE (config.py:115-153): unicode → ascii pseudo-replacements used
# when unicode_snob is OFF; keyed by codepoint like the vendored
# utils.unifiable_n, plus nbsp → ' ' (finish()-time special case :176-180)
_UNIFIABLE = {
    "rsquo": "'", "lsquo": "'", "rdquo": '"', "ldquo": '"', "copy": "(C)",
    "mdash": "--", "nbsp": " ", "rarr": "->", "larr": "<-", "middot": "*",
    "ndash": "-", "oelig": "oe", "aelig": "ae",
    "agrave": "a", "aacute": "a", "acirc": "a", "atilde": "a", "auml": "a",
    "aring": "a", "egrave": "e", "eacute": "e", "ecirc": "e", "euml": "e",
    "igrave": "i", "iacute": "i", "icirc": "i", "iuml": "i",
    "ograve": "o", "oacute": "o", "ocirc": "o", "otilde": "o", "ouml": "o",
    "ugrave": "u", "uacute": "u", "ucirc": "u", "uuml": "u",
    "lrm": "", "rlm": "",
}


def _unifiable_trans() -> dict:
    import html.entities

    return {html.entities.name2codepoint[k]: v for k, v in _UNIFIABLE.items()}


_UNIFIABLE_TRANS = _unifiable_trans()


def escape_md(text: str) -> str:
    """utils.escape_md — within-construct escaping (urls, alt, titles)."""
    return _RE_MD_CHARS.sub(r"\\\1", text)


def escape_md_section(
    text: str,
    snob: bool = False,
    escape_dot: bool = False,
    escape_plus: bool = False,
    escape_dash: bool = False,
) -> str:
    """utils.escape_md_section with the vendored DEFAULTS (config.py:12-14:
    ESCAPE_DOT/PLUS/DASH are False) — by default only a literal backslash
    ahead of a markdown-special character is escaped; ``snob`` adds the
    full special-character set."""
    text = _RE_MD_BACKSLASH.sub(r"\\\1", text)
    if snob:
        text = _RE_MD_CHARS_ALL.sub(r"\\\1", text)
    if escape_dot:
        text = _RE_MD_DOT.sub(r"\1\\\2", text)
    if escape_plus:
        text = _RE_MD_PLUS.sub(r"\1\\\2", text)
    if escape_dash:
        text = _RE_MD_DASH.sub(r"\1\\\2", text)
    return text


def _skipwrap(para: str, wrap_links: bool, wrap_list_items: bool, wrap_tables: bool) -> bool:
    """utils.skipwrap:162-196 — which paragraphs body_width must not touch."""
    if not wrap_links and _RE_LINK_IN_PARA.search(para):
        return True
    if para[0:4] == "    " or para[0:1] == "\t":
        return True  # code block
    stripped = para.lstrip()
    if stripped[0:2] == "--" and len(stripped) > 2 and stripped[2] != "-":
        return False  # emdash
    if stripped[0:1] in ("-", "*") and not stripped[0:2] == "**":
        return not wrap_list_items
    if not wrap_tables and _RE_TABLE_SEP.search(para):
        return True
    return bool(_RE_ORDERED_LIST.match(stripped) or _RE_UNORDERED_LIST.match(stripped))


def _optwrap(
    text: str, body_width: int, ul_item_mark: str = "*", wrap_links: bool = True
) -> str:
    """HTML2Text.optwrap:964-1023 with the vendored defaults
    (WRAP_LINKS=True, WRAP_LIST_ITEMS/WRAP_TABLES=False): wrap each
    paragraph at ``body_width`` columns, '> '-continue blockquotes,
    double-indent list continuations, re-space the blank lines.
    ``wrap_links=False`` exempts link-bearing paragraphs (skipwrap's
    RE_LINK test), exactly the package's WRAP_LINKS toggle."""
    from textwrap import wrap

    result = ""
    newlines = 0
    for para in text.split("\n"):
        if len(para) > 0:
            if not _skipwrap(para, wrap_links, False, False):
                indent = ""
                if para.startswith("  " + ul_item_mark):
                    indent = "    "  # list item continuation
                elif para.startswith("> "):
                    indent = "> "  # blockquote continuation
                wrapped = wrap(para, body_width, break_long_words=False,
                               subsequent_indent=indent)
                result += "\n".join(wrapped)
                if para.endswith("  "):
                    result += "  \n"
                    newlines = 1
                elif indent:
                    result += "\n"
                    newlines = 1
                else:
                    result += "\n\n"
                    newlines = 2
            else:
                if not _RE_SPACE_SIC.match(para):
                    result += para + "\n"
                    newlines = 1
        else:
            if newlines < 2:
                result += "\n"
                newlines += 1
    return result


_PUNCT = set("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~")
# whitespace set for the em-mark space rule — string.whitespace exactly
# (html2text :431: `not in string.whitespace`), NOT str.isspace (which
# would also catch \xa0 and friends the vendored rule lets through)
_WHITESPACE = set(" \t\n\r\x0b\x0c")
# first-char test for the preceding_stressed space (:889-892)
_STRESS_NEXT_RE = re.compile(r"[^][(){}\s.!?]")


class _MdWriter:
    def __init__(
        self,
        base_url: str = "",
        ignore_links: bool = False,
        ignore_images: bool = False,
        protect_links: bool = False,
        body_width: int = 0,
        escape_snob: bool = False,
        ignore_emphasis: bool = False,
        emphasis_mark: str = "*",
        strong_mark: str = "**",
        ul_item_mark: str = "*",
        unicode_snob: bool = True,
        escape_dot: bool = False,
        escape_plus: bool = False,
        escape_dash: bool = False,
        use_automatic_links: bool = True,
        skip_internal_links: bool = True,
        images_to_alt: bool = False,
        default_image_alt: str = "",
        open_quote: str = '"',
        close_quote: str = '"',
        mark_code: bool = False,
        wrap_links: bool = True,
        pad_tables: bool | None = None,
        bypass_tables: bool | None = None,
        ignore_tables: bool | None = None,
        ignore_mailto_links: bool = False,
        images_as_html: bool = False,
        images_with_size: bool = False,
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
        # extended html2text option surface (VERDICT r3 item 5), each
        # cross-executed byte-identical against the vendored package.
        # Dialect-divergent DEFAULTS, both documented: emphasis_mark
        # defaults to '*' (html2text: '_') and unicode_snob to True
        # (html2text: False) — this engine's golden dialect predates the
        # option layer; byte-parity holds whenever the caller passes the
        # html2text value explicitly.
        self.body_width = int(body_width or 0)
        self.escape_snob = escape_snob
        self.ignore_emphasis = ignore_emphasis
        self.emphasis_mark = emphasis_mark
        self.strong_mark = strong_mark
        self.ul_item_mark = ul_item_mark
        self.unicode_snob = unicode_snob
        self.escape_dot = escape_dot
        self.escape_plus = escape_plus
        self.escape_dash = escape_dash
        # html2text DEFAULTS carried over exactly (:59-79, config.py):
        # automatic <url> links when href == text and absolute, '#'
        # fragment links dropped to their text — both default ON there
        # and here (no golden relies on the old [x](#f)/[u](u) forms)
        self.use_automatic_links = use_automatic_links
        self.skip_internal_links = skip_internal_links
        self.images_to_alt = images_to_alt
        self.default_image_alt = default_image_alt
        self.open_quote = open_quote
        self.close_quote = close_quote
        self.mark_code = mark_code
        self.wrap_links = wrap_links
        # html2text image/mailto extras (:71-75,516-521,562-580), each
        # cross-executed byte-identical: mailto links drop to their text,
        # images_as_html re-emits the raw <img .../> form, and
        # images_with_size does so only when width/height attrs exist
        self.ignore_mailto_links = ignore_mailto_links
        self.images_as_html = images_as_html
        self.images_with_size = images_with_size
        # html2text table-family options (:77-90, 680-733).  Passing ANY
        # of them (True or False) switches table rendering to the
        # vendored package's forms — plain 'c1| c2' soft-broken rows with
        # a '---|---' underline after the first tr, padded pipe tables,
        # literal <table> tag bypass, or tag-stripped rows — each
        # cross-executed byte-identical.  Default None keeps this
        # engine's golden pipe-table dialect (same precedent as the
        # emphasis_mark/unicode_snob dialect defaults).
        self.h2t_tables = any(v is not None for v in (pad_tables, bypass_tables, ignore_tables))
        self.pad_tables = bool(pad_tables)
        self.bypass_tables = bool(bypass_tables)
        self.ignore_tables = bool(ignore_tables)
        # stressed-data machinery (html2text/__init__.py:138-139,441-476,
        # 875-896): the first data chunk inside em/strong/del is stripped;
        # the next data chunk after it gets a space prefix unless it
        # starts with bracket/space/sentence punctuation or sits in an
        # a/code/pre/heading context.  preceding_data is the last DATA
        # emitted (marks excluded) — the vendored mark-space rules test
        # it, not the last output character.
        self.stressed = False
        self.preceding_stressed = False
        self.preceding_data = ""
        self.current_tag: str | None = None

    def resolve(self, url: str) -> str:
        # html2text absolutizes with PROPER urljoin when baseurl is set
        # (html2text/__init__.py:602) — unlike the citation pass's
        # fast_urljoin quirk, which then no-ops on the absolute result
        return urljoin(self.base_url, url) if self.base_url else url

    def escape(self, s: str) -> str:
        """Text-data escape pipeline (handle_data :915-922): entity
        unification when unicode_snob is off, then escape_md_section.

        Deliberate dialect divergence (pinned in
        test_markdown_unifiable_literal_divergence): this translates
        UNIFIABLE codepoints in ALL text, whereas the vendored html2text
        (convert_charrefs=False) unifies only characters that arrived as
        entities/charrefs — a LITERAL em-dash in source HTML stays
        unicode there but becomes '--' here.  Our DOM layer decodes
        entities before rendering, so entity-origin is unrecoverable at
        this point; uniform translation is the consistent choice (a
        byte-identical doc should render identically regardless of how
        its author spelled a dash).  Byte-parity with html2text per
        option therefore holds for entity/charref forms; literal unicode
        chars under unicode_snob=False are the one documented exception."""
        if not self.unicode_snob:
            s = s.translate(_UNIFIABLE_TRANS)
        return escape_md_section(
            s, snob=self.escape_snob, escape_dot=self.escape_dot,
            escape_plus=self.escape_plus, escape_dash=self.escape_dash,
        )

    def last_char(self) -> str:
        for part in reversed(self.cur):
            if part:
                return part[-1]
        return ""

    def child(self) -> "_MdWriter":
        """Fresh writer inheriting every option (nested blockquote/list
        rendering must keep the caller's dialect)."""
        return _MdWriter(
            self.base_url, self.ignore_links, self.ignore_images,
            self.protect_links, self.body_width, self.escape_snob,
            self.ignore_emphasis, self.emphasis_mark, self.strong_mark,
            self.ul_item_mark, self.unicode_snob, self.escape_dot,
            self.escape_plus, self.escape_dash, self.use_automatic_links,
            self.skip_internal_links, self.images_to_alt,
            self.default_image_alt, self.open_quote, self.close_quote,
            self.mark_code, self.wrap_links,
            self.pad_tables if self.h2t_tables else None,
            self.bypass_tables if self.h2t_tables else None,
            self.ignore_tables if self.h2t_tables else None,
            self.ignore_mailto_links, self.images_as_html,
            self.images_with_size,
        )

    def text(self, s: str) -> None:
        self.cur.append(s)

    def emit_data(self, raw: str) -> None:
        """handle_data analog (:875-922): stressed strip, then the
        preceding_stressed space rule, then unification + escaping."""
        s = _collapse(raw)
        if self.stressed:
            s = s.strip()
            self.stressed = False
            self.preceding_stressed = True
        elif self.preceding_stressed:
            self.preceding_stressed = False
            if (
                s
                and _STRESS_NEXT_RE.match(s[0])
                and self.current_tag not in ("a", "code", "pre")
                and self.current_tag not in _HEADINGS
                # the vendored space travels via o()'s space flag, which
                # drops it right after a newline (lastWasNL, :838-841);
                # at a block start nothing precedes either
                and self.last_char() not in ("", "\n")
            ):
                s = " " + s
        out = self.escape(s)
        self.preceding_data = out
        if out:
            self.cur.append(out)

    def note_data(self, s: str) -> None:
        """Data that reaches the vendored handle_data under an excluded
        current_tag (link labels, code text): the stressed flags advance
        and preceding_data updates, but no space is inserted."""
        if self.stressed:
            self.stressed = False
            self.preceding_stressed = True
        elif self.preceding_stressed:
            self.preceding_stressed = False
        self.preceding_data = s

    def flush(self) -> None:
        block = "".join(self.cur).strip()
        if block:
            self.blocks.append(block)
        self.cur = []


def _render_inline(node: DomNode, w: _MdWriter) -> None:
    for c in node.children:
        if isinstance(c, str):
            w.emit_data(c)
            continue
        _render_node(c, w)


def _render_node(n: DomNode, w: _MdWriter) -> None:
    tag = n.tag
    if tag in _SKIP_TAGS:
        return
    # current_tag follows the vendored tag stream (handle_tag sets it on
    # BOTH the start and end call): mark it on entry, and again after the
    # subtree renders so data following our close sees this tag
    w.current_tag = tag
    try:
        _render_node_inner(n, w, tag)
    finally:
        w.current_tag = tag


def _render_node_inner(n: DomNode, w: _MdWriter, tag: str) -> None:
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
        label = w.escape(_collapse(n.get_text()).strip())
        if not label:
            return
        # the label reaches the vendored handle_data under current_tag='a'
        # (:890-892): flags advance, no space, preceding_data updates
        w.note_data(label)
        if w.ignore_links or not href:
            w.text(label)
            return
        if w.skip_internal_links and href.startswith("#"):
            w.text(label)  # fragment link dropped to its text (:516-519)
            return
        if w.ignore_mailto_links and href.startswith("mailto:"):
            w.text(label)  # mailto dropped to its text (:516-521)
            return
        raw_label = _collapse(n.get_text()).strip()
        if (
            w.use_automatic_links
            and raw_label == href
            and _RE_ABS_URL.match(href)
        ):
            # automatic link (:900-908) — the vendored package records
            # maybe_automatic_link BEFORE protect_links brackets the
            # href (:523-525), so automatic wins under protect_links too
            w.text("<" + href + ">")
            return
        if w.protect_links:
            href = "<" + href + ">"  # pre-join bracketing (:525)
        href = escape_md(w.resolve(href))  # :509 escapes the emitted url
        # :540-546 — titles are escaped and whitespace-only titles dropped
        title = escape_md(title.strip()) if title and title.strip() else None
        w.text(f'[{label}]({href} "{title}")' if title else f"[{label}]({href})")
        return
    if tag == "img":
        if w.ignore_images:
            return
        # raw-html image branch (:562-580): images_as_html always, or
        # images_with_size when a width/height ATTR is present.  Wins
        # over images_to_alt, requires src, and emits src/alt RAW
        # (unresolved, unescaped, unstripped) — exactly the vendored form
        raw_src = n.get("src")
        if raw_src is not None and (
            w.images_as_html
            or (w.images_with_size and ("width" in n.attrs or "height" in n.attrs))
        ):
            raw_alt = (n.get("alt") or "") or w.default_image_alt
            out = "<img src='" + raw_src + "' "
            if "width" in n.attrs and n.get("width") is not None:
                out += "width='" + n.get("width") + "' "
            if "height" in n.attrs and n.get("height") is not None:
                out += "height='" + n.get("height") + "' "
            if raw_alt:
                out += "alt='" + raw_alt + "' "
            w.text(out + "/>")
            return
        alt = escape_md((n.get("alt") or "").strip() or w.default_image_alt)  # :592-598
        src = n.get("src") or ""
        if w.images_to_alt:
            w.text(alt)  # image collapsed to its alt text (:578-596)
            return
        if src:
            src = escape_md(w.resolve(src))  # :602
            # the vendored handle_image never emits a title (:598-602)
            w.text(f"![{alt}]({src})")
        return
    if tag in ("del", "strike", "s"):
        # :469-476 — '~~' strike marks, with the preceding-'~' space rule
        # (tested against preceding_data, the last DATA, not last output)
        if w.preceding_data and w.preceding_data[-1] == "~":
            w.text(" ")
            w.preceding_data += " "
        w.text("~~")
        w.stressed = True  # :475
        _render_inline(n, w)
        w.text("~~")
        return
    if tag == "q":
        w.text(w.open_quote)  # :478-481 (OPEN_QUOTE/CLOSE_QUOTE config)
        _render_inline(n, w)
        w.text(w.close_quote)
        return
    if tag in ("strong", "b"):
        if w.ignore_emphasis:  # :443 — marks dropped, text kept
            _render_inline(n, w)
            return
        # :446-460: a space keeps *** renderable when the preceding DATA
        # already ends with the mark's first char
        if w.strong_mark and w.preceding_data and w.preceding_data[-1] == w.strong_mark[0]:
            w.text(" ")
            w.preceding_data += " "
        w.text(w.strong_mark)
        w.stressed = True  # :463
        _render_inline(n, w)
        w.text(w.strong_mark)
        return
    if tag in ("em", "i", "u"):
        if w.ignore_emphasis:  # :422 — em/i/u all under ignore_emphasis
            _render_inline(n, w)
            return
        # :429-437: a space keeps _x_ renderable right after alphanumerics
        # in the preceding DATA (marks emitted in between don't count)
        last = w.preceding_data[-1:] if w.preceding_data else ""
        if last and last not in _WHITESPACE and last not in _PUNCT:
            w.text(" ")
            w.preceding_data += " "
        w.text(w.emphasis_mark)
        w.stressed = True  # :441
        _render_inline(n, w)
        w.text(w.emphasis_mark)
        return
    if tag == "code" and (n.parent is None or n.parent.tag != "pre"):
        code_text = n.get_text()
        w.note_data(code_text)  # data under current_tag='code' (:890-892)
        w.text("`" + code_text + "`")
        return
    if tag == "pre":
        w.flush()
        body = n.get_text().strip("\n")
        if w.mark_code:
            # [code] wrapper around the 4-space-indented block (:252-260,
            # config MARK_CODE); the fenced ``` form below is this
            # engine's default dialect (documented divergence)
            indented = "\n".join("    " + ln for ln in body.split("\n"))
            w.blocks.append("[code]\n" + indented + "\n[/code]")
            return
        w.blocks.append("```\n" + body + "\n```")
        return
    if tag == "blockquote":
        w.flush()
        inner = w.child()
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
            item = w.child()
            _render_block_children(c, item)
            item.flush()
            body = "\n".join(item.blocks)
            marker = f"{idx}. " if tag == "ol" else f"{w.ul_item_mark} "
            pad = " " * len(marker)
            lines = body.split("\n")
            w.blocks.append(
                "\n".join([marker + lines[0]] + [pad + ln for ln in lines[1:]])
            )
            idx += 1
        return
    if tag in ("table", "thead", "tbody"):
        if w.h2t_tables:
            w.flush()
            _render_table_h2t(n, w)
            return
        # golden dialect: rows become pipe lines; header separator after
        # a thead row
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


class _SoftTailBlock(str):
    """Block whose LAST line takes the html2text soft-break tail ('  ')
    when any block follows it — the vendored br_toggle (:832-835) emits
    the pending '  ' only when further output arrives, so a table's last
    row ends bare at document end but soft-broken mid-document."""


class _PadTableBlock(str):
    """A pad_tables table already reformatted.  The vendored pipeline
    runs ``pad_tables_in_text`` (utils.py:281-311) over the marker-framed
    stream: each table is replaced by its padded rows plus ONE appended
    blank line, and the closing marker's own trailing newline survives as
    a second blank unless the next line is another table's opening
    marker.  Net byte shapes (probed against the package): table→table =
    one blank line, table→text and table→EOF = two."""


def _edge_is_block(cell: DomNode, last: bool) -> bool:
    """Whether the first (or last) meaningful child of a cell is a
    block-level element — in bypass mode a block child fires the p-break
    machinery against the literal '<td>\\n\\n' / '\\n</td>' tag output,
    adding one newline on that side (probed: '<td><p>a</p>x</td>' →
    '<td>\\n\\n\\na\\nx\\n</td>', '<td>x<p>a</p></td>' →
    '<td>\\n\\nx\\na\\n\\n</td>')."""
    kids = reversed(cell.children) if last else cell.children
    for k in kids:
        if isinstance(k, str):
            if k.strip():
                return False
            continue
        return k.tag in _BLOCK_TAGS
    return False


def _reformat_table(lines: list[str], right_margin: int = 1) -> list[str]:
    """Transcription of the vendored ``reformat_table``
    (html2text/utils.py:237-279), cross-executed byte-identical in
    tests: per-column max widths (rstripped cell + margin), ragged rows
    padded or width-extended, separator rows (chars ⊆ '-|') refilled
    with dashes behind a '|-' gutter, text rows space-filled behind
    '| '."""
    max_width = [len(x.rstrip()) + right_margin for x in lines[0].split("|")]
    max_cols = len(max_width)
    for line in lines:
        cols = [x.rstrip() for x in line.split("|")]
        num_cols = len(cols)
        if num_cols < max_cols:
            cols += [""] * (max_cols - num_cols)
        elif max_cols < num_cols:
            max_width += [len(x) + right_margin for x in cols[-(num_cols - max_cols):]]
            max_cols = num_cols
        max_width = [max(len(x) + right_margin, old) for x, old in zip(cols, max_width)]
    new_lines = []
    for line in lines:
        cols = [x.rstrip() for x in line.split("|")]
        if set(line.strip()) == set("-|"):
            new_lines.append(
                "|-" + "|".join(x + "-" * (m - len(x)) for x, m in zip(cols, max_width)) + "|"
            )
        else:
            new_lines.append(
                "| " + "|".join(x + " " * (m - len(x)) for x, m in zip(cols, max_width)) + "|"
            )
    return new_lines


def _h2t_row_writer(w: _MdWriter) -> _MdWriter:
    """Fresh writer for one table row — the stressed flags flow WITHIN
    the row (that is how 'x<b>y</b></td><td>12' earns its '|  12' double
    space) but reset at row boundaries, where the vendored soft break's
    newline would swallow any pending space anyway."""
    return w.child()


def _render_table_h2t(n: DomNode, w: _MdWriter) -> None:
    """html2text table modes (:680-733), precedence as in the vendored
    dispatch: ignore_tables strips the tags and soft-breaks each row's
    concatenated cell text; bypass_tables re-emits literal
    table/tr/td/th tags around the converted cell content; pad_tables
    buffers the plain rows and reformats them into aligned pipe tables
    (utils.py:281-311); otherwise the plain 'c1| c2' rows with a
    '---|---' underline after the FIRST tr (th or td alike).  Plain/pad
    cells swallow paragraph breaks ('<td><p>a</p><p>b</p>' → 'ab',
    probed) while ignore/bypass keep them; captions and other
    non-row children prefix the first row.  Scope note: LISTS inside
    cells render in this engine's golden list dialect ('* i'), not the
    vendored '  * i' + double-break — the same documented dialect
    divergence as at document level (see emphasis_mark/unicode_snob
    notes), so those cells are excluded from the byte-parity matrix."""
    trs = n.find_all("tr")
    # children the vendored dispatch does NOT special-case (caption,
    # stray text, …) flow as ordinary data at the point encountered —
    # before the first row that means they prefix the first row's line
    # ('<caption>cap <b>b</b></caption><tr><td>a</td>' → 'cap **b** a',
    # stress-space included), and in bypass mode they sit between
    # '<table>' and the first soft break
    stray = [
        c for c in n.children
        if isinstance(c, str)
        or c.tag not in ("tr", "thead", "tbody", "tfoot", "colgroup", "col")
    ]

    def render_stray(rw):
        for s in stray:
            if isinstance(s, str):
                rw.emit_data(s)
            else:
                _render_node(s, rw)

    def cell_text(c, rw):
        rw.current_tag = c.tag
        _render_inline(c, rw)

    def first_row_writer():
        rw = _h2t_row_writer(w)
        render_stray(rw)
        return rw

    if w.ignore_tables:
        emitted = False
        for ri, tr in enumerate(trs):
            rw = first_row_writer() if ri == 0 else _h2t_row_writer(w)
            for c in tr.element_children():
                if c.tag in ("td", "th"):
                    cell_text(c, rw)
            rw.flush()
            # block children inside cells keep their paragraph breaks
            # (probed: '<td><p>a</p><p>b</p></td><td>c</td>' → 'a\nb\nc')
            line = "\n".join(rw.blocks)
            if line:
                w.blocks.append(_SoftTailBlock(line))
                emitted = True
        if not trs and stray:
            rw = first_row_writer()
            rw.flush()
            line = "\n".join(rw.blocks)
            if line:
                w.blocks.append(_SoftTailBlock(line))
                emitted = True
        if trs and not emitted and w.blocks:
            # an all-empty table leaves its pending soft break on the
            # preceding block (probed: '<p>x</p><table><tr></tr></table>
            # <p>y</p>' → 'x  \ny')
            w.blocks[-1] = _SoftTailBlock(str(w.blocks[-1]))
        return

    if w.bypass_tables:
        if w.blocks:
            # table start soft_br (:692) lands the pending '  ' on the
            # preceding block's last line
            w.blocks[-1] = str(w.blocks[-1]) + "  "
        # every tag START is preceded by a soft break (:691-692); ends
        # are not, so an empty <tr></tr> closes on its own line and the
        # final '</td></tr></table>' run together
        parts = ["<table>"]
        if stray:
            rw = _h2t_row_writer(w)
            render_stray(rw)
            rw.flush()
            parts.append("\n".join(rw.blocks))
        for tr in trs:
            parts.append("  \n<tr>")
            for c in tr.element_children():
                if c.tag not in ("td", "th"):
                    continue
                rw = _h2t_row_writer(w)
                cell_text(c, rw)
                rw.flush()
                core = "\n".join(rw.blocks)
                lead = "\n" if _edge_is_block(c, last=False) else ""
                trail = "\n" if _edge_is_block(c, last=True) else ""
                parts.append(f"  \n<{c.tag}>\n\n{lead}{core}{trail}\n</{c.tag}>")
            parts.append("</tr>")
        parts.append("</table>")
        w.blocks.append("".join(parts))
        return

    # plain rows — also the pad-mode buffer
    lines: list[str] = []
    first = True
    if not trs and stray:
        rw = first_row_writer()
        line = "".join(rw.blocks) + "".join(rw.cur)
        if line:
            lines.append(line)
    for ri, tr in enumerate(trs):
        cells = [c for c in tr.element_children() if c.tag in ("td", "th")]
        rw = first_row_writer() if ri == 0 else _h2t_row_writer(w)
        for j, c in enumerate(cells):
            if j:
                rw.text("| ")  # split_next_td marker (:718-720)
            cell_text(c, rw)
        line = "".join(rw.blocks) + "".join(rw.cur)
        if line:
            lines.append(line)
        elif first and w.pad_tables:
            # an empty FIRST tr leaves a bare soft-break line in the pad
            # buffer (its pending '  \n' flushes against the next row or
            # the closing marker) → a '|   |' padded row; empty non-first
            # trs merge their pending break into the previous row's and
            # vanish, as in plain mode (probed)
            lines.append("")
        if first:
            # underline always follows the FIRST tr (:727-731) — even an
            # all-td row, and an empty first tr consumes it silently
            underline = "|".join(["---"] * len(cells))
            if underline:
                lines.append(underline)
            first = False
    if not lines:
        if trs and not w.pad_tables and w.blocks:
            # all-empty table: pending soft break lands on the previous
            # block (same rule as ignore mode)
            w.blocks[-1] = _SoftTailBlock(str(w.blocks[-1]))
        return
    if w.pad_tables:
        # the pad buffer is the plain lines WITH their soft tails (the
        # marker always follows them in the vendored stream); block
        # spacing around the padded table is applied at join time by
        # _PadTableBlock
        w.blocks.append(
            _PadTableBlock("\n".join(_reformat_table([ln + "  " for ln in lines], 1)))
        )
        return
    w.blocks.append(_SoftTailBlock("  \n".join(lines)))


def _render_block_children(n: DomNode, w: _MdWriter) -> None:
    for c in n.children:
        if isinstance(c, str):
            w.emit_data(c)
        else:
            _render_node(c, w)


def html_to_markdown(
    html: str,
    base_url: str = "",
    ignore_links: bool = False,
    ignore_images: bool = False,
    protect_links: bool = False,
    **options,
) -> str:
    """Convert HTML to markdown (single_line_break: one newline between
    blocks; no wrapping unless ``body_width``).  With ``base_url``
    link/image urls are absolutized by proper urljoin, as html2text does
    with baseurl.  ``ignore_links``/``ignore_images``/``protect_links``
    mirror the html2text_options trio the reference exposes
    (markdown_generation_strategy.py:182-186); ``options`` passes the
    extended surface through to :class:`_MdWriter` — body_width,
    escape_snob, ignore_emphasis, emphasis_mark, strong_mark,
    ul_item_mark, unicode_snob, escape_dot/plus/dash — each
    cross-executed byte-identical against the vendored html2text.

    With ``body_width`` > 0 the output switches to html2text's
    two-newline paragraph spacing before wrapping (the vendored config
    notes single_line_break requires body_width 0 — same coupling
    here).

    ``google_doc=True`` switches to the Google-Docs-export dialect
    (style-driven emphasis, margin-left list nesting, soft paragraph
    breaks) rendered by :class:`_GoogleWriter` — a separate linear
    emitter because google marks can legally straddle line breaks,
    which the block writer cannot express."""
    if options.get("google_doc"):
        return _google_markdown(
            html or "", base_url, ignore_links, ignore_images,
            protect_links, options,
        )
    root = parse_dom(html or "")
    w = _MdWriter(base_url, ignore_links, ignore_images, protect_links, **options)
    body = root.find("body") or root
    _render_block_children(body, w)
    w.flush()
    if w.body_width:
        if not w.blocks:
            return ""
        return _optwrap("\n\n".join(w.blocks) + "\n", w.body_width,
                        w.ul_item_mark, w.wrap_links)
    parts = []
    for i, b in enumerate(w.blocks):
        if isinstance(b, _SoftTailBlock) and i < len(w.blocks) - 1:
            parts.append(b + "  ")
        elif isinstance(b, _PadTableBlock):
            # one blank line before the next padded table, two before
            # anything else (including end-of-document) — see
            # _PadTableBlock
            nxt = w.blocks[i + 1] if i + 1 < len(w.blocks) else None
            parts.append(str(b) + ("\n" if isinstance(nxt, _PadTableBlock) else "\n\n"))
        else:
            parts.append(str(b))
    if not w.blocks:
        # the vendored finish() always ends with a newline, so an
        # empty/only-empty-tables document is '\n' — reproduced when a
        # table-mode option selects the vendored dialect; the golden
        # dialect keeps '' for empty input
        return "\n" if w.h2t_tables else ""
    return "\n".join(parts) + "\n"


# ---------------------------------------------------------------------------
# google_doc mode (html2text/__init__.py:79,331-347,477-480,637-668,776-783;
# utils.py:21-160) — the Google-Docs-HTML-export dialect: <style> classes
# resolved per element with parent inheritance, emphasis driven by
# font-weight/font-style/text-decoration/font-family rather than tags,
# paragraph boundaries soft ('  \n') unless the style carries a height,
# flat exported lists re-nested from li margin-left, hide_strikethrough
# silencing line-through runs.  Emphasis marks may straddle pending line
# breaks (e.g. bold-styled <p> closes its '**' AFTER the break its own
# boundary queued), so this mode renders through a linear o()-stream
# emitter with the vendored pending-break/space/drop-white-space state
# rather than the block writer above.  Every behavior here is pinned by
# cross-execution against the vendored package
# (tests/test_markdown_contentfilter.py::test_markdown_google_doc_xcheck).
# ---------------------------------------------------------------------------

_BOLD_STYLE_VALUES = ("bold", "700", "800", "900")  # config.py:45


def _dumb_property_dict(style: str) -> dict:
    """utils.py:21-28 — 'a:b;c:d' → lowercased property map."""
    out = {}
    for part in style.split(";"):
        if ":" in part:
            k, v = part.split(":", 1)
            out[k.strip().lower()] = v.strip().lower()
    return out


def _dumb_css_parser(data: str) -> dict:
    """utils.py:31-54 — selector → property-map, @imports stripped."""
    data += ";"
    idx = data.find("@import")
    while idx != -1:
        data = data[:idx] + data[data.find(";", idx) + 1:]
        idx = data.find("@import")
    pairs = [x.split("{") for x in data.split("}") if "{" in x.strip()]
    try:
        return {a.strip(): _dumb_property_dict(b) for a, b in pairs}
    except ValueError:
        return {}  # malformed css is non-fatal there too


def _element_style(attrs: dict, style_def: dict, parent_style: dict) -> dict:
    """utils.py:57-81 — parent style + matched .classes + inline style."""
    style = parent_style.copy()
    for css_class in (attrs.get("class") or "").split():
        style.update(style_def.get("." + css_class, {}))
    if attrs.get("style"):
        style.update(_dumb_property_dict(attrs["style"]))
    return style


def _google_list_style(style: dict) -> str:
    """utils.py:84-97 — ol unless list-style-type names a bullet form."""
    if style.get("list-style-type") in ("disc", "circle", "square", "none"):
        return "ul"
    return "ol"


def _google_text_emphasis(style: dict) -> list:
    """utils.py:112-127."""
    return [
        style[k]
        for k in ("text-decoration", "font-style", "font-weight")
        if k in style
    ]


def _google_fixed_width_font(style: dict) -> bool:
    """utils.py:130-141."""
    return style.get("font-family", "") in ("courier new", "consolas")


def _list_numbering_start(attrs: dict) -> int:
    """utils.py:144-159."""
    try:
        return int(attrs.get("start")) - 1
    except (TypeError, ValueError):
        return 0


class _GList:
    __slots__ = ("name", "num")

    def __init__(self, name: str, num: int):
        self.name = name
        self.num = num


class _GoogleWriter:
    """Linear o()-stream emitter for google_doc mode.  State and branch
    order transcribed from the vendored handle_tag/handle_data/o trio
    (disclosed transcription, cross-executed byte-identical); dialect
    defaults (emphasis_mark '*', unicode_snob True) and the
    entity-vs-literal UNIFIABLE divergence match the block writer."""

    def __init__(
        self,
        base_url: str = "",
        ignore_links: bool = False,
        ignore_images: bool = False,
        protect_links: bool = False,
        body_width: int = 0,
        escape_snob: bool = False,
        ignore_emphasis: bool = False,
        emphasis_mark: str = "*",
        strong_mark: str = "**",
        ul_item_mark: str = "*",
        unicode_snob: bool = True,
        escape_dot: bool = False,
        escape_plus: bool = False,
        escape_dash: bool = False,
        use_automatic_links: bool = True,
        skip_internal_links: bool = True,
        ignore_mailto_links: bool = False,
        images_to_alt: bool = False,
        default_image_alt: str = "",
        images_as_html: bool = False,
        images_with_size: bool = False,
        open_quote: str = '"',
        close_quote: str = '"',
        mark_code: bool = False,
        hide_strikethrough: bool = False,
        google_list_indent: int = 36,  # config.py:42
    ):
        self.base_url = base_url
        self.ignore_links = ignore_links
        self.ignore_images = ignore_images
        self.protect_links = protect_links
        self.body_width = int(body_width or 0)
        self.escape_snob = escape_snob
        self.ignore_emphasis = ignore_emphasis
        self.emphasis_mark = emphasis_mark
        self.strong_mark = strong_mark
        self.ul_item_mark = ul_item_mark
        self.unicode_snob = unicode_snob
        self.escape_dot = escape_dot
        self.escape_plus = escape_plus
        self.escape_dash = escape_dash
        self.use_automatic_links = use_automatic_links
        self.skip_internal_links = skip_internal_links
        self.ignore_mailto_links = ignore_mailto_links
        self.images_to_alt = images_to_alt
        self.default_image_alt = default_image_alt
        self.images_as_html = images_as_html
        self.images_with_size = images_with_size
        self.open_quote = open_quote
        self.close_quote = close_quote
        self.mark_code = mark_code
        self.hide_strikethrough = hide_strikethrough
        self.google_list_indent = google_list_indent
        # o()-stream state (vendored __init__:100-150)
        self.parts: list[str] = []
        self.lastWasNL = False
        self.p_p = 0
        self.br_toggle = ""
        self.space = False
        self.start = True
        self.quiet = 0
        self.code = False
        self.pre = False
        self.startpre = False
        self.quote = False
        self.drop_white_space = 0
        self.emphasis = 0
        self.list: list[_GList] = []
        self.lastWasList = False
        self.blockquote = 0
        self.inheader = False
        self.stressed = False
        self.preceding_stressed = False
        self.preceding_data = ""
        self.current_tag: str | None = None
        self.maybe_automatic_link: str | None = None
        self.empty_link = False
        self.astack: list[dict | None] = []
        self.style_def: dict = {}
        self.tag_styles: list[dict] = []
        self.split_next_td = False
        self.td_count = 0
        self.table_start = False

    # -- output core (vendored o()/out, :765-876) ---------------------------
    def out(self, d: str) -> None:
        self.parts.append(d)
        if d:
            self.lastWasNL = d[-1] == "\n"

    def pbr(self) -> None:
        if self.p_p == 0:
            self.p_p = 1

    def p(self) -> None:
        self.p_p = 1  # single_line_break dialect (vendored p() :756-758)

    def soft_br(self) -> None:
        self.pbr()
        self.br_toggle = "  "

    def o(self, data: str, puredata: bool = False, force=False) -> None:
        if self.quiet:
            return
        # google drop_white_space: data after an emphasis-start mark is
        # lstripped; ANY non-white output re-arms (:776-783)
        lstripped = data.lstrip()
        if self.drop_white_space and not (self.pre or self.code):
            data = lstripped
        if lstripped != "":
            self.drop_white_space = 0
        if puredata and not self.pre:
            data = re.sub(r"\s+", " ", data)
            if data and data[0] == " ":
                self.space = True
                data = data[1:]
        if not data and not force:
            return
        if self.startpre:
            if not data.startswith("\n") and not data.startswith("\r\n"):
                data = "\n" + data
            if self.mark_code:
                self.out("\n[code]")
                self.p_p = 0
        bq = ">" * self.blockquote
        if not (force and data and data[0] == ">") and self.blockquote:
            bq += " "
        if self.pre:
            if not self.list:
                bq += "    "
            bq += "    " * len(self.list)
            data = data.replace("\n", "\n" + bq)
        if self.startpre:
            self.startpre = False
            if self.list:
                data = data.lstrip("\n")
        if self.start:
            self.space = False
            self.p_p = 0
            self.start = False
        if force == "end":
            self.p_p = 0
            self.out("\n")
            self.space = False
        if self.p_p:
            self.out((self.br_toggle + "\n" + bq) * self.p_p)
            self.space = False
            self.br_toggle = ""
        if self.space:
            if not self.lastWasNL:
                self.out(" ")
            self.space = False
        self.p_p = 0
        self.out(data)

    # -- style-driven emphasis (vendored handle_emphasis :237-307) ----------
    def handle_emphasis(self, start: bool, tag_style: dict, parent_style: dict) -> None:
        tag_emphasis = _google_text_emphasis(tag_style)
        parent_emphasis = _google_text_emphasis(parent_style)
        strikethrough = "line-through" in tag_emphasis and self.hide_strikethrough
        bold = False
        for marker in _BOLD_STYLE_VALUES:
            bold = marker in tag_emphasis and marker not in parent_emphasis
            if bold:
                break
        italic = "italic" in tag_emphasis and "italic" not in parent_emphasis
        fixed = (
            _google_fixed_width_font(tag_style)
            and not _google_fixed_width_font(parent_style)
            and not self.pre
        )
        if start:
            if bold or italic or fixed:
                self.emphasis += 1
            if strikethrough:
                self.quiet += 1
            if italic:
                self.o(self.emphasis_mark)
                self.drop_white_space += 1
            if bold:
                self.o(self.strong_mark)
                self.drop_white_space += 1
            if fixed:
                self.o("`")
                self.drop_white_space += 1
                self.code = True
        else:
            if bold or italic or fixed:
                self.emphasis -= 1
                self.space = False
            if fixed:
                if self.drop_white_space:
                    self.drop_white_space -= 1  # empty emphasis dropped
                else:
                    self.o("`")
                self.code = False
            if bold:
                if self.drop_white_space:
                    self.drop_white_space -= 1
                else:
                    self.o(self.strong_mark)
            if italic:
                if self.drop_white_space:
                    self.drop_white_space -= 1
                else:
                    self.o(self.emphasis_mark)
            if (bold or italic) and not self.emphasis:
                self.o(" ")  # space only after ALL marks close (:305-306)
            if strikethrough:
                self.quiet -= 1

    def google_nest_count(self, style: dict) -> int:
        """vendored :950-961 — margin-left pts // google_list_indent."""
        if "margin-left" in style:
            return int(style["margin-left"][:-2]) // self.google_list_indent
        return 0

    # -- tag dispatch (vendored handle_tag :309-749, google branches) -------
    def handle_tag(self, n: DomNode, tag: str, start: bool,
                   tag_style: dict, parent_style: dict) -> None:
        self.current_tag = tag
        # first thing inside an anchor is a mark-producing tag (:320-328)
        if (
            start
            and self.maybe_automatic_link is not None
            and tag not in ("p", "div", "style", "dl", "dt")
            and (tag != "img" or self.ignore_images)
        ):
            self.o("[")
            self.maybe_automatic_link = None
            self.empty_link = False

        hn_ = _HEADINGS.get(tag, 0)
        if hn_:
            if self.astack:  # header inside a link, found in the wild (:349)
                if start:
                    self.inheader = True
                    if self.parts and self.parts[-1] == "[":
                        self.parts.pop()
                        self.space = False
                        self.o(hn_ * "#" + " ")
                        self.o("[")
                else:
                    self.p_p = 0
                    self.inheader = False
                    return
            else:
                self.p()
                if start:
                    self.inheader = True
                    self.o(hn_ * "#" + " ")
                else:
                    self.inheader = False
                    return  # headers never carry google emphasis (:479)

        if tag in ("p", "div"):
            # google boundary: real break only when the START style has a
            # height; everything else (incl. every close) is soft (:373-377)
            if start and "height" in tag_style:
                self.p()
            else:
                self.soft_br()

        if tag == "br" and start:
            self.o("  \n> " if self.blockquote > 0 else "  \n")

        if tag == "hr" and start:
            self.p()
            self.o("* * *")
            self.p()

        if tag == "body":
            self.quiet = 0  # :409-410

        if tag == "blockquote":
            if start:
                self.p()
                self.o("> ", force=True)
                self.start = True
                self.blockquote += 1
            else:
                self.blockquote -= 1
                self.p()

        if tag in ("em", "i", "u") and not self.ignore_emphasis:
            if (
                start
                and self.preceding_data
                and self.preceding_data[-1] not in string.whitespace
                and self.preceding_data[-1] not in string.punctuation
            ):
                emphasis = " " + self.emphasis_mark
                self.preceding_data += " "
            else:
                emphasis = self.emphasis_mark
            self.o(emphasis)
            if start:
                self.stressed = True

        if tag in ("strong", "b") and not self.ignore_emphasis:
            if (
                start
                and self.preceding_data
                and len(self.strong_mark) > 0
                and self.preceding_data[-1] == self.strong_mark[0]
            ):
                strong = " " + self.strong_mark
                self.preceding_data += " "
            else:
                strong = self.strong_mark
            self.o(strong)
            if start:
                self.stressed = True

        if tag in ("del", "strike", "s"):
            if start and self.preceding_data and self.preceding_data[-1] == "~":
                strike = " ~~"
                self.preceding_data += " "
            else:
                strike = "~~"
            self.o(strike)
            if start:
                self.stressed = True

        if not self.inheader:
            self.handle_emphasis(start, tag_style, parent_style)

        if tag in ("kbd", "code", "tt") and not self.pre:
            self.o("`")
            self.code = not self.code

        if tag == "q":
            self.o(self.open_quote if not self.quote else self.close_quote)
            self.quote = not self.quote

        if tag == "a" and not self.ignore_links:
            if start:
                href = n.get("href")
                if (
                    "href" in n.attrs
                    and href is not None
                    and not (self.skip_internal_links and href.startswith("#"))
                    and not (self.ignore_mailto_links and href.startswith("mailto:"))
                ):
                    a_props = dict(n.attrs)
                    self.astack.append(a_props)
                    self.maybe_automatic_link = href  # pre-protect (:523-525)
                    self.empty_link = True
                    if self.protect_links:
                        a_props["href"] = "<" + href + ">"
                else:
                    self.astack.append(None)
            else:
                if self.astack:
                    a = self.astack.pop()
                    if self.maybe_automatic_link and not self.empty_link:
                        self.maybe_automatic_link = None
                    elif a:
                        if self.empty_link:
                            self.o("[")
                            self.empty_link = False
                            self.maybe_automatic_link = None
                        # inline link form (:541-546)
                        self.p_p = 0
                        title = escape_md(a.get("title") or "")
                        title = ' "{}"'.format(title) if title.strip() else ""
                        url = urljoin(self.base_url, a["href"])
                        self.o("](" + escape_md(url) + title + ")")

        if tag == "img" and start and not self.ignore_images:
            src = n.get("src")
            if "src" in n.attrs and src is not None:
                img_href = src
                alt = n.get("alt") or self.default_image_alt
                if self.images_as_html or (
                    self.images_with_size
                    and ("width" in n.attrs or "height" in n.attrs)
                ):
                    self.o("<img src='" + src + "' ")
                    if "width" in n.attrs and n.get("width") is not None:
                        self.o("width='" + n.get("width") + "' ")
                    if "height" in n.attrs and n.get("height") is not None:
                        self.o("height='" + n.get("height") + "' ")
                    if alt:
                        self.o("alt='" + alt + "' ")
                    self.o("/>")
                    return
                if self.maybe_automatic_link is not None:
                    href = self.maybe_automatic_link
                    if (
                        self.images_to_alt
                        and escape_md(alt) == href
                        and _RE_ABS_URL.match(href)
                    ):
                        self.o("<" + escape_md(alt) + ">")
                        self.empty_link = False
                        return
                    self.o("[")
                    self.maybe_automatic_link = None
                    self.empty_link = False
                if self.images_to_alt:
                    self.o(escape_md(alt))
                else:
                    self.o("![" + escape_md(alt) + "]")
                    self.o("(" + escape_md(urljoin(self.base_url, img_href)) + ")")

        if tag in ("ol", "ul"):
            # google exports flat sibling lists; lastWasList suppresses
            # the blank line between them (:637-646)
            if not self.list and not self.lastWasList:
                self.p()
            if start:
                self.list.append(_GList(
                    _google_list_style(tag_style), _list_numbering_start(n.attrs)
                ))
            else:
                if self.list:
                    self.list.pop()
            self.lastWasList = True
        else:
            self.lastWasList = False

        if tag == "li":
            self.pbr()
            if start:
                li = self.list[-1] if self.list else _GList("ul", 0)
                # re-nest the flat export from li margin-left (:658-660)
                self.o("  " * self.google_nest_count(tag_style))
                if li.name == "ul":
                    self.o(self.ul_item_mark + " ")
                elif li.name == "ol":
                    li.num += 1
                    self.o(str(li.num) + ". ")
                self.start = True

        if tag in ("table", "tr", "td", "th"):
            # plain default table stream ('c1| c2' + '---|---', :705-733);
            # the pad/bypass/ignore family stays a block-writer feature
            if tag == "table" and start:
                self.table_start = True
            if tag in ("td", "th") and start:
                if self.split_next_td:
                    self.o("| ")
                self.split_next_td = True
            if tag == "tr" and start:
                self.td_count = 0
            if tag == "tr" and not start:
                self.split_next_td = False
                self.soft_br()
            if tag == "tr" and not start and self.table_start:
                self.o("|".join(["---"] * self.td_count))
                self.soft_br()
                self.table_start = False
            if tag in ("td", "th") and start:
                self.td_count += 1

        if tag == "pre":
            if start:
                self.startpre = True
                self.pre = True
            else:
                self.pre = False
                if self.mark_code:
                    self.out("\n[/code]")
            self.p()

    # -- data (vendored handle_data :878-925) --------------------------------
    def handle_data(self, data: str) -> None:
        if not data:
            return
        if self.stressed:
            data = data.strip()
            self.stressed = False
            self.preceding_stressed = True
        elif self.preceding_stressed:
            if (
                data
                and _STRESS_NEXT_RE.match(data[0])
                and self.current_tag not in _HEADINGS
                and self.current_tag not in ("a", "code", "pre")
            ):
                data = " " + data
            self.preceding_stressed = False
        if self.maybe_automatic_link is not None:
            href = self.maybe_automatic_link
            if (
                href == data
                and _RE_ABS_URL.match(href)
                and self.use_automatic_links
            ):
                self.o("<" + data + ">")
                self.empty_link = False
                return
            self.o("[")
            self.maybe_automatic_link = None
            self.empty_link = False
        if not self.code and not self.pre:
            if not self.unicode_snob:
                # same documented dialect divergence as _MdWriter.escape:
                # entity-origin is unrecoverable post-DOM, so UNIFIABLE
                # translation applies to ALL text
                data = data.translate(_UNIFIABLE_TRANS)
            data = escape_md_section(
                data, snob=self.escape_snob, escape_dot=self.escape_dot,
                escape_plus=self.escape_plus, escape_dash=self.escape_dash,
            )
        self.preceding_data = data
        self.o(data, puredata=True)

    # -- DOM walk ------------------------------------------------------------
    def walk(self, n: DomNode) -> None:
        tag = n.tag
        if tag in ("script", "noscript", "template", "iframe"):
            return
        if tag == "style":
            # vendored accumulates css as the stream passes it (:897-899)
            self.style_def.update(_dumb_css_parser(n.get_text()))
            return
        if tag == "head":
            # head is quiet there (:396-401); only its styles matter
            self.quiet += 1
            for c in n.children:
                if isinstance(c, DomNode):
                    self.walk(c)
            self.quiet -= 1
            return
        parent_style = self.tag_styles[-1] if self.tag_styles else {}
        tag_style = _element_style(n.attrs, self.style_def, parent_style)
        self.tag_styles.append(tag_style)
        self.handle_tag(n, tag, True, tag_style, parent_style)
        for c in n.children:
            if isinstance(c, str):
                self.handle_data(c)
            else:
                self.walk(c)
        self.tag_styles.pop()
        self.handle_tag(n, tag, False, tag_style, parent_style)

    def finish(self) -> str:
        self.pbr()
        self.o("", force="end")
        return "".join(self.parts)


def _google_markdown(
    html: str,
    base_url: str,
    ignore_links: bool,
    ignore_images: bool,
    protect_links: bool,
    options: dict,
) -> str:
    """Render in google_doc mode.  Accepts the shared option surface;
    options meaningless in this dialect (wrap_links, the table-family
    trio, mark_code aside) are ignored, as the vendored mode ignores
    them.  body_width wrapping reuses the block writer's _optwrap."""
    allowed = {
        "body_width", "escape_snob", "ignore_emphasis", "emphasis_mark",
        "strong_mark", "ul_item_mark", "unicode_snob", "escape_dot",
        "escape_plus", "escape_dash", "use_automatic_links",
        "skip_internal_links", "ignore_mailto_links", "images_to_alt",
        "default_image_alt", "images_as_html", "images_with_size",
        "open_quote", "close_quote", "mark_code", "hide_strikethrough",
        "google_list_indent",
    }
    kw = {k: v for k, v in options.items() if k in allowed}
    w = _GoogleWriter(base_url, ignore_links, ignore_images, protect_links, **kw)
    root = parse_dom(html or "")
    for c in root.children:
        if isinstance(c, DomNode):
            w.walk(c)
        else:
            w.handle_data(c)
    text = w.finish()
    if w.body_width:
        text = _optwrap(text, w.body_width, w.ul_item_mark, True)
    return text


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
    _known = (
        "ignore_links", "ignore_images", "protect_links", "body_width",
        "escape_snob", "ignore_emphasis", "emphasis_mark", "strong_mark",
        "ul_item_mark", "unicode_snob", "escape_dot", "escape_plus",
        "escape_dash", "use_automatic_links", "skip_internal_links",
        "images_to_alt", "default_image_alt", "open_quote", "close_quote",
        "mark_code", "wrap_links", "pad_tables", "bypass_tables",
        "ignore_tables", "ignore_mailto_links", "images_as_html",
        "images_with_size", "google_doc", "hide_strikethrough",
        "google_list_indent",
    )
    opts = {k: v for k, v in (html2text_options or {}).items() if k in _known}
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
