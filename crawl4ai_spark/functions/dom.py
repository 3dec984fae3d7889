"""Minimal DOM on stdlib html.parser — the tree substrate for the
content filters (content_filter_strategy.py semantics), the markdown
generator (markdown_generation_strategy.py) and JSON-CSS structured
extraction (extraction_strategy.py:1436).

The reference builds these on BeautifulSoup/lxml (C extensions absent
from this container); this module provides the small slice of the tree
API those algorithms actually use — get_text / inner-HTML serialization
/ find_all / a CSS-selector subset — as plain Python executed inside
Arrow-batched pandas UDFs.  Everything here is per-row and stateless, so
it scales linearly with executors.

Supported CSS subset (the shapes the reference's schemas/tests use):
tag, ``.class``, ``#id``, ``[attr]``, ``[attr=value]`` (quoted or bare),
compound simple selectors (``div.item#x[data-k='v']``), descendant
(whitespace) and child (``>``) combinators, ``:nth-child(n)``, and
comma-separated groups.
"""

from __future__ import annotations

import re
from html import escape
from html.parser import HTMLParser

VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
}

# elements whose end tag auto-closes an open sibling of the same kind
_AUTOCLOSE_SIBLING = {"li", "option", "tr", "td", "th", "p", "dt", "dd"}


class DomNode:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict | None = None, parent: "DomNode | None" = None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list = []  # DomNode | str (text nodes)
        self.parent = parent

    # -- traversal ---------------------------------------------------------
    def iter_desc(self):
        for c in self.children:
            if isinstance(c, DomNode):
                yield c
                yield from c.iter_desc()

    def element_children(self) -> list["DomNode"]:
        return [c for c in self.children if isinstance(c, DomNode)]

    def find(self, tag: str) -> "DomNode | None":
        for n in self.iter_desc():
            if n.tag == tag:
                return n
        return None

    def find_all(self, tag: str, recursive: bool = True) -> list["DomNode"]:
        if recursive:
            return [n for n in self.iter_desc() if n.tag == tag]
        return [c for c in self.element_children() if c.tag == tag]

    # -- text --------------------------------------------------------------
    def get_text(self, separator: str = "", strip: bool = False) -> str:
        parts: list[str] = []

        def walk(n: DomNode):
            for c in n.children:
                if isinstance(c, str):
                    s = c.strip() if strip else c
                    if s:
                        parts.append(s)
                else:
                    walk(c)

        walk(self)
        return separator.join(parts)

    @property
    def string(self) -> str | None:
        """BS4 ``.string``: the single string descendant, or None when the
        node has several children."""
        kids = [c for c in self.children if not (isinstance(c, str) and c == "")]
        if len(kids) != 1:
            return None
        c = kids[0]
        return c if isinstance(c, str) else c.string

    # -- serialization -----------------------------------------------------
    def inner_html(self) -> str:
        return "".join(
            c if isinstance(c, str) else c.outer_html() for c in self.children
        )

    def outer_html(self) -> str:
        a = "".join(f' {k}="{escape(str(v), quote=True)}"' for k, v in self.attrs.items())
        if self.tag in VOID_TAGS and not self.children:
            return f"<{self.tag}{a}>"
        return f"<{self.tag}{a}>{self.inner_html()}</{self.tag}>"

    # -- mutation ----------------------------------------------------------
    def decompose(self) -> None:
        if self.parent is not None:
            self.parent.children = [c for c in self.parent.children if c is not self]
            self.parent = None

    # -- attr helpers ------------------------------------------------------
    def get(self, name: str, default=None):
        return self.attrs.get(name, default)

    def classes(self) -> list[str]:
        return (self.attrs.get("class") or "").split()

    def __repr__(self):  # pragma: no cover
        return f"<DomNode {self.tag} {self.attrs}>"


class _DomBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = DomNode("[document]")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        cur = self.stack[-1]
        if tag in _AUTOCLOSE_SIBLING and cur.tag == tag:
            self.stack.pop()
            cur = self.stack[-1]
        node = DomNode(tag, dict(attrs), cur)
        cur.children.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        tag = tag.lower()
        cur = self.stack[-1]
        cur.children.append(DomNode(tag, dict(attrs), cur))

    def handle_endtag(self, tag):
        tag = tag.lower()
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignore

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_dom(html: str) -> DomNode:
    b = _DomBuilder()
    try:
        b.feed(html or "")
        b.close()
    except Exception:
        pass
    return b.root


def ensure_body(root: DomNode) -> DomNode:
    """The reference wraps body-less fragments in a <body> before
    filtering (content_filter_strategy.py:461-463, 644-646)."""
    body = root.find("body")
    if body is not None:
        return body
    body = DomNode("body")
    html_node = root.find("html")
    host = html_node if html_node is not None else root
    body.children = list(host.children)
    for c in body.children:
        if isinstance(c, DomNode):
            c.parent = body
    host.children = [body]
    body.parent = host
    return body


# ---------------------------------------------------------------------------
# CSS selector subset
# ---------------------------------------------------------------------------

_SIMPLE_RE = re.compile(
    r"""
    (?P<tag>[A-Za-z][\w-]*|\*)?
    (?P<rest>(?:\#[\w-]+|\.[\w-]+|\[[^\]]+\]|:nth-child\(\d+\))*)
    """,
    re.X,
)
_PART_RE = re.compile(r"\#[\w-]+|\.[\w-]+|\[[^\]]+\]|:nth-child\(\d+\)")


class _Simple:
    __slots__ = ("tag", "ids", "cls", "attrs", "nth")

    def __init__(self, src: str):
        m = _SIMPLE_RE.match(src)
        if not m or (m.end() != len(src)):
            raise ValueError(f"unsupported selector: {src!r}")
        self.tag = (m.group("tag") or "*").lower()
        self.ids: list[str] = []
        self.cls: list[str] = []
        self.attrs: list[tuple[str, str | None]] = []
        self.nth: int | None = None
        for part in _PART_RE.findall(m.group("rest") or ""):
            if part.startswith("#"):
                self.ids.append(part[1:])
            elif part.startswith("."):
                self.cls.append(part[1:])
            elif part.startswith("[") :
                inner = part[1:-1]
                if "=" in inner:
                    k, v = inner.split("=", 1)
                    # [attr^=v] / *= / $= / ~= / |= are NOT supported —
                    # raise like other unsupported syntax instead of
                    # silently parsing a literal attr named 'href^'
                    if k and k[-1] in "^*$~|":
                        raise ValueError(f"unsupported selector: {src!r}")
                    v = v.strip("\"'")
                    self.attrs.append((k.strip(), v))
                else:
                    self.attrs.append((inner.strip(), None))
            else:  # :nth-child(n)
                self.nth = int(part[part.index("(") + 1 : -1])

    def matches(self, node: DomNode) -> bool:
        if self.tag != "*" and node.tag != self.tag:
            return False
        if self.ids and node.attrs.get("id") not in self.ids:
            return False
        ncls = set(node.classes())
        if any(c not in ncls for c in self.cls):
            return False
        for k, v in self.attrs:
            if k not in node.attrs:
                return False
            if v is not None and node.attrs.get(k) != v:
                return False
        if self.nth is not None:
            parent = node.parent
            if parent is None:
                return False
            sibs = parent.element_children()
            if self.nth < 1 or self.nth > len(sibs) or sibs[self.nth - 1] is not node:
                return False
        return True


_COMBINATORS = {">": "child", "~": "sib", "+": "adj"}


def _selector_tokens(part: str) -> list[str]:
    """Split one selector group into simple-selector and combinator
    tokens, bracket-aware: whitespace and combinator characters inside
    ``[attr='a > b']`` belong to the attribute value, not the chain."""
    toks: list[str] = []
    buf: list[str] = []
    depth = 0
    for ch in part:
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth = max(0, depth - 1)
        if depth == 0 and (ch.isspace() or ch in _COMBINATORS):
            if buf:
                toks.append("".join(buf))
                buf = []
            if ch in _COMBINATORS:
                toks.append(ch)
            continue
        buf.append(ch)
    if buf:
        toks.append("".join(buf))
    return toks


def _compile_selector(selector: str) -> list[list[tuple[str, _Simple]]]:
    """Returns selector groups; each group is [(combinator, simple)] where
    combinator is 'desc', 'child', 'sib' (~) or 'adj' (+) — 'desc' for
    the first unit."""
    groups = []
    for part in selector.split(","):
        toks = _selector_tokens(part)
        units: list[tuple[str, _Simple]] = []
        comb = "desc"
        for tok in toks:
            if tok in _COMBINATORS:
                comb = _COMBINATORS[tok]
                continue
            units.append((comb, _Simple(tok)))
            comb = "desc"
        if units:
            groups.append(units)
    return groups


def css_select(scope: DomNode, selector: str) -> list[DomNode]:
    """All descendant elements of ``scope`` matching the selector, in
    document order (BeautifulSoup ``.select`` semantics: the RESULT set
    is restricted to descendants of ``scope``, but combinator ancestors
    may match anywhere up the tree — including ``scope`` itself — so a
    nested field selector that restates the base selector still
    matches, exactly as soupsieve resolves it)."""
    groups = _compile_selector(selector)
    out: list[DomNode] = []
    seen: set[int] = set()
    for node in scope.iter_desc():
        for units in groups:
            if _matches_chain(node, units, scope):
                if id(node) not in seen:
                    seen.add(id(node))
                    out.append(node)
                break
    return out


def _matches_chain(node: DomNode, units: list[tuple[str, _Simple]], scope: DomNode) -> bool:
    comb, simple = units[-1]
    if not simple.matches(node):
        return False
    rest = units[:-1]
    if not rest:
        return True
    if comb == "child":
        p = node.parent
        if p is None:
            return False
        return _matches_chain(p, rest, scope)
    if comb in ("sib", "adj"):
        p = node.parent
        if p is None:
            return False
        sibs = p.element_children()
        i = sibs.index(node)
        if comb == "adj":
            return i > 0 and _matches_chain(sibs[i - 1], rest, scope)
        return any(_matches_chain(s, rest, scope) for s in sibs[:i])
    # descendant: ancestors are unrestricted (scope included) — only the
    # final matched node is scope-bounded, by the caller's iteration
    p = node.parent
    while p is not None:
        if _matches_chain(p, rest, scope):
            return True
        p = p.parent
    return False


# ---------------------------------------------------------------------------
# XPath subset (JsonXPathExtractionStrategy substrate,
# extraction_strategy.py:1851-1914 — lxml absent from this container, so
# the slice of XPath the reference's schemas exercise is evaluated over
# the same stdlib DOM the CSS strategy uses)
# ---------------------------------------------------------------------------
#
# Supported: ``/`` (child) and ``//`` (descendant) steps from the scope
# node, optional leading ``.`` (relative — the reference prefixes nested
# field selectors with ``.``), node tests ``tag`` | ``*`` | ``text()``,
# and predicates ``[@attr]``, ``[@attr='v']``, ``[n]`` (1-based position,
# applied per parent context exactly like the formal
# ``/descendant-or-self::node()/child::t[n]`` expansion), and
# ``[contains(@attr,'v')]``.  Predicates apply sequentially
# (``[@a][2]`` = 2nd among the @a-matches).  Anything outside the subset
# — explicit axes, functions other than contains, ``|`` unions, a CSS
# selector that only LOOKS like XPath (``//span.price``) — raises
# ValueError, which the extraction layer's per-field try maps to the
# field default: the same observable behavior as lxml's XPathEvalError
# in the reference.

# no '.' in names: a CSS class selector leaking in ('span.price') must
# fail at parse like lxml's XPathEvalError does in the reference
_XP_NAME = r"[A-Za-z_][A-Za-z0-9_-]*"
_XP_STEP_RE = re.compile(r"(//|/)([^/\[]+?)((?:\[[^\]]*\])*)(?=/|$)")
_XP_TEST_RE = re.compile(rf"^(\*|{_XP_NAME}|text\(\))$")
_XP_PRED_ATTR_EQ = re.compile(rf"^@({_XP_NAME})\s*=\s*(\"([^\"]*)\"|'([^']*)')$")
_XP_PRED_ATTR = re.compile(rf"^@({_XP_NAME})$")
_XP_PRED_CONTAINS = re.compile(
    rf"^contains\(\s*@({_XP_NAME})\s*,\s*(\"([^\"]*)\"|'([^']*)')\s*\)$"
)


def _xp_pred(src: str):
    """Compile one predicate → callable(node, pos1) -> bool."""
    p = src.strip()
    if p.isdigit():
        want = int(p)
        return lambda node, pos: pos == want
    m = _XP_PRED_ATTR_EQ.match(p)
    if m:
        k, v = m.group(1), m.group(3) if m.group(3) is not None else m.group(4)
        return lambda node, pos: isinstance(node, DomNode) and node.attrs.get(k) == v
    m = _XP_PRED_ATTR.match(p)
    if m:
        k = m.group(1)
        return lambda node, pos: isinstance(node, DomNode) and k in node.attrs
    m = _XP_PRED_CONTAINS.match(p)
    if m:
        k, v = m.group(1), m.group(3) if m.group(3) is not None else m.group(4)
        return lambda node, pos: (
            isinstance(node, DomNode) and v in (node.attrs.get(k) or "")
        )
    raise ValueError(f"unsupported xpath predicate: {src!r}")


def _xp_parse(expr: str) -> list[tuple[str, str, list]]:
    """Parse the expression into [(axis, nodetest, [predicates])]."""
    e = (expr or "").strip()
    if e.startswith("."):
        e = e[1:]
    if not e:
        raise ValueError(f"unsupported xpath: {expr!r}")
    if not e.startswith("/"):
        e = "/" + e  # bare 'div/span' = relative child steps
    steps, pos = [], 0
    for m in _XP_STEP_RE.finditer(e):
        if m.start() != pos:
            raise ValueError(f"unsupported xpath: {expr!r}")
        pos = m.end()
        test = m.group(2).strip()
        if not _XP_TEST_RE.match(test):
            raise ValueError(f"unsupported xpath node test: {test!r} in {expr!r}")
        preds = [_xp_pred(p) for p in re.findall(r"\[([^\]]*)\]", m.group(3))]
        if test == "text()" and preds:
            raise ValueError(f"unsupported xpath: predicates on text() in {expr!r}")
        steps.append(("desc" if m.group(1) == "//" else "child", test, preds))
    if pos != len(e):
        raise ValueError(f"unsupported xpath: {expr!r}")
    return steps


def xpath_select(scope: DomNode, expr: str) -> list:
    """Nodes matching the XPath-subset expression with ``scope`` as the
    context node.  Returns DomNodes, or raw strings for a final
    ``text()`` step.  Results are deduplicated in first-reached order
    (document order for the subset's non-overlapping step shapes)."""
    steps = _xp_parse(expr)
    current: list = [scope]
    for si, (axis, test, preds) in enumerate(steps):
        if test == "text()":
            if si != len(steps) - 1:
                raise ValueError(f"unsupported xpath: text() mid-path in {expr!r}")
            out: list[str] = []
            for ctx in current:
                if not isinstance(ctx, DomNode):
                    continue
                if axis == "desc":
                    _collect_text(ctx, out)
                else:
                    out.extend(c for c in ctx.children if isinstance(c, str))
            return out
        nxt: list[DomNode] = []
        seen: set[int] = set()
        for ctx in current:
            if not isinstance(ctx, DomNode):
                continue
            # //t == /descendant-or-self::node()/child::t — positional
            # predicates therefore bind per intermediate parent
            inters = [ctx, *ctx.iter_desc()] if axis == "desc" else [ctx]
            for inter in inters:
                cands = [
                    c for c in inter.element_children()
                    if test == "*" or c.tag == test
                ]
                for pred in preds:
                    cands = [c for i, c in enumerate(cands, 1) if pred(c, i)]
                for c in cands:
                    if id(c) not in seen:
                        seen.add(id(c))
                        nxt.append(c)
        current = nxt
    return current


def _collect_text(node: DomNode, out: list[str]) -> None:
    for c in node.children:
        if isinstance(c, str):
            out.append(c)
        else:
            _collect_text(c, out)


def xpath_text(node: DomNode) -> str:
    """lxml ``"".join(element.xpath(".//text()")).strip()`` semantics
    (extraction_strategy.py:1906-1907): raw text nodes joined unstripped,
    then end-stripped once — NOT BS4's per-node get_text(strip=True)."""
    parts: list[str] = []
    _collect_text(node, parts)
    return "".join(parts).strip()


def css_to_xpath(css_selector: str) -> str:
    """JsonXPathExtractionStrategy._css_to_xpath transcription
    (extraction_strategy.py:1885-1901): a selector containing ``/`` is
    already XPath; otherwise the BASIC conversion — ``a > b`` →
    ``//a/b``, ``a b`` → ``//a//b``, else ``//sel``.  Deliberately lossy
    exactly like the reference: ``span.price`` becomes the invalid XPath
    ``//span.price``, which fails loudly at evaluation and collapses the
    field to its default."""
    if "/" in css_selector:
        return css_selector
    if " > " in css_selector:
        return "//" + "/".join(css_selector.split(" > "))
    if " " in css_selector:
        return "//" + "//".join(css_selector.split(" "))
    return "//" + css_selector
