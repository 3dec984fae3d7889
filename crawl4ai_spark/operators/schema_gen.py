"""Schema-generation data plane: HTML reduction + prompt assembly + schema
induction.

Reference surface:

* ``utils.optimize_html`` (utils.py:3045-3061) — truncate every attribute
  value and text/tail node over a threshold.
* ``utils.preprocess_html_for_schema`` (utils.py:3120-3263) — the reducer
  the built-in crawlers run before schema generation
  (crawlers/google_search/crawler.py:73): drop ``<head>`` and
  script/style/media tags, prune attributes to ``{id, class, name, type,
  value}`` + ``data-*``, truncate long attribute values and text nodes,
  drop repeated ``(tag, class, inner-text-hash)`` duplicates keeping the
  first, cap the serialized output at ``max_size``.
* ``JsonElementExtractionStrategy.generate_schema`` /
  ``_build_schema_prompt`` (extraction_strategy.py:1277-1343,1344-1388) —
  assemble a system+user prompt around the reduced HTML (CSS or XPATH
  template; optional query / target-JSON-example sections with three
  mutually-exclusive reminder variants), call the LLM with
  ``json_response=True``, ``json.loads`` the content, and wrap any failure
  in ``Exception("Failed to generate schema: …")``.

Graft notes: the reference reduces with lxml (absent here) — this module
re-expresses the same rules on the package's stdlib DOM
(``functions/dom.py``), where lxml's ``element.text``/``element.tail`` pair
corresponds to the string children of each node (each string child is some
element's text or some sibling's tail), and ``el.itertext()`` is the
in-order string-descendant walk.  The duplicate-detection hash is md5
instead of xxhash64 (the xxhash lib is absent); only signature *equality*
matters, so the kept/dropped set is identical.  Prompt TEXT is this
module's own wording — only the slot structure (template choice, section
order, three-variant reminder) mirrors the reference, same policy as
``operators/llm.py``.

The default "model" is not a stub: ``induce_css_schema`` is a real
deterministic schema inducer (most-repeated ``(tag, class)`` signature →
baseSelector; classed text descendants → fields; hrefs → attribute
fields), so generate→extract closes the loop end-to-end without a model
runtime — and a real LLM drops in via ``completion_fn`` unchanged.
"""

from __future__ import annotations

import hashlib
import json
import re
from collections import Counter
from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions.dom import DomNode, parse_dom
from .extraction import extract_json_css

# ---------------------------------------------------------------------------
# truncate / optimize_html (utils.py:3040-3061)
# ---------------------------------------------------------------------------


def truncate(value: str, threshold: int) -> str:
    """utils.py:3040-3043 — prefix + ``'...'`` above the threshold."""
    if len(value) > threshold:
        return value[:threshold] + "..."
    return value


def _serialize(root: DomNode) -> str:
    """Document serialization (lxml tostring analog on our DOM)."""
    return root.inner_html() if root.tag == "[document]" else root.outer_html()


def optimize_html(html_str: str, threshold: int = 200) -> str:
    """utils.py:3045-3061 — truncate every attribute value and every
    text/tail node above ``threshold``.  Our DOM's string children ARE the
    text/tail nodes, so one pass over them covers both lxml fields."""
    root = parse_dom(html_str)
    for el in [root] + list(root.iter_desc()):
        for attr in list(el.attrs):
            el.attrs[attr] = truncate(el.attrs[attr], threshold)
        el.children = [
            truncate(c, threshold) if isinstance(c, str) else c for c in el.children
        ]
    return _serialize(root)


# ---------------------------------------------------------------------------
# preprocess_html_for_schema (utils.py:3120-3263)
# ---------------------------------------------------------------------------

_TAGS_TO_REMOVE = [
    "script", "style", "noscript", "iframe", "canvas", "svg",
    "video", "audio", "source", "track", "map", "area",
]
_ATTRIBS_TO_KEEP = {"id", "class", "name", "type", "value"}


def _itertext_hash(el: DomNode) -> int:
    """el.itertext() stream hash (utils.py:3205-3207).  md5 instead of
    xxhash64 (lib absent) — equality semantics identical."""
    h = hashlib.md5()
    def walk(n: DomNode) -> None:
        for c in n.children:
            if isinstance(c, str):
                h.update(c.encode())
            else:
                walk(c)
    walk(el)
    return int.from_bytes(h.digest()[:8], "big")


def preprocess_html_for_schema(
    html_content: str,
    text_threshold: int = 100,
    attr_value_threshold: int = 200,
    max_size: int = 100000,
) -> str:
    """HTML reducer for schema generation — rule-for-rule re-expression of
    utils.py:3120-3263 on the stdlib DOM (see module docstring)."""
    try:
        root = parse_dom(html_content)  # comments dropped by the parser

        # 1. remove <head> (utils.py:3140-3143)
        for head in root.find_all("head"):
            head.decompose()

        # 2. remove script/style/media subtrees (utils.py:3146-3156)
        for tag in _TAGS_TO_REMOVE:
            for el in root.find_all(tag):
                if el.parent is not None:
                    el.decompose()

        # 3. prune attributes + truncate attr values and text nodes
        #    (utils.py:3159-3196); root excluded like the getparent() guard
        for el in root.iter_desc():
            for attrib in list(el.attrs):
                if not (attrib in _ATTRIBS_TO_KEEP or attrib.startswith("data-")):
                    el.attrs.pop(attrib)
                elif len(el.attrs[attrib]) > attr_value_threshold:
                    el.attrs[attrib] = el.attrs[attrib][:attr_value_threshold] + "..."
            el.children = [
                (c.strip()[:text_threshold] + "..."
                 if isinstance(c, str) and len(c.strip()) > text_threshold else c)
                for c in el.children
            ]

        # 4. drop repeated (tag, class, text-hash) elements, first kept
        #    (utils.py:3198-3216); snapshot in document order, detached
        #    descendants still processed — both mirror lxml's behavior
        seen: dict = {}
        snapshot = [el for el in root.iter_desc() if el.get("class")]
        for el in snapshot:
            parent = el.parent
            if parent is None:
                continue
            cls = el.get("class")
            if not cls:
                continue
            sig = (el.tag, cls, _itertext_hash(el))
            if sig in seen:
                el.decompose()
            else:
                seen[sig] = None

        # 5. serialize + size cap (utils.py:3252-3259)
        result = _serialize(root)
        if len(result) > max_size:
            return result[:max_size] + "..."
        return result
    except Exception:
        # parsing-error fallback (utils.py:3261-3263)
        return html_content[:max_size] if len(html_content) > max_size else html_content


# ---------------------------------------------------------------------------
# Prompt assembly (_build_schema_prompt, extraction_strategy.py:1344-1388)
# — slot structure mirrored, wording our own
# ---------------------------------------------------------------------------

_SYSTEM_CSS = (
    "You produce extraction schemas for repetitive HTML patterns. "
    "A schema has: name; baseSelector (CSS selector of the repeated "
    "container); baseFields (fields read off the container itself); fields "
    "(fields read from its descendants, each {name, selector, type} plus "
    "type-specific keys such as attribute). Prefer stable selectors; avoid "
    "generated class names; every selector should match exactly one element "
    "within its scope."
)
_SYSTEM_XPATH = _SYSTEM_CSS.replace("CSS selector", "XPath expression")


def build_schema_prompt(
    html: str,
    schema_type: str = "CSS",
    query: Optional[str] = None,
    target_json_example: Optional[str] = None,
) -> str:
    """Assemble the schema-generation prompt: template picked by
    schema_type, fenced HTML block, optional query / example sections, then
    exactly one of three reminder variants (query-only / example-only /
    neither) — the reference's conditional structure
    (extraction_strategy.py:1356-1385)."""
    system = _SYSTEM_CSS if schema_type == "CSS" else _SYSTEM_XPATH
    user = f"HTML to analyze:\n```html\n{html}\n```\n"
    if query:
        user += f"\n## Goal description:\n{query}"
    if target_json_example:
        user += f"\n## Target JSON example:\n```json\n{target_json_example}\n```"
    if query and not target_json_example:
        user += "\nREMINDER: no example object is given - build the best schema from the goal description."
    elif not query and target_json_example:
        user += "\nREMINDER: match the provided example's structure exactly; on mismatches follow the page majority."
    elif not query and not target_json_example:
        user += "\nREMINDER: no query and no example - infer the schema from the repetitive patterns alone."
    user += "\nOutput only the JSON schema."
    return system + "\n\n" + user


# ---------------------------------------------------------------------------
# Deterministic schema inducer (the default completion)
# ---------------------------------------------------------------------------

def _sanitize_name(cls: str) -> str:
    return "".join(ch if ch.isalnum() else "_" for ch in cls.strip().lower()) or "field"


def _classed_signatures(root) -> tuple[list, Counter]:
    """Repeated ``(tag, class)`` signatures in document order + counts."""
    order: list = []
    counts: Counter = Counter()
    for el in root.iter_desc():
        cls = el.get("class")
        if cls:
            sig = (el.tag, cls)
            if sig not in counts:
                order.append(sig)
            counts[sig] += 1
    return order, counts


def _schema_for_signature(root, sig, name: str) -> Optional[dict]:
    """Schema for one container signature: classed descendants with
    direct text become text fields; anchors become a link attribute
    field; ``data-*`` attributes on the container become baseFields."""
    tag, cls = sig
    base_selector = tag + "".join("." + c for c in cls.split())
    first = next(
        el for el in root.iter_desc() if el.tag == tag and el.get("class") == cls
    )
    base_fields = [
        {"name": _sanitize_name(a), "type": "attribute", "attribute": a}
        for a in first.attrs
        if a.startswith("data-")
    ]
    fields: list = []
    names: set = set()
    for d in first.iter_desc():
        dcls = d.get("class")
        if dcls and any(isinstance(c, str) and c.strip() for c in d.children):
            fname = _sanitize_name(dcls.split()[0])
            if fname not in names:
                names.add(fname)
                fields.append(
                    {
                        "name": fname,
                        "type": "text",
                        "selector": d.tag + "".join("." + c for c in dcls.split()),
                    }
                )
        if d.tag == "a" and d.get("href") and "link" not in names:
            names.add("link")
            fields.append(
                {"name": "link", "type": "attribute", "selector": "a", "attribute": "href"}
            )
    if not fields:
        return None
    return {
        "name": name,
        "baseSelector": base_selector,
        "baseFields": base_fields,
        "fields": fields,
    }


def induce_css_schema(html: str, name: str = "induced") -> Optional[dict]:
    """Derive a JsonCss schema from the page itself: the most repeated
    ``(tag, class)`` signature (ties: first in document order, count >= 2)
    becomes baseSelector."""
    root = parse_dom(html)
    order, counts = _classed_signatures(root)
    best = None
    for sig in order:
        if counts[sig] >= 2 and (best is None or counts[sig] > counts[best]):
            best = sig
    if best is None:
        return None
    return _schema_for_signature(root, best, name)


def induce_css_schema_matching(
    html: str, example_keys, name: str = "induced"
) -> Optional[dict]:
    """Example-guided induction (the deterministic analog of handing the
    LLM a target_json_example, extraction_strategy.py:1356-1372): every
    repeated signature is a candidate container; the one whose induced
    field/baseField names best overlap the example's keys wins (ties:
    more repeats, then document order).  Falls back to the plain
    most-repeated rule when nothing overlaps."""
    keys = set(example_keys)
    root = parse_dom(html)
    order, counts = _classed_signatures(root)
    best, best_schema, best_score = None, None, -1
    for sig in order:
        if counts[sig] < 2:
            continue
        schema = _schema_for_signature(root, sig, name)
        if schema is None:
            continue
        got = {f["name"] for f in schema["fields"]} | {
            f["name"] for f in schema["baseFields"]
        }
        score = len(got & keys)
        if score > best_score or (score == best_score and best is not None
                                  and counts[sig] > counts[best]):
            best, best_schema, best_score = sig, schema, score
    # score 0 everywhere → most-repeated candidate that still yields a
    # schema (the plain inducer can land on a field-less signature)
    return best_schema if best_schema is not None else induce_css_schema(html, name)


_EXAMPLE_KEY_RE = re.compile(r'"([A-Za-z_][A-Za-z0-9_]*)"\s*:')


def example_guided_completion(prompt: str) -> str:
    """Disclosed deterministic fake completion for schema generation with
    a target example: re-reads the fenced HTML and the Target JSON
    example out of the prompt, extracts the example's keys by regex (the
    reference's inline examples carry trailing commas, so json.loads is
    not an option — exactly what a tolerant LLM reader does), and
    returns the best-matching induced schema."""
    try:
        html = prompt.split("```html\n", 1)[1].split("\n```", 1)[0]
    except IndexError:
        return "null"
    keys: list = []
    if "## Target JSON example:" in prompt:
        ex = prompt.split("## Target JSON example:", 1)[1]
        ex = ex.split("```json", 1)[1].split("```", 1)[0] if "```json" in ex else ex
        keys = _EXAMPLE_KEY_RE.findall(ex)
    if not keys:
        return json.dumps(induce_css_schema(html))
    return json.dumps(induce_css_schema_matching(html, keys))


def _default_completion(prompt: str) -> str:
    """Disclosed deterministic fake: re-read the fenced HTML out of the
    prompt and induce the schema from it (a real LLM plugs in unchanged)."""
    try:
        html = prompt.split("```html\n", 1)[1].split("\n```", 1)[0]
    except IndexError:
        return "null"
    return json.dumps(induce_css_schema(html))


def generate_schema(
    html: str,
    schema_type: str = "CSS",
    query: Optional[str] = None,
    target_json_example: Optional[str] = None,
    completion_fn: Optional[Callable[[str], str]] = None,
) -> dict:
    """generate_schema parity (extraction_strategy.py:1277-1343): reduced
    HTML → prompt → completion → json.loads, failures wrapped."""
    fn = completion_fn or _default_completion
    prompt = build_schema_prompt(html, schema_type, query, target_json_example)
    try:
        return json.loads(fn(prompt))
    except Exception as e:
        raise Exception(f"Failed to generate schema: {str(e)}")


# ---------------------------------------------------------------------------
# Spark operators — stateless map planes
# ---------------------------------------------------------------------------

_PREP_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("reduced_html", T.StringType()),
        T.StructField("reduced_len", T.IntegerType()),
        T.StructField("optimized_len", T.IntegerType()),
    ]
)


def preprocess_pages(
    pages: DataFrame,
    text_threshold: int = 100,
    attr_value_threshold: int = 200,
    max_size: int = 100000,
    optimize_threshold: int = 200,
) -> DataFrame:
    """Run both reducers per page in one Arrow-batched map (no shuffle)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            reduced = [
                preprocess_html_for_schema(h, text_threshold, attr_value_threshold, max_size)
                for h in pdf["html"]
            ]
            optimized = [optimize_html(h, optimize_threshold) for h in pdf["html"]]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "reduced_html": reduced,
                    "reduced_len": [len(r) for r in reduced],
                    "optimized_len": [len(o) for o in optimized],
                }
            )

    return pages.select("url", "html").mapInPandas(gen, _PREP_SCHEMA)


_GEN_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("schema_json", T.StringType()),
        T.StructField("n_items", T.IntegerType()),
        T.StructField("error", T.StringType()),
    ]
)


def generate_schemas(
    pages: DataFrame,
    completion_fn: Optional[Callable[[str], str]] = None,
    query: Optional[str] = None,
) -> DataFrame:
    """Per-page generate→extract closure: reduce the HTML, induce/complete a
    schema, run it back through the JsonCss extractor, report the schema and
    item count.  Per-row error isolation like the media operators."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                try:
                    reduced = preprocess_html_for_schema(html)
                    schema = generate_schema(reduced, "CSS", query=query, completion_fn=completion_fn)
                    items = extract_json_css(html, schema) if schema else []
                    rows.append(
                        {
                            "url": url,
                            "schema_json": json.dumps(schema, sort_keys=True),
                            "n_items": len(items),
                            "error": None,
                        }
                    )
                except Exception as e:
                    rows.append(
                        {"url": url, "schema_json": None, "n_items": None,
                         "error": f"{type(e).__name__}: {e}"}
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in _GEN_SCHEMA.fields])

    return pages.select("url", "html").mapInPandas(gen, _GEN_SCHEMA)
