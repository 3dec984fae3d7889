"""Structured extraction: regex catalog + JSON-CSS schemas.

Spark-first re-expression of the reference's non-LLM extraction
strategies (extraction_strategy.py):

* **RegexExtractionStrategy** (:1945-2120) — a label→regex catalog
  applied to page text.  Two physical paths:
  - :func:`regex_extract` — the SCALE path: ``regexp_extract_all``
    column expressions, fully JVM-side / whole-stage-codegen'd, one pass
    over the text for all labels (array-of-structs explode).  No Python
    touches a row.
  - :func:`regex_extract_spans` — the PARITY path: Arrow-batched pandas
    UDF running Python ``re.finditer`` with the reference's exact flags
    (IGNORECASE|MULTILINE, :2055) and per-match ``span`` offsets, which
    JVM regex cannot report.
* **JsonCssExtractionStrategy** (:1436-1482 on the
  JsonElementExtractionStrategy base :995-1236) — schema-driven
  hierarchical extraction (baseSelector → fields of type
  text/attribute/html/regex/nested/list/nested_list, transforms,
  defaults) executed per page inside a mapInPandas over the stdlib DOM
  (functions/dom.py).  ``computed`` fields accept Python callables only —
  the reference's ``eval(expression)`` (:1230) is deliberately not
  reproduced (arbitrary-code eval in executors).

All outputs are long-form rows (one row per extracted value) so
downstream grouping/joins stay columnar.
"""

from __future__ import annotations

import json
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.dom import css_select, css_to_xpath, parse_dom, xpath_select, xpath_text

# Built-in pattern catalog — transcribed from
# extraction_strategy.py:2022-2052 (DEFAULT_PATTERNS).
DEFAULT_PATTERNS: dict[str, str] = {
    # Communication
    "email": r"[\w.+-]+@[\w-]+\.[\w.-]+",
    "phone_intl": r"\+?\d[\d .()-]{7,}\d",
    "phone_us": r"\(?\d{3}\)?[ -. ]?\d{3}[ -. ]?\d{4}",
    # Web
    "url": r"https?://[^\s\"'<>]+",
    "ipv4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "ipv6": r"[A-F0-9]{1,4}(?::[A-F0-9]{1,4}){7}",
    # IDs
    "uuid": r"[0-9a-f]{8}-[0-9a-f]{4}-[1-5][0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}",
    # Money / numbers
    "currency": r"(?:USD|EUR|RM|\$|€|£)\s?\d+(?:[.,]\d{2})?",
    "percentage": r"\d+(?:\.\d+)?%",
    "number": r"\b\d{1,3}(?:[,.\s]\d{3})*(?:\.\d+)?\b",
    # Dates / Times
    "date_iso": r"\d{4}-\d{2}-\d{2}",
    "date_us": r"\d{1,2}/\d{1,2}/\d{2,4}",
    "time_24h": r"\b(?:[01]?\d|2[0-3]):[0-5]\d(?:[:.][0-5]\d)?\b",
    # Misc
    "postal_us": r"\b\d{5}(?:-\d{4})?\b",
    "postal_uk": r"\b[A-Z]{1,2}\d[A-Z\d]? ?\d[A-Z]{2}\b",
    "html_color_hex": r"#[0-9A-Fa-f]{6}\b",
    "twitter_handle": r"@[\w]{1,15}",
    "hashtag": r"#[\w-]+",
    "mac_addr": r"(?:[0-9A-Fa-f]{2}:){5}[0-9A-Fa-f]{2}",
    "iban": r"[A-Z]{2}\d{2}[A-Z0-9]{11,30}",
    "credit_card": r"\b(?:4\d{12}(?:\d{3})?|5[1-5]\d{14}|3[47]\d{13}|6(?:011|5\d{2})\d{12})\b",
}


def regex_extract(
    pages: DataFrame,
    patterns: dict[str, str] | list[str],
    text_col: str = "text",
    key_cols: tuple[str, ...] = ("url",),
    case_insensitive: bool = True,
) -> DataFrame:
    """JVM-side catalog extraction → (key..., label, match_idx, value).

    One ``regexp_extract_all`` per label fused into a single projection;
    labels without a match contribute zero rows.  The reference compiles
    with IGNORECASE|MULTILINE — ``(?i)`` is prepended here ((?m) only
    matters for ^/$ anchors, which the catalog doesn't use).
    """
    if isinstance(patterns, list):
        patterns = {k: DEFAULT_PATTERNS[k] for k in patterns}
    text = F.coalesce(F.col(text_col), F.lit(""))
    prefix = "(?i)" if case_insensitive else ""
    per_label = F.array(
        *[
            F.struct(
                F.lit(label).alias("label"),
                F.regexp_extract_all(text, F.lit(prefix + rx), 0).alias("vals"),
            )
            for label, rx in sorted(patterns.items())
        ]
    )
    lab = pages.select(*key_cols, F.explode(per_label).alias("m"))
    return lab.select(
        *key_cols,
        F.col("m.label").alias("label"),
        F.posexplode("m.vals").alias("match_idx", "value"),
    )


REGEX_SPAN_SCHEMA_FIELDS = [
    T.StructField("label", T.StringType()),
    T.StructField("value", T.StringType()),
    T.StructField("span_start", T.IntegerType()),
    T.StructField("span_end", T.IntegerType()),
]


def regex_extract_spans(
    pages: DataFrame,
    patterns: dict[str, str] | list[str],
    text_col: str = "text",
    key_col: str = "url",
) -> DataFrame:
    """Parity path: Python ``re`` with the reference's exact flags and
    span reporting (extraction_strategy.py:2100-2112 output shape)."""
    if isinstance(patterns, list):
        patterns = {k: DEFAULT_PATTERNS[k] for k in patterns}
    schema = T.StructType([T.StructField(key_col, T.StringType())] + REGEX_SPAN_SCHEMA_FIELDS)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cres = {lbl: re.compile(rx, re.IGNORECASE | re.MULTILINE) for lbl, rx in patterns.items()}
        for pdf in batches:
            rows = []
            for key, text in zip(pdf[key_col], pdf[text_col]):
                for lbl, cre in cres.items():
                    for m in cre.finditer(text or ""):
                        rows.append((key, lbl, m.group(0), m.start(), m.end()))
            yield pd.DataFrame(rows, columns=[key_col, "label", "value", "span_start", "span_end"])

    return pages.select(key_col, text_col).mapInPandas(gen, schema)


# ---------------------------------------------------------------------------
# JSON-CSS schema extraction
# ---------------------------------------------------------------------------


def _element_text(node) -> str:
    # BS4 get_text(strip=True): concatenate stripped text nodes
    return node.get_text(separator="", strip=True)


class _CssEngine:
    """JsonCssExtractionStrategy hooks (extraction_strategy.py:1436-1482):
    soupsieve selection, BS4 get_text(strip=True) text."""

    @staticmethod
    def base_elements(root, selector: str) -> list:
        return css_select(root, selector)

    @staticmethod
    def select(element, selector: str) -> list:
        return css_select(element, selector)

    text = staticmethod(_element_text)


class _XPathEngine:
    """JsonXPathExtractionStrategy hooks (extraction_strategy.py:1851-1914):
    raw XPath base selection; nested field selectors go through
    _css_to_xpath (already-XPath selectors pass through) and are made
    relative with a '.' prefix; text is the lxml ``.//text()`` join.
    ``html``-type fields serialize via the stdlib DOM serializer where
    the reference uses lxml etree.tostring — attribute order and
    void-element forms may differ (documented divergence; lxml absent)."""

    @staticmethod
    def base_elements(root, selector: str) -> list:
        return [n for n in xpath_select(root, selector) if not isinstance(n, str)]

    @staticmethod
    def select(element, selector: str) -> list:
        xp = css_to_xpath(selector)
        if not xp.startswith("."):
            xp = "." + xp
        return [n for n in xpath_select(element, xp) if not isinstance(n, str)]

    text = staticmethod(xpath_text)


def _extract_single_field(element, field: dict, engine=_CssEngine):
    """extraction_strategy.py:1126-1165 semantics."""
    if "selector" in field:
        selected = engine.select(element, field["selector"])
        if not selected:
            return field.get("default")
        selected = selected[0]
    else:
        selected = element
    value = None
    ftype = field["type"]
    if ftype == "text":
        value = engine.text(selected)
    elif ftype == "attribute":
        value = selected.get(field["attribute"])
    elif ftype == "html":
        value = selected.outer_html()
    elif ftype == "regex":
        m = re.search(field["pattern"], engine.text(selected))
        value = m.group(1) if m else None
    if "transform" in field:
        # UNCONDITIONAL like the reference (:1163): transforming a None
        # raises, and the enclosing _extract_field try collapses the
        # whole (list) field to its default — pinned divergence surface
        t = field["transform"]
        if t == "lowercase":
            value = value.lower()
        elif t == "uppercase":
            value = value.upper()
        elif t == "strip":
            value = value.strip()
    return value if value is not None else field.get("default")


def _extract_field(element, field: dict, engine=_CssEngine):
    try:
        ftype = field["type"]
        if ftype == "nested":
            nested = engine.select(element, field["selector"])
            return _extract_item(nested[0], field["fields"], engine) if nested else {}
        if ftype == "list":
            els = engine.select(element, field["selector"])
            return [_extract_list_item(el, field["fields"], engine) for el in els]
        if ftype == "nested_list":
            els = engine.select(element, field["selector"])
            return [_extract_item(el, field["fields"], engine) for el in els]
        return _extract_single_field(element, field, engine)
    except Exception:
        return field.get("default")


def _extract_list_item(element, fields: list[dict], engine=_CssEngine) -> dict:
    item = {}
    for field in fields:
        v = _extract_single_field(element, field, engine)
        if v is not None:
            item[field["name"]] = v
    return item


def _extract_item(element, fields: list[dict], engine=_CssEngine) -> dict:
    item = {}
    for field in fields:
        if field["type"] == "computed":
            fn = field.get("function")
            try:
                v = fn(item) if fn else None
            except Exception:
                v = field.get("default")
        else:
            v = _extract_field(element, field, engine)
        if v is not None:
            item[field["name"]] = v
    return item


def _extract_json_schema(html: str, schema: dict, engine) -> list[dict]:
    root = parse_dom(html)
    out = []
    for element in engine.base_elements(root, schema["baseSelector"]):
        item = {}
        for field in schema.get("baseFields", []):
            v = _extract_single_field(element, field, engine)
            if v is not None:
                item[field["name"]] = v
        item.update(_extract_item(element, schema["fields"], engine))
        if item:
            out.append(item)
    return out


def extract_json_css(html: str, schema: dict) -> list[dict]:
    """Single-page JsonCSS extraction (pure Python — also the test/oracle
    entry point)."""
    return _extract_json_schema(html, schema, _CssEngine)


def extract_json_xpath(html: str, schema: dict) -> list[dict]:
    """Single-page JsonXPath extraction: the same schema-driven field
    core as CSS, with the XPath dialect hooks
    (extraction_strategy.py:1851-1914)."""
    return _extract_json_schema(html, schema, _XPathEngine)


JSON_CSS_SCHEMA = T.StructType(
    [
        T.StructField("src_url", T.StringType()),
        T.StructField("item_idx", T.IntegerType()),
        T.StructField("item_json", T.StringType()),
    ]
)


def _json_schema_extract(
    pages: DataFrame, schema: dict, extract_fn, url_col: str, html_col: str
) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf[url_col], pdf[html_col]):
                try:
                    items = extract_fn(html or "", schema)
                except Exception:
                    continue
                for i, item in enumerate(items):
                    rows.append((url, i, json.dumps(item, sort_keys=True, ensure_ascii=False)))
            yield pd.DataFrame(rows, columns=[f.name for f in JSON_CSS_SCHEMA.fields])

    return pages.select(url_col, html_col).mapInPandas(gen, JSON_CSS_SCHEMA)


def json_css_extract(
    pages: DataFrame, schema: dict, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Schema extraction over a pages table → one row per extracted item,
    the item serialized as a canonical (sorted-key) JSON string."""
    return _json_schema_extract(pages, schema, extract_json_css, url_col, html_col)


def json_xpath_extract(
    pages: DataFrame, schema: dict, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """XPath-dialect schema extraction over a pages table — same long-form
    output contract as :func:`json_css_extract`."""
    return _json_schema_extract(pages, schema, extract_json_xpath, url_col, html_col)
