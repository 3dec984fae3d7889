"""Head-metadata parsing (`_parse_head`, async_url_seeder.py:186-256).

The seeder's HEAD-peek stage parses the <head> fragment into structured
data: first <title> text, charset, a meta map keyed by
name|property|http-equiv (lowercased, later keys overwrite), link
entries grouped per rel value (space-separated rels fan out), JSON-LD
script payloads, and the <html lang> attribute.  This module transcribes
the lxml path of that function onto the stdlib DOM and exposes it as a
vectorized operator — the upstream producer for every head-table
consumer in the engine (head BM25, SEO scoring, link preview,
cache-freshness fingerprints).
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .dom import DomNode, parse_dom


def _leading_text(node: DomNode) -> str:
    """lxml ``el.text``: the text before the first child element."""
    out = []
    for c in node.children:
        if isinstance(c, str):
            out.append(c)
        else:
            break
    return "".join(out)


def parse_head(src: str) -> dict:
    """_parse_head (lxml path, :188-231) on the stdlib DOM."""
    root = parse_dom(src or "")
    title_el = root.find("title")
    info: dict = {
        "title": (_leading_text(title_el) or "").strip() if title_el is not None else None,
        "charset": None,
        "meta": {},
        "link": {},
        "jsonld": [],
        "lang": "",
    }
    for el in root.find_all("meta"):
        k = el.get("name") or el.get("property") or el.get("http-equiv")
        if k:
            info["meta"][k.lower()] = el.get("content") or ""
        elif "charset" in el.attrs:
            # html.parser yields None for valueless attrs; lxml gives ""
            info["charset"] = (el.attrs["charset"] or "").lower()
    for el in root.find_all("link"):
        rel_attr = el.get("rel") or ""
        if not rel_attr:
            continue
        entry = {
            a: (el.attrs[a] or "")
            for a in ("href", "as", "type", "hreflang")
            if a in el.attrs
        }
        for rel in rel_attr.lower().split():
            info["link"].setdefault(rel, []).append(entry)
    for script in root.find_all("script"):
        if (script.get("type") or "") == "application/ld+json":
            text = script.get_text()
            if text:
                try:
                    info["jsonld"].append(json.loads(text.strip()))
                except json.JSONDecodeError:
                    pass
    html_el = root.find("html")
    if html_el is not None:
        info["lang"] = html_el.get("lang") or ""
    return info


HEAD_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("charset", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("keywords", T.StringType()),
        T.StructField("robots_meta", T.StringType()),
        T.StructField("canonical", T.StringType()),
        T.StructField("n_jsonld", T.IntegerType()),
        T.StructField("meta_json", T.StringType()),
        T.StructField("link_json", T.StringType()),
    ]
)


def parse_heads(
    pages: DataFrame, url_col: str = "url", html_col: str = "head_html"
) -> DataFrame:
    """Vectorized head parse → flattened hot fields (description /
    keywords / robots / canonical) + canonical-JSON maps for the rest."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf[url_col], pdf[html_col]):
                h = parse_head(html)
                canon = (h["link"].get("canonical") or [{}])[0].get("href")
                rows.append(
                    (
                        url,
                        h["title"],
                        h["charset"],
                        h["lang"],
                        h["meta"].get("description"),
                        h["meta"].get("keywords"),
                        h["meta"].get("robots"),
                        canon,
                        len(h["jsonld"]),
                        json.dumps(h["meta"], sort_keys=True, ensure_ascii=False),
                        json.dumps(h["link"], sort_keys=True, ensure_ascii=False),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in HEAD_SCHEMA.fields])

    return pages.select(url_col, html_col).mapInPandas(gen, HEAD_SCHEMA)


# ---------------------------------------------------------------------------
# Head fingerprint for cache freshness (utils.py compute_head_fingerprint)
# ---------------------------------------------------------------------------
#
# The reference hashes a '|'-joined list of change signals scraped from the
# lowered <head> (title + seven name/property metas, each tried in both
# attribute orders) with xxhash64 (utils.py:2966-3038) and compares the
# result for EQUALITY against the cached fingerprint
# (async_webcrawler.py:273-315, cache_context.py).  The xxhash lib is absent
# here, so the graft substitutes md5 — fingerprints are opaque equality
# tokens, so the kept/invalidated set is identical (same substitution as the
# dedup signature hash in operators/schema_gen.py).  Everything below title
# extraction runs JVM-side: the signal scrape is pure regex, expressed with
# rlike guards so an *empty* content="" still counts as a matched signal,
# exactly like the reference's `if match` check.

_FP_META_TAGS = [
    ("name", "description"),
    ("name", "last-modified"),
    ("property", "og:title"),
    ("property", "og:description"),
    ("property", "og:image"),
    ("property", "og:updated_time"),
    ("property", "article:modified_time"),
]

_FP_TITLE_PAT = r"(?s)<title[^>]*>(.*?)</title>"


def _fp_meta_pats(attr_type: str, attr_value: str) -> tuple[str, str]:
    import re as _re

    v = _re.escape(attr_value)
    p1 = rf'<meta[^>]*{attr_type}=["\']{v}["\'][^>]*content=["\']([^"\']*)["\']'
    p2 = rf'<meta[^>]*content=["\']([^"\']*)["\'][^>]*{attr_type}=["\']{v}["\']'
    return p1, p2


def head_fingerprint_expr(head):
    """Column expression: md5 fingerprint of the head's change signals
    ('' when no signal is present, like the reference's empty return)."""
    from pyspark.sql import functions as F

    def _strip(c):
        return F.regexp_replace(c, r"^\s+|\s+$", "")

    low = F.lower(head)
    sigs = [F.when(low.rlike(_FP_TITLE_PAT), _strip(F.regexp_extract(low, _FP_TITLE_PAT, 1)))]
    for attr_type, attr_value in _FP_META_TAGS:
        p1, p2 = _fp_meta_pats(attr_type, attr_value)
        sigs.append(
            F.when(low.rlike(p1), _strip(F.regexp_extract(low, p1, 1)))
            .when(low.rlike(p2), _strip(F.regexp_extract(low, p2, 1)))
        )
    present = F.filter(F.array(*sigs), lambda x: x.isNotNull())
    return (
        F.when(head.isNull() | (head == F.lit("")), F.lit(""))
        .when(F.size(present) == 0, F.lit(""))
        .otherwise(F.md5(F.array_join(present, "|")))
    )


def head_fingerprint_py(head_html: str) -> str:
    """Pure-Python mirror of head_fingerprint_expr (oracle replay twin);
    same signal walk as the reference, md5 in place of xxhash64."""
    import hashlib
    import re as _re

    if not head_html:
        return ""
    head_lower = head_html.lower()
    signals = []
    m = _re.search(r"<title[^>]*>(.*?)</title>", head_lower, _re.DOTALL)
    if m:
        signals.append(m.group(1).strip())
    for attr_type, attr_value in _FP_META_TAGS:
        for pat in _fp_meta_pats(attr_type, attr_value):
            m = _re.search(pat, head_lower)
            if m:
                signals.append(m.group(1).strip())
                break
    if not signals:
        return ""
    return hashlib.md5("|".join(signals).encode()).hexdigest()
