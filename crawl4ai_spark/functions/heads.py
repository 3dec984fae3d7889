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
