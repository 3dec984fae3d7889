"""Site-specific structured crawler graft: Google-search SERP extraction.

Re-expresses the reference's ``GoogleSearchCrawler``
(``crawl4ai/crawlers/google_search/crawler.py``) data plane on Spark:

* ``build_serp_schemas`` mirrors ``_build_schemas`` (crawler.py:68-131):
  the page HTML is reduced once with ``preprocess_html_for_schema``
  (:83), then one ``generate_schema`` call per target section —
  organic / top stories / suggested queries — each guided by a target
  JSON example carrying the same keys the reference's examples name
  (crawler.py:85-123: title/link/snippet/date, title/link/source/date,
  query).  Schemas are cached in the passed dict, the analog of the
  reference's ``~/.crawl4ai/schema/*.json`` file cache (:79-82).  The
  completion is the disclosed deterministic example-guided inducer
  (schema_gen.example_guided_completion); a real LLM plugs in unchanged.
* ``serp_extract`` mirrors ``run``'s
  ``{key: JsonCssExtractionStrategy(schema).run(...)}`` dict
  (crawler.py:59-65) as ONE fused mapInPandas pass: every section's
  schema runs against each page in a single scan — stateless, linear,
  no shuffle (the browser fetch + JS injection that precede this in the
  reference are Playwright-side, out of scope by contract).

The reference's Amazon crawler (crawlers/amazon_product/crawler.py) is a
stub returning a canned string — nothing to graft beyond this machinery,
which its schema bundle would ride verbatim.
"""

from __future__ import annotations

import json
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .extraction import extract_json_css
from .schema_gen import (
    example_guided_completion,
    generate_schema,
    preprocess_html_for_schema,
)

# target sections (crawler.py:85-123) — example keys identical to the
# reference's inline examples; prose is our own wording
SERP_TARGETS = {
    "organic_schema": {
        "target_json_example": '{\n"title": "...",\n"link": "...",\n"snippet": "...",\n"date": "1 hour ago",\n}',
        "query": "Find the repeated organic search result item; capture title, link, snippet text and date.",
    },
    "top_stories_schema": {
        "target_json_example": '{\n"title": "...",\n"link": "...",\n"source": "Insider Monkey",\n"date": "1 hour ago",\n}',
        "query": "Find the repeated top-story item; capture title, link, source and date.",
    },
    "suggested_query_schema": {
        "target_json_example": '{\n"query": "A for Apple",\n}',
        "query": "Find each suggested query in the people-also-search-for section.",
    },
}


def build_serp_schemas(
    html: str,
    cache: Optional[dict] = None,
    completion_fn=example_guided_completion,
) -> dict:
    """One schema per SERP section from a representative page.  Like the
    reference, schemas come from the REDUCED html and are cached so the
    induction cost is paid once per site layout, not per page — the
    correct shape at 10^10 pages, where this runs driver-side once and
    the schemas broadcast with the extraction closure."""
    cache = cache if cache is not None else {}
    reduced = preprocess_html_for_schema(html)
    out = {}
    for key, target in SERP_TARGETS.items():
        if key not in cache:
            cache[key] = generate_schema(
                reduced,
                query=target["query"],
                target_json_example=target["target_json_example"],
                completion_fn=completion_fn,
            )
        out[key] = cache[key]
    return out


SERP_ITEM_SCHEMA = T.StructType(
    [
        T.StructField("src_url", T.StringType()),
        T.StructField("section", T.StringType()),
        T.StructField("item_idx", T.IntegerType()),
        T.StructField("item_json", T.StringType()),
    ]
)


def serp_extract(
    pages: DataFrame,
    schemas: dict,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """All sections extracted in one stateless pass over the pages —
    (src_url, section, item_idx, item_json) with canonical sorted-key
    JSON, matching the extraction core's output convention."""
    items = sorted(schemas.items())  # deterministic section order

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf[url_col], pdf[html_col]):
                for section, schema in items:
                    if not schema:
                        continue
                    for idx, item in enumerate(extract_json_css(html, schema)):
                        rows.append(
                            (url, section, idx, json.dumps(item, sort_keys=True))
                        )
            yield pd.DataFrame(rows, columns=[f.name for f in SERP_ITEM_SCHEMA.fields])

    return pages.select(url_col, html_col).mapInPandas(gen, SERP_ITEM_SCHEMA)
