"""Site-specific structured crawler graft: Amazon product-card extraction.

The reference ships two site-specific crawlers under ``crawl4ai/crawlers``.
The google_search one (grafted in :mod:`serp`) carries a real induction +
extraction pipeline; the amazon_product one
(``crawl4ai/crawlers/amazon_product/crawler.py``) is a hub STUB — its
``run()`` returns a canned JSON string — but its ``__meta__`` declares the
product schema contract and the repository's own example
(``docs/examples/amazon_product_extraction_direct_url.py``) ships the
REAL product-card JsonCSS schema the crawler is meant to bundle.  This
module grafts both:

* :data:`AMAZON_META` / :func:`amazon_run_stub` — the hub crawler's
  contract surface, transcribed (crawler.py:3-14) and cross-checked
  against the reference file in tests.
* :data:`AMAZON_PRODUCT_SCHEMA` — the example's JsonCSS product-card
  schema verbatim (docs/examples/amazon_product_extraction_direct_url.py:
  20-76), run through the SAME extraction core as every other JsonCSS
  schema (operators/extraction.py), cached driver-side like the SERP
  schemas — induction is unnecessary because the reference publishes the
  schema explicitly.
* :func:`extract_amazon_products` — ONE fused mapInPandas pass over the
  pages: stateless, linear, no shuffle; the Playwright fetch plane that
  precedes it in the reference is out of scope by contract.

Pinned reference-parity quirks (extraction_strategy.py:1126-1165):

* ``asin`` uses ``"selector": ""`` — soupsieve raises on the empty
  selector, the per-field try maps it to the default ⇒ the field is
  absent from every item (our engine returns no match for it; same
  observable result).
* ``sponsored`` uses ``"type": "exists"`` — not a branch the reference
  core implements, so the value stays None ⇒ absent.
* ``delivery_info`` sets ``"multiple": True`` — ignored by the core,
  which returns the FIRST match's text.
* ``reviews_count``'s general-sibling combinator (``~``) is part of the
  CSS subset (functions/dom.py) specifically so this schema extracts it.
"""

from __future__ import annotations

import json
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .extraction import extract_json_css

# hub crawler contract (crawlers/amazon_product/crawler.py:3-8), values
# transcribed exactly; tests cross-check them against the reference file
AMAZON_META = {
    "version": "1.2.0",
    "tested_on": ["amazon.com"],
    "rate_limit": "50 RPM",
    "schema": {"product": ["name", "price"]},
}

# the canned payload the stub crawler's run() returns (crawler.py:14)
AMAZON_STUB_RESULT = '{"product": {"name": "Test Amazon Product"}}'


def amazon_run_stub(url: str) -> str:
    """Parity twin of ``AmazonProductCrawler.run`` (crawler.py:11-19):
    the reference logs and returns the canned product JSON regardless of
    the URL (its error envelope is unreachable — nothing in the try can
    raise).  Kept so a reference user's hub call has a lookalike."""
    return AMAZON_STUB_RESULT


# the product-card schema bundle, verbatim from the reference's example
# (docs/examples/amazon_product_extraction_direct_url.py:20-76)
AMAZON_PRODUCT_SCHEMA = {
    "name": "Amazon Product Search Results",
    "baseSelector": "[data-component-type='s-search-result']",
    "fields": [
        {"name": "asin", "selector": "", "type": "attribute", "attribute": "data-asin"},
        {"name": "title", "selector": "h2 a span", "type": "text"},
        {"name": "url", "selector": "h2 a", "type": "attribute", "attribute": "href"},
        {"name": "image", "selector": ".s-image", "type": "attribute", "attribute": "src"},
        {"name": "rating", "selector": ".a-icon-star-small .a-icon-alt", "type": "text"},
        {
            "name": "reviews_count",
            "selector": "[data-csa-c-func-deps='aui-da-a-popover'] ~ span span",
            "type": "text",
        },
        {"name": "price", "selector": ".a-price .a-offscreen", "type": "text"},
        {
            "name": "original_price",
            "selector": ".a-price.a-text-price .a-offscreen",
            "type": "text",
        },
        {"name": "sponsored", "selector": ".puis-sponsored-label-text", "type": "exists"},
        {
            "name": "delivery_info",
            "selector": "[data-cy='delivery-recipe'] .a-color-base",
            "type": "text",
            "multiple": True,
        },
    ],
}


def build_amazon_schema(cache: Optional[dict] = None) -> dict:
    """Schema accessor mirroring ``build_serp_schemas``' caching shape —
    the bundle is published by the reference, so there is nothing to
    induce; the cache hook keeps the call-site symmetric with the SERP
    crawler (and is where a per-marketplace induced variant would land)."""
    cache = cache if cache is not None else {}
    if "amazon_product_schema" not in cache:
        cache["amazon_product_schema"] = AMAZON_PRODUCT_SCHEMA
    return cache["amazon_product_schema"]


AMAZON_ITEM_SCHEMA = T.StructType(
    [
        T.StructField("src_url", T.StringType()),
        T.StructField("item_idx", T.IntegerType()),
        T.StructField("item_json", T.StringType()),
    ]
)


def extract_amazon_products(
    pages: DataFrame,
    schema: Optional[dict] = None,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """One product-card row per search-result card per page —
    (src_url, item_idx, item_json) with canonical sorted-key JSON, the
    same output convention as ``serp_extract``.  Stateless Arrow-batched
    pass; the schema travels inside the closure (broadcast with the
    task binary), so at 10^10 pages this is a pure linear scan."""
    schema = schema or AMAZON_PRODUCT_SCHEMA

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf[url_col], pdf[html_col]):
                for idx, item in enumerate(extract_json_css(html, schema)):
                    rows.append((url, idx, json.dumps(item, sort_keys=True)))
            yield pd.DataFrame(rows, columns=[f.name for f in AMAZON_ITEM_SCHEMA.fields])

    return pages.select(url_col, html_col).mapInPandas(gen, AMAZON_ITEM_SCHEMA)
