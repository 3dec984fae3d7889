"""Pure-Python transcription of the reference traversal algorithms.

This is the ordering/seen-set oracle for the Spark engines: a faithful
sequential reimplementation of BFSDeepCrawlStrategy._arun_batch +
link_discovery (bfs_strategy.py:81-227), DFSDeepCrawlStrategy
(dfs_strategy.py:27-277) and BestFirstCrawlingStrategy._arun_best_first
(bff_strategy.py:100-269), parameterized over:

* fetch(url) -> (success: bool, status: int, html: str)
* the same link-extraction + normalization pipeline the Spark engine uses
  (scrape.parse_page + normalize_url + normalize_url_for_deep_crawl), so
  any divergence in a traversal test is an orchestration bug, not a
  parsing difference (parsing parity is covered by the URL golden tests).
"""

from __future__ import annotations

import heapq
import math
from typing import Callable

from crawl4ai_spark.functions.urls import (
    get_base_domain,
    is_external_url,
    is_valid_crawl_url,
    normalize_url,
    normalize_url_for_deep_crawl,
)
from crawl4ai_spark.operators.scrape import parse_page


def page_links(url: str, html: str, include_external: bool) -> list[str]:
    """Extract + extended-normalize links exactly as the scrape stage does
    (first occurrence per page wins; schemes filtered; external split)."""
    parser = parse_page(url, html)
    base = parser.base_href or url
    dom = get_base_domain(url)
    out, seen_page = [], set()
    for ln in parser.links:
        raw = ln["href"]
        if raw.startswith(("mailto:", "tel:", "javascript:", "data:")):
            continue
        norm = normalize_url(raw, base)
        if not norm or norm in seen_page:
            continue
        seen_page.add(norm)
        if is_external_url(norm, dom) and not include_external:
            continue
        out.append(norm)
    return out


def bfs_oracle(
    start_url: str,
    fetch: Callable[[str], tuple[bool, int, str]],
    max_depth: int = 2,
    max_pages: float = math.inf,
    score_threshold: float = -math.inf,
    score_fn: Callable[[str], float] | None = None,
    filter_fn: Callable[[str], bool] | None = None,
    include_external: bool = False,
):
    """Returns (results, visited): results = [(url, depth, parent, success)]
    in crawl order; visited = the reference's seen set."""
    visited: set[str] = set()
    current_level: list[tuple[str, str | None]] = [(start_url, None)]
    depths: dict[str, int] = {start_url: 0}
    pages_crawled = 0
    results = []

    while current_level:
        if pages_crawled >= max_pages:
            break
        next_level: list[tuple[str, str | None]] = []
        for url, parent in current_level:
            success, status, html = fetch(url)
            depth = depths.get(url, 0)
            results.append((url, depth, parent, success))
            if not success:
                continue
            pages_crawled += 1
            # ---- link_discovery (bfs_strategy.py:81-153) ----
            next_depth = depth + 1
            if next_depth > max_depth:
                continue
            remaining = max_pages - pages_crawled
            if remaining <= 0:
                continue
            valid: list[tuple[str, float]] = []
            for href in page_links(url, html, include_external):
                canon = normalize_url_for_deep_crawl(href, url)
                if canon in visited:
                    continue
                if not is_valid_crawl_url(href):
                    continue
                if filter_fn is not None and not filter_fn(href):
                    continue
                score = score_fn(canon) if score_fn else 0.0
                if score < score_threshold:
                    continue
                visited.add(canon)
                valid.append((canon, score))
            if len(valid) > remaining:
                if score_fn is not None:
                    valid.sort(key=lambda x: x[1], reverse=True)  # stable
                valid = valid[: int(remaining)]
            for u, _s in valid:
                next_level.append((u, url))
                depths[u] = next_depth
        current_level = next_level
    return results, visited


def dfs_oracle(
    start_url: str,
    fetch: Callable[[str], tuple[bool, int, str]],
    max_depth: int = 2,
    max_pages: float = math.inf,
    score_threshold: float = -math.inf,
    score_fn=None,
    filter_fn=None,
    include_external: bool = False,
):
    visited: set[str] = set()
    dfs_seen: set[str] = {start_url}
    stack: list[tuple[str, str | None, int]] = [(start_url, None, 0)]
    depths = {start_url: 0}
    pages_crawled = 0
    results = []
    while stack:
        url, parent, depth = stack.pop()
        if url in visited or depth > max_depth:
            continue
        visited.add(url)
        success, status, html = fetch(url)
        results.append((url, depth, parent, success))
        if not success:
            continue
        pages_crawled += 1
        if pages_crawled >= max_pages:
            break
        next_depth = depth + 1
        if next_depth > max_depth:
            continue
        remaining = max_pages - pages_crawled
        if remaining <= 0:
            continue
        valid = []
        for href in page_links(url, html, include_external):
            canon = normalize_url_for_deep_crawl(href, url)
            if not canon or canon in dfs_seen:
                continue
            if not is_valid_crawl_url(href):
                continue
            if filter_fn is not None and not filter_fn(href):
                continue
            score = score_fn(canon) if score_fn else 0.0
            if score < score_threshold:
                continue
            dfs_seen.add(canon)
            valid.append((canon, score))
        if len(valid) > remaining:
            if score_fn is not None:
                valid.sort(key=lambda x: x[1], reverse=True)
            valid = valid[: int(remaining)]
        new_links = []
        for canon, _s in valid:
            new_links.append((canon, url))
            depths[canon] = next_depth
        for new_url, new_parent in reversed(new_links):
            stack.append((new_url, new_parent, depths.get(new_url, next_depth)))
    return results, visited


def best_first_oracle(
    start_url: str,
    fetch: Callable[[str], tuple[bool, int, str]],
    max_depth: int = 2,
    max_pages: float = math.inf,
    score_fn=None,
    filter_fn=None,
    include_external: bool = False,
    batch_size: int = 10,
):
    visited: set[str] = set()
    depths = {start_url: 0}
    pages_crawled = 0
    results = []
    counter = 0  # heap push tiebreaker (mirrors asyncio.PriorityQueue FIFO-on-tie closely enough for unique URLs)
    heap: list = []
    s0 = score_fn(start_url) if score_fn else 0.0
    heapq.heappush(heap, (-s0, 0, start_url, None, counter))
    while heap:
        if pages_crawled >= max_pages:
            break
        batch = []
        for _ in range(batch_size):
            if not heap:
                break
            neg, depth, url, parent, _c = heapq.heappop(heap)
            if url in visited:
                continue
            visited.add(url)
            batch.append((neg, depth, url, parent))
        if not batch:
            continue
        broke = False
        for neg, depth, url, parent in batch:
            success, status, html = fetch(url)
            if success:
                pages_crawled += 1
                if pages_crawled >= max_pages:
                    broke = True
                    break  # limit-reaching result NOT emitted (pinned quirk)
            results.append((url, depth, parent, success))
            if not success:
                continue
            # discovery (no threshold, no trim, no visited-add)
            new_depth = depth + 1
            if new_depth > max_depth:
                continue
            if max_pages - pages_crawled <= 0:
                continue
            for href in page_links(url, html, include_external):
                canon = normalize_url_for_deep_crawl(href, url)
                if canon in visited:
                    continue
                if not is_valid_crawl_url(href):
                    continue
                if filter_fn is not None and not filter_fn(href):
                    continue
                depths[canon] = new_depth
                sc = score_fn(canon) if score_fn else 0.0
                counter += 1
                heapq.heappush(heap, (-sc, new_depth, canon, url, counter))
        if broke:
            break
    return results, visited
