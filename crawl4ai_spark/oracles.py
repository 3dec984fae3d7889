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

Two layers:

* the classic oracles (``bfs_oracle`` / ``dfs_oracle`` /
  ``best_first_oracle``) return ``(results, visited)`` with 4-tuple
  results — used by the pytest parity suite;
* the ``*_rows`` wrappers add the driver-contract bookkeeping (wave_id /
  result_seq exactly as the Spark engines assign them) plus
  ``job_rows``, a sequential transcription of the production CrawlJob
  wave composition (pipeline.py), so ``__spark_entry__.oracle_sql`` can
  materialize the expected rows as a deterministic DuckDB ``VALUES``
  fixture.  No Spark is imported anywhere in this module.
"""

from __future__ import annotations

import heapq
import math
from typing import Callable
from urllib.parse import urlparse

from .functions.urls import (
    get_base_domain,
    is_external_url,
    is_valid_crawl_url,
    normalize_url,
    normalize_url_for_deep_crawl,
)


def _parse_page(url: str, html: str, links_only: bool = False):
    # local import: scrape pulls pyspark at module level; only the pure
    # _PageParser is needed here
    from .operators.scrape import parse_page

    return parse_page(url, html, links_only=links_only)


def page_links(url: str, html: str, include_external: bool) -> list[str]:
    """Extract + extended-normalize links exactly as the scrape stage does
    (first occurrence per page wins; schemes filtered; external split)."""
    parser = _parse_page(url, html, links_only=True)
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
    rows, visited = bfs_rows(
        start_url, fetch, max_depth, max_pages, score_threshold, score_fn,
        filter_fn, include_external,
    )
    return [(u, d, p, s) for (u, d, p, _w, _q, s) in rows], visited


def bfs_rows(
    start_url: str,
    fetch: Callable[[str], tuple[bool, int, str]],
    max_depth: int = 2,
    max_pages: float = math.inf,
    score_threshold: float = -math.inf,
    score_fn: Callable[[str], float] | None = None,
    filter_fn: Callable[[str], bool] | None = None,
    include_external: bool = False,
    stream_visited: bool = False,
):
    """Driver-row variant: results = [(url, depth, parent, wave_id,
    result_seq, success)] with the Spark engine's wave/seq assignment
    (result_seq = position within the wave).  ``stream_visited`` = the
    stream-mode visited timing (bfs_strategy.py:257: level urls join
    visited at crawl time too)."""
    visited: set[str] = set()
    current_level: list[tuple[str, str | None]] = [(start_url, None)]
    depths: dict[str, int] = {start_url: 0}
    pages_crawled = 0
    results = []
    wave_id = 0

    while current_level:
        if pages_crawled >= max_pages:
            break
        if stream_visited:
            visited.update(u for u, _p in current_level)
        next_level: list[tuple[str, str | None]] = []
        for seq, (url, parent) in enumerate(current_level):
            success, status, html = fetch(url)
            depth = depths.get(url, 0)
            results.append((url, depth, parent, wave_id, seq, success))
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
        wave_id += 1
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
    rows, visited = dfs_rows(
        start_url, fetch, max_depth, max_pages, score_threshold, score_fn,
        filter_fn, include_external,
    )
    return [(u, d, p, s) for (u, d, p, _q, s) in rows], visited


def dfs_rows(
    start_url: str,
    fetch: Callable[[str], tuple[bool, int, str]],
    max_depth: int = 2,
    max_pages: float = math.inf,
    score_threshold: float = -math.inf,
    score_fn=None,
    filter_fn=None,
    include_external: bool = False,
):
    """Driver-row variant: [(url, depth, parent, result_seq, success)]."""
    visited: set[str] = set()
    dfs_seen: set[str] = {start_url}
    stack: list[tuple[str, str | None, int]] = [(start_url, None, 0)]
    depths = {start_url: 0}
    pages_crawled = 0
    results = []
    seq = 0
    while stack:
        url, parent, depth = stack.pop()
        if url in visited or depth > max_depth:
            continue
        visited.add(url)
        success, status, html = fetch(url)
        results.append((url, depth, parent, seq, success))
        seq += 1
        if not success:
            continue
        pages_crawled += 1
        if pages_crawled >= max_pages:
            # reference: limit only stops DISCOVERY; the stack drains
            # fully (dfs_strategy.py:80-84)
            continue
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
    rows, visited = bff_rows(
        start_url, fetch, max_depth, max_pages, score_fn, filter_fn,
        include_external, batch_size,
    )
    return [(u, d, p, s) for (u, d, p, _w, _q, s) in rows], visited


def _pop_key(neg: float, depth: int, url: str, parent: str | None, counter: int):
    # engine pop order: (neg_score, depth, url, parent nulls-first, push_seq)
    return (neg, depth, url, (parent is not None, parent or ""), counter)


def bff_rows(
    start_url: str,
    fetch: Callable[[str], tuple[bool, int, str]],
    max_depth: int = 2,
    max_pages: float = math.inf,
    score_fn=None,
    filter_fn=None,
    include_external: bool = False,
    batch_size: int = 10,
):
    """Driver-row variant: [(url, depth, parent, wave_id, result_seq,
    success)] with the engine's wave numbering (wave_id advances on every
    non-empty pop, including all-dupe batches that emit nothing)."""
    visited: set[str] = set()
    pages_crawled = 0
    results = []
    counter = 0  # heap push tiebreaker = the engine's push_seq
    heap: list = []
    s0 = score_fn(start_url) if score_fn else 0.0
    heapq.heappush(heap, _pop_key(-s0, 0, start_url, None, counter))
    wave_id = 0
    while heap:
        if pages_crawled >= max_pages:
            break
        batch = []
        for _ in range(batch_size):
            if not heap:
                break
            neg, depth, url, (_has_p, parent), _c = heapq.heappop(heap)
            if url in visited:
                continue  # dupes consume pop slots (pinned)
            visited.add(url)
            batch.append((neg, depth, url, parent if _has_p else None))
        if not batch:
            wave_id += 1
            continue
        broke = False
        for i, (neg, depth, url, parent) in enumerate(batch):
            success, status, html = fetch(url)
            if success:
                pages_crawled += 1
                if pages_crawled >= max_pages:
                    broke = True
                    break  # limit-reaching result NOT emitted (pinned quirk)
            results.append((url, depth, parent, wave_id, i, success))
            if not success:
                continue
            # discovery (no threshold, no trim, no visited-add at push)
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
                sc = score_fn(canon) if score_fn else 0.0
                counter += 1
                heapq.heappush(heap, _pop_key(-sc, new_depth, canon, url, counter))
        wave_id += 1
        if broke:
            break
    return results, visited


# ---------------------------------------------------------------------------
# CrawlJob (production wave composition) oracle — pipeline.py transcription
# ---------------------------------------------------------------------------


def _host_of(url: str) -> str:
    return urlparse(url).netloc.lower()


def _can_fetch(rules: str | None, url: str) -> bool:
    from urllib.robotparser import RobotFileParser

    if rules is None or not str(rules).strip():
        return True
    rp = RobotFileParser()
    rp.parse(str(rules).splitlines())
    return bool(rp.can_fetch("*", url))


def job_rows(
    seeds: list[str],
    fetch: Callable[[str], tuple[bool, int, str]],
    robots: dict[str, str] | None = None,
    max_depth: int = 2,
    max_waves: int = 6,
    wave_budget: float = 60.0,
    default_delay: float = 1.0,
    max_pages: float = math.inf,
    max_retries: int = 3,
    fairness_waves: int = 10,
    retry_aware_fetch: bool = False,
):
    """Sequential CrawlJob oracle → [(url, host, depth, status_code,
    success, wave_id)] matching pipeline.CrawlJob.run's results table.

    Transcribes one wave (pipeline.py:179-318): robots gate (denial ⇒
    403 row, dropped from the frontier) → priority bucketing (retry /
    fairness aging) → per-host politeness schedule (rank by the queue
    discipline, offset = ready + (rank-1)*delay, admitted iff offset <
    budget; carried rows age wait_waves) → fetch → 429/503 requeue with
    retry_count+1 until max_retries (give-up = FAILED) → expansion
    (link extract + canonicalize + in-wave dedup + seen anti-join) →
    host-state backoff fold (deterministic, jitter off).  ``fetch`` is
    keyed by CANONICAL url (canonical_corpus_fetcher semantics); with
    ``retry_aware_fetch`` it is called as fetch(url, retry_count).
    """
    robots = robots or {}
    # seed(): canonicalize, validity, dedup; seen starts as the seed set.
    # ``seeds`` items are raw urls or (url, priority) pairs.
    frontier: list[dict] = []
    seen: set[str] = set()
    for item in seeds:
        raw, pri = item if isinstance(item, tuple) else (item, 1.0)
        canon = normalize_url_for_deep_crawl(raw, raw)
        if not canon or not is_valid_crawl_url(canon) or canon in seen:
            continue
        seen.add(canon)
        frontier.append(dict(url=canon, host=_host_of(canon), depth=0, score=float(pri),
                             retry=0, wait=0))
    host_state: dict[str, tuple[float, float, int]] = {}  # host → (last, delay, fails)

    out_rows: list[tuple] = []
    wave_id = 0
    waves_done = 0
    pages_crawled = 0
    while waves_done < max_waves and pages_crawled < max_pages:
        if not frontier:
            break
        wave_id += 1
        wave_start = (wave_id - 1) * wave_budget

        allowed, denied = [], []
        for r in frontier:
            if _can_fetch(robots.get(r["host"]), r["url"]):
                allowed.append(r)
            else:
                denied.append(r)
        for r in denied:
            out_rows.append((r["url"], r["host"], r["depth"], 403, False, wave_id))

        # priority bucketing (scheduler.priority_bucket_expr)
        for r in allowed:
            r["priority"] = (
                -r["wait"] if r["wait"] > fairness_waves else r["retry"]
            )

        # politeness schedule (scheduler.schedule_wave, jitterless)
        by_host: dict[str, list[dict]] = {}
        for r in allowed:
            by_host.setdefault(r["host"], []).append(r)
        admitted, carried = [], []
        for host, rows in by_host.items():
            st = host_state.get(host)
            delay = st[1] if st is not None else default_delay
            ready = max((st[0] + delay - wave_start) if st is not None else 0.0, 0.0)
            # queue discipline: priority asc, score desc, depth asc, url asc
            rows = sorted(
                rows,
                key=lambda r: (r["priority"], -r.get("score", 0.0), r["depth"], r["url"]),
            )
            for i, r in enumerate(rows):
                off = ready + i * delay
                if off < wave_budget:
                    admitted.append((r, off))
                else:
                    r["wait"] += 1
                    carried.append(r)
        scheduled = len(allowed)

        # fetch admitted; 429/503 requeue up to max_retries
        ok_pages: list[tuple[dict, str]] = []
        retries: list[dict] = []
        statuses: dict[str, list[tuple[float, int]]] = {}
        for r, off in admitted:
            if retry_aware_fetch:
                success, status, html = fetch(r["url"], r["retry"])
            else:
                success, status, html = fetch(r["url"])
            out_rows.append((r["url"], r["host"], r["depth"], status, success, wave_id))
            statuses.setdefault(r["host"], []).append((off, status))
            if success:
                pages_crawled += 1
                ok_pages.append((r, html))
            elif status in (429, 503) and r["retry"] < max_retries:
                r2 = dict(r)
                r2["retry"] += 1
                retries.append(r2)

        # expansion (_expand): depth gate → links → canon → in-wave dedup
        # → seen anti-join
        discovered: dict[str, tuple[int, str]] = {}
        for r, html in ok_pages:
            if r["depth"] + 1 > max_depth:
                continue
            for href in page_links(r["url"], html, include_external=False):
                canon = normalize_url_for_deep_crawl(href, r["url"])
                if not canon or not is_valid_crawl_url(href):
                    continue
                if canon in discovered:
                    continue  # dropDuplicates(["canon"])
                discovered[canon] = (r["depth"] + 1, r["url"])
        fresh = {c: v for c, v in discovered.items() if c not in seen}
        seen.update(fresh)

        # host-state backoff fold (update_host_state, jitter off)
        for host, evs in statuses.items():
            st = host_state.get(host)
            delay = st[1] if st is not None and st[1] else default_delay
            fails = st[2] if st is not None else 0
            evs.sort(key=lambda t: t[0])
            last = wave_start + max(off for off, _ in evs)
            for _off, status in evs:
                if status in (429, 503):
                    fails += 1
                    if fails > max_retries:
                        continue
                    delay = min(delay * 2, 60.0)
                else:
                    delay = max(default_delay, delay * 0.75)
                    fails = 0
            host_state[host] = (last, delay, fails)

        frontier = carried + retries + [
            dict(url=c, host=_host_of(c), depth=d, score=0.0, retry=0, wait=0)
            for c, (d, _p) in fresh.items()
        ]
        waves_done += 1
        if scheduled == 0:
            break
    return out_rows


# ---------------------------------------------------------------------------
# adaptive/progressive digest oracle (adaptive_crawler.py:1308-1453 +
# StatisticalStrategy metrics :303-614) — sequential transcription of
# operators/adaptive.digest for the driver fixture
# ---------------------------------------------------------------------------


def _adaptive_tok(text: str) -> list[str]:
    import re as _re

    return [t for t in _re.sub(r"[^\w\s]", " ", text).split() if len(t) > 2]


def adaptive_digest_order(
    pages: dict,
    start_url: str,
    query: str,
    confidence_threshold: float = 0.7,
    max_pages: int = 20,
    top_k_links: int = 3,
) -> list[str]:
    """Crawl order of the progressive digest loop over a
    ``pages: url -> (text, [(href, text, title)])`` site."""
    crawled: list[str] = []
    kb: list[tuple[str, str]] = []
    pending: dict[str, tuple] = {}
    vocab: set[str] = set()
    nth: list[int] = []

    def crawl_batch(urls):
        for u in urls:
            if u not in pages:
                continue
            text, links = pages[u]
            crawled.append(u)
            kb.append((u, text))
            new = set(_adaptive_tok((text or "").lower())) - vocab
            vocab.update(new)
            nth.append(len(new))
            for href, lt, lti in links:
                if href not in pending and href not in set(crawled):
                    pending[href] = (href, lt, lti)

    def coverage_py() -> float:
        n_docs = len(kb)
        terms = _adaptive_tok(query.lower())
        if n_docs == 0 or not terms:
            return 0.0
        tf: dict[str, int] = {}
        df: dict[str, int] = {}
        for _u, text in kb:
            toks = _adaptive_tok(text.lower())
            for t in toks:
                tf[t] = tf.get(t, 0) + 1
            for t in set(toks):
                df[t] = df.get(t, 0) + 1
        max_tf = max(tf.values()) if tf else 1
        scores = []
        for t in terms:
            if df.get(t, 0) == 0:
                scores.append(0.0)
                continue
            freq = math.log(1 + tf[t]) / math.log(1 + max_tf) if max_tf > 0 else 0.0
            scores.append(df[t] / n_docs * (1 + 0.5 * freq))
        return min(1.0, math.sqrt(sum(scores) / len(scores)))

    def consistency_py() -> float:
        if len(kb) < 2:
            return 1.0
        sets = [set(_adaptive_tok(t.lower())) for _u, t in kb]
        sets = [s for s in sets if s]
        pairs = []
        for i in range(len(sets)):
            for j in range(i + 1, len(sets)):
                u = sets[i] | sets[j]
                pairs.append(len(sets[i] & sets[j]) / len(u) if u else 0.0)
        return sum(pairs) / len(pairs) if pairs else 0.0

    def saturation_py() -> float:
        if len(nth) < 2:
            return 0.0
        recent = nth[-1] if nth[-1] > 0 else 1
        initial = nth[0] if nth[0] > 0 else 1
        return max(0.0, min(1.0 - recent / initial, 1.0))

    def confidence_py() -> float:
        if not kb:
            return 0.0  # empty knowledge base (adaptive_crawler.py:313-315)
        return 0.4 * coverage_py() + 0.3 * consistency_py() + 0.3 * saturation_py()

    def rank_py(cand: list[tuple]) -> list[str]:
        q_terms = sorted(set(_adaptive_tok(query.lower())))
        out = []
        for href, text, title in cand:
            lterms = list(dict.fromkeys(_adaptive_tok(((text or "") + " " + (title or "")).lower())))
            if q_terms:
                rel = 0.0 if not lterms else len(set(lterms) & set(q_terms)) / len(q_terms)
            else:
                rel = 0.0
            if not lterms:
                nov = 0.5
            else:
                nov = sum(1 for t in lterms if t not in vocab) / max(len(lterms), 1)
            out.append((0.5 * rel + 0.3 * nov + 0.2 * 1.0, href))
        # STABLE sort (reference :438): ties keep insertion/discovery order
        out.sort(key=lambda x: -x[0])
        return [h for _s, h in out]

    crawl_batch([start_url])
    while len(crawled) < max_pages:
        if confidence_py() >= confidence_threshold:
            break
        cand = [v for k, v in pending.items() if k not in set(crawled)]
        if not cand:
            break
        batch = rank_py(cand)[:top_k_links]
        if not batch:
            break
        for h in batch:
            pending.pop(h, None)
        crawl_batch(batch)
    return crawled


# ---------------------------------------------------------------------------
# fixture fetchers + DuckDB VALUES emitter
# ---------------------------------------------------------------------------


def corpus_fetch_fn(corpus: dict, canonical: bool = False):
    """fetch(url) over the generate_corpus pages table; ``canonical``
    additionally keys by the deep-normalized url (canonical_corpus_fetcher)."""
    pages = corpus["pages"]
    html_by_url = dict(zip(pages["url"], pages["html"]))
    status_by_url = dict(zip(pages["url"], pages["status_code"]))
    if canonical:
        html_by_url = {
            normalize_url_for_deep_crawl(u, u): h for u, h in html_by_url.items()
        }
        status_by_url = {
            normalize_url_for_deep_crawl(u, u): s for u, s in status_by_url.items()
        }

    def fetch(url: str) -> tuple[bool, int, str]:
        h = html_by_url.get(url)
        if h is None:
            return False, 404, ""
        sc = int(status_by_url[url])
        return sc == 200, sc, h

    return fetch


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def rows_values_sql(rows: list[tuple], columns: list[tuple[str, str]]) -> str:
    """DuckDB SELECT over a VALUES fixture with explicit per-column casts
    (``columns`` = [(name, duckdb_type), ...]) so the schema is stable
    even when a column is all-NULL."""
    col_sql = ", ".join(f"CAST({name} AS {typ}) AS {name}" for name, typ in columns)
    names = ", ".join(name for name, _ in columns)
    vals = ",\n".join("(" + ", ".join(_sql_lit(v) for v in r) + ")" for r in rows)
    return f"SELECT {col_sql} FROM (VALUES\n{vals}\n) AS t({names})"


# ---------------------------------------------------------------------------
# EmbeddingStrategy adaptive digest oracle (adaptive_crawler.py:617-1453)
# ---------------------------------------------------------------------------
#
# Sequential replay of operators/adaptive_embedding.embedding_digest with
# float operations in the IDENTICAL order as the Spark kernels (cosine =
# zip_with-multiply left-fold / sqrt(norm)*sqrt(norm); gap sums folded in
# query_id order; means accumulated over sorted ids) so driver-vs-oracle
# comparisons are bit-exact.


def _emb_cos(a: list[float], b: list[float]) -> float:
    dot = 0.0
    for x, y in zip(a, b):
        dot += x * y
    na = 0.0
    for x in a:
        na += x * x
    nb = 0.0
    for y in b:
        nb += y * y
    if na == 0.0 or nb == 0.0:
        return 0.0  # zero-norm guard — mirrors adaptive_embedding._safe_cos
    return dot / (math.sqrt(na) * math.sqrt(nb))


def embedding_digest_replay(
    pages: dict,
    start_url: str,
    query: str,
    query_variations: list[str],
    embed_fn: Callable[[str], list[float]],
    max_depth: int = 5,
    max_pages: int = 20,
    top_k_links: int = 3,
    min_gain_threshold: float = 0.1,
    coverage_radius: float = 0.2,
    overlap_threshold: float = 0.85,
    min_confidence: float = 0.1,
    min_relative_improvement: float = 0.1,
    validation_min_score: float = 0.3,
    kb_sim_threshold: float = 0.95,
    coverage_tau: float | None = None,
) -> dict:
    """``pages``: url -> (text, [(href, text, title), ...])."""
    n_val = max(2, int(len(query_variations) * 0.2)) if query_variations else 0
    val_q = query_variations[len(query_variations) - n_val:]
    train_q = [query] + query_variations[: len(query_variations) - n_val]
    train_emb = [embed_fn(q) for q in train_q]
    val_emb = [embed_fn(q) for q in val_q]

    crawled: list[str] = []
    kb: list[tuple[str, list[float]]] = []
    pending: dict[str, tuple] = {}
    history: list[float] = []
    metrics: dict = {}
    validation_passed = False
    order_counter = [0]

    def crawl_batch(urls: list[str]) -> None:
        texts = []
        for u in urls:
            if u not in pages:
                continue
            crawled.append(u)
            text, links = pages[u]
            content = (text or "")[:5000]
            if content:
                texts.append((u, content))
            for href, lt, lti in links:
                if href not in set(crawled) and href not in pending:
                    pending[href] = (lt, lti, order_counter[0])
                    order_counter[0] += 1
        kb_before = list(kb)
        for u, t in texts:
            emb = embed_fn(t)
            if kb_before:
                max_sim = max(_emb_cos(emb, d) for _, d in kb_before)
                if max_sim >= kb_sim_threshold:
                    continue
            kb.append((u, emb))

    def confidence_now() -> float:
        if not kb:
            return 0.0
        best = [max(_emb_cos(q, d) for _, d in kb) for q in train_emb]
        if coverage_tau is not None:
            return sum(1.0 for b in best if b >= coverage_tau) / len(best)
        acc = 0.0
        for b in best:
            acc += b
        return acc / len(best)

    def validation_now() -> float:
        if not kb or not val_emb:
            return 0.0
        acc = 0.0
        for q in val_emb:
            acc += max(_emb_cos(q, d) for _, d in kb)
        return acc / len(val_emb)

    crawl_batch([start_url])
    depth = 0
    while depth < max_depth:
        conf = confidence_now()
        metrics["confidence"] = conf
        if conf < min_confidence and crawled:
            metrics["stopped_reason"] = "below_minimum_relevance_threshold"
            break
        if len(crawled) >= max_pages or not pending:
            break
        history.append(conf)
        if len(history) >= 2:
            diffs = list(zip(history[:-1], history[1:]))
            avg_improvement = sum(abs(b - a) for a, b in diffs) / len(diffs)
            if avg_improvement < min_relative_improvement * conf:
                val_score = validation_now()
                metrics["validation_confidence"] = val_score
                if val_score > validation_min_score:
                    metrics["stopped_reason"] = "converged_validated"
                    validation_passed = True
                    break
        uncrawled = [
            (href, t, ti, o)
            for href, (t, ti, o) in pending.items()
            if href not in set(crawled)
        ]
        if not uncrawled:
            break
        link_rows = []
        for href, t, ti, o in uncrawled:
            link_text = " ".join(filter(None, [t, ti]))
            if link_text.strip():
                link_rows.append((href, o, embed_fn(link_text)))
        if not link_rows:
            break
        # gaps over train queries
        if kb:
            gaps = [
                (qi, q, 1.0 - max(_emb_cos(q, d) for _, d in kb))
                for qi, q in enumerate(train_emb)
            ]
        else:
            gaps = [(qi, q, 1.0) for qi, q in enumerate(train_emb)]
        helped = [(qi, q, g) for qi, q, g in gaps if g > coverage_radius]
        gnh = len(helped)
        scored = []
        for href, o, emb in link_rows:
            if not gaps:
                score = 0.0
            else:
                if gnh == 0:
                    gr = 0.0
                else:
                    total = 0.0
                    for qi, q, gd in sorted(helped):  # query_id fold order
                        new_d = 1.0 - _emb_cos(emb, q)
                        total += (gd - new_d) * 2.0 if new_d < gd else 0.0
                    gr = total / float(gnh)
                if kb:
                    ms = max(_emb_cos(emb, d) for _, d in kb)
                    pen = (ms - overlap_threshold) * 2.0 if ms > overlap_threshold else 0.0
                else:
                    pen = 0.0
                score = gr * (1.0 - pen)
            scored.append((href, o, score))
        scored.sort(key=lambda x: (-x[2], x[1]))
        top = scored[:top_k_links]
        if not top:
            break
        if top[0][2] < min_gain_threshold:
            break
        to_crawl = [href for href, _o, _s in top if href not in set(crawled)]
        if not to_crawl:
            break
        for h in to_crawl:
            pending.pop(h, None)
        crawl_batch(to_crawl)
        depth += 1

    learning = confidence_now()
    metrics["learning_score"] = learning
    val_sc = metrics.get("validation_confidence", 0.0)
    if validation_passed and val_sc > validation_min_score:
        if learning < 0.4:
            final = 0.7
        elif learning > 0.7:
            final = 0.95
        else:
            final = 0.7 + (learning - 0.4) * 0.833
    else:
        final = learning * 0.8
    metrics["confidence"] = final
    return {
        "crawl_order": crawled,
        "kb_urls": [u for u, _ in kb],
        "confidence_history": history,
        "metrics": metrics,
        "confidence": final,
        "depth_reached": depth,
    }
