"""Traversal engines: BFS waves, DFS stack, best-first priority queue.

Reproduces — exactly, including the quirks — the reference's three deep
crawl strategies over DataFrame primitives:

* **BFS** (bfs_strategy.py:81-227): level-synchronous waves.  One wave =
  one DataFrame job.  Within-wave semantics that the reference applies
  per-result sequentially (visited updates, capacity trim against a
  max_pages budget that counts successes as it iterates) are re-expressed
  as window functions over a (result_seq, link_seq) order — see
  ``_bfs_discover``.  Notable pinned quirks: visited starts EMPTY (the
  start URL is never pre-seeded and can be re-discovered); links that
  pass filter+score enter the seen set even when the capacity trim drops
  them; the trim sorts by score (stable) only when a scorer is present.
* **DFS** (dfs_strategy.py:27-277): inherently serial — pop one, crawl
  one, push children reversed.  The engine keeps the stack as driver
  control flow but does all data work (scrape, canonicalize, filter,
  score) in vectorized Spark chunks, prefetched ``prefetch_chunk`` pages
  at a time.  A separate ``dfs_seen`` set (seeded with the raw start URL)
  guards discovery, while ``visited`` guards crawling — both reference
  sets are kept distinct.
* **Best-first** (bff_strategy.py:139-269): frontier table ordered by
  (-score, depth, url); each wave pops BATCH_SIZE=10 items (visited
  filtering happens after the pop, so dupes consume pop slots — pinned),
  marks them visited, crawls, and pushes scored children with no
  threshold / no trim.  max_pages can break mid-batch BEFORE the
  limit-reaching result is emitted (pinned quirk).

Scale notes: the BFS wave path is the production path — wave expansion
is shuffle-light (one anti-join against the seen delta store + one
window per wave; the global sequencing uses a two-phase distributed
rank, never a single-partition window, when ``max_pages`` is infinite).
DFS and best-first-with-batch-10 are parity modes; best-first scales by
raising ``batch_size``.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from typing import Callable, Iterator

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.urls import is_valid_url_expr, normalize_deep_udf
from . import scrape
from .dedup import anti_join_seen

FetchFn = Callable[[DataFrame], DataFrame]
# fetch: wave(url, ...) -> wave + (success boolean, status_code int, html string)


@dataclass
class CrawlConfig:
    max_depth: int = 2
    max_pages: float = math.inf
    score_threshold: float = -math.inf
    include_external: bool = False
    batch_size: int = 10  # best-first BATCH_SIZE (bff_strategy.py:19)
    filter_expr: Callable[[Column], Column] | None = None  # predicate on the raw href
    score_expr: Callable[[Column], Column] | None = None  # score of the canonical URL
    ordered: bool = True  # exact reference ordering; False = throughput mode
    prefetch_chunk: int = 64  # DFS vectorized prefetch size


@dataclass
class CrawlRun:
    results: DataFrame  # url, depth, parent_url, wave_id, result_seq, success, status_code
    seen: DataFrame  # canonical seen-set (the reference's `visited`)
    pages_crawled: int
    waves: int
    wave_metrics: list[dict] = field(default_factory=list)


RESULT_COLS = ["url", "depth", "parent_url", "wave_id", "result_seq", "success", "status_code"]

WAVE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("parent_url", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("result_seq", T.LongType()),
    ]
)

SEEN_SCHEMA = T.StructType([T.StructField("url", T.StringType())])


def global_sequence(df: DataFrame, order_cols: list, out_col: str = "result_seq") -> DataFrame:
    """Deterministic global 0-based sequence by ``order_cols`` without a
    single-partition window: range-repartition on the keys, rank locally,
    then add per-partition offsets (a distributed zipWithIndex)."""
    n = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    d = df.repartitionByRange(n, *order_cols).withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    d = d.withColumn("_lrn", F.row_number().over(w))
    # pin BEFORE the counts collect: the offsets job and the output job
    # must see the SAME range boundaries — repartitionByRange samples its
    # input, and a nondeterministic upstream (any shuffle, e.g.
    # dropDuplicates) can shift boundaries between the two evaluations,
    # yielding duplicate/holey sequence numbers
    d = d.localCheckpoint(eager=True)
    counts = {r["_pid"]: r["c"] for r in d.groupBy("_pid").agg(F.count("*").alias("c")).collect()}
    if not counts:
        return d.withColumn(out_col, F.lit(0).cast("long")).drop("_pid", "_lrn")
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(p) for p in sorted(counts)]),
            F.array(*[F.lit(offsets[p]) for p in sorted(counts)]),
        ),
        F.col("_pid"),
    )
    return d.withColumn(out_col, (off + F.col("_lrn") - 1).cast("long")).drop("_pid", "_lrn")


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        fetch_fn: FetchFn,
        config: CrawlConfig | None = None,
        catalog=None,
    ):
        self.spark = spark
        self.fetch_fn = fetch_fn
        self.cfg = config or CrawlConfig()
        self.catalog = catalog

    # ------------------------------------------------------------------ BFS
    def crawl_bfs(
        self, start_url: str, resume: dict | None = None, stream_visited: bool = False
    ) -> CrawlRun:
        """``stream_visited`` selects the STREAM-mode visited timing
        (bfs_strategy.py:257): each wave's URLs join the visited set at
        CRAWL time, in addition to the discovery-time adds — so an
        in-flight URL (including the start URL) can never be
        re-discovered.  Batch mode (default) adds only at discovery
        (:134), letting the start URL be re-discovered — both timings
        pinned by oracle parity tests.  Result ordering follows the
        logical wave order either way (the reference's stream yields in
        nondeterministic completion order; its own tests assert logical
        order — SURVEY §7.4)."""
        cfg = self.cfg
        spark = self.spark
        if resume:
            wave = spark.createDataFrame(
                [(r["url"], r["parent_url"], r["depth"], i) for i, r in enumerate(resume["pending"])],
                WAVE_SCHEMA,
            )
            seen = spark.createDataFrame([(u,) for u in resume["visited"]], SEEN_SCHEMA)
            pages_crawled = int(resume.get("pages_crawled", 0))
            wave_id = int(resume.get("wave_id", 0))
        else:
            wave = spark.createDataFrame([(start_url, None, 0, 0)], WAVE_SCHEMA)
            seen = spark.createDataFrame([], SEEN_SCHEMA)  # visited starts EMPTY (pinned)
            pages_crawled = 0
            wave_id = 0

        all_results: list[DataFrame] = []
        metrics: list[dict] = []
        while True:
            if pages_crawled >= cfg.max_pages:
                break
            n_wave = wave.count()
            if n_wave == 0:
                break
            t0 = time.time()
            if stream_visited:
                # stream mode: visited.update(urls) before the crawl.
                # Plain union — no global distinct per wave (a distinct
                # over the whole accumulated set every wave stacks
                # shuffles quadratically; the anti-join consumers
                # tolerate duplicate seen rows, and the checkpointed
                # per-wave delta keeps lineage flat)
                seen = self._checkpoint(
                    seen.unionByName(wave.select("url")), f"bfs_stream_seen_{wave_id}"
                )
            fetched = self.fetch_fn(wave)
            fetched = self._checkpoint(fetched, f"bfs_fetched_{wave_id}")

            results = fetched.withColumn("wave_id", F.lit(wave_id)).select(
                *RESULT_COLS, "html"
            )
            all_results.append(results.select(*RESULT_COLS))

            n_success = results.filter("success").count()
            next_wave, seen_delta = self._bfs_discover(results, seen, pages_crawled)
            next_wave = self._checkpoint(next_wave, f"bfs_wave_{wave_id + 1}")
            seen_delta = self._checkpoint(seen_delta, f"bfs_seen_{wave_id}")
            seen = seen.unionByName(seen_delta)
            pages_crawled += n_success
            metrics.append(
                dict(
                    wave_id=wave_id,
                    urls_in=n_wave,
                    fetched=n_success,
                    duration_ms=int((time.time() - t0) * 1000),
                )
            )
            wave = next_wave
            wave_id += 1

        results = (
            self._union_all(all_results)
            if all_results
            else spark.createDataFrame([], self._result_schema())
        )
        if stream_visited:
            seen = seen.dropDuplicates(["url"])  # one dedup at the end, not per wave
        return CrawlRun(results=results, seen=seen, pages_crawled=pages_crawled, waves=wave_id, wave_metrics=metrics)

    def _bfs_discover(
        self, results: DataFrame, seen: DataFrame, pages_before: int
    ) -> tuple[DataFrame, DataFrame]:
        """One BFS discovery step.  Returns (next_wave, seen_delta).

        Window re-expression of the reference's per-result sequential loop
        (bfs_strategy.py:110-153):
          1. explode links of successful results, in (result_seq, link_seq)
             order;
          2. canonicalize (normalize_url_for_deep_crawl on top of the
             scrape-time extended normalization — same two-stage pipeline
             as the reference);
          3. validity + filter chain on the raw href, score threshold on
             the canonical URL;
          4. global visited anti-join, then within-wave first-occurrence
             (visited updates mid-wave ≡ first writer by scan order wins);
          5. capacity trim per result with remaining = max_pages -
             pages_crawled_so_far, where pages_crawled advances by one per
             successful result in scan order (cumulative window).
        """
        cfg = self.cfg
        ok = results.filter(F.col("success") & (F.col("depth") + 1 <= cfg.max_depth))
        links = scrape.extract_links(ok, url_col="url", html_col="html", with_canon=True)
        meta = ok.select(
            F.col("url").alias("src_url"), "depth", "result_seq"
        )
        disc = links.join(meta, "src_url")
        if not cfg.include_external:
            disc = disc.filter(~F.col("is_external"))
        disc = disc.withColumn("next_depth", (F.col("depth") + 1).cast("int"))
        disc = disc.filter(F.col("canon").isNotNull() & is_valid_url_expr(F.col("href")))
        if cfg.filter_expr is not None:
            disc = disc.filter(cfg.filter_expr(F.col("href")))
        score = (
            cfg.score_expr(F.col("canon")) if cfg.score_expr is not None else F.lit(0.0)
        ).cast("double")
        disc = disc.withColumn("link_score", score)
        if cfg.score_threshold > -math.inf:
            disc = disc.filter(F.col("link_score") >= F.lit(cfg.score_threshold))

        # global visited anti-join (exact seen-set truth)
        disc = anti_join_seen(disc, seen, url_col="canon")

        if cfg.max_pages < math.inf:
            # capacity computed against successes accumulated in scan order;
            # a result whose remaining capacity is already 0 adds NOTHING to
            # the seen set (link_discovery early-returns before visited.add —
            # bfs_strategy.py:101-104, pinned), so filter BEFORE dedup.
            # result_seq is unique per wave, so the cumulative success count
            # at a result == its 1-based rank among successes — computed with
            # the same two-phase distributed sequence as global_sequence
            # (a bare Window.orderBy here would funnel the whole wave's
            # successes through one partition).
            succ = global_sequence(
                results.filter("success").select("result_seq"),
                [F.col("result_seq")],
                "_cum",
            ).withColumn("_cum", F.col("_cum") + 1)
            disc = disc.join(succ, "result_seq", "left").withColumn(
                "capacity", F.lit(float(cfg.max_pages)) - F.lit(pages_before) - F.col("_cum")
            )
            disc = disc.filter(F.col("capacity") > 0)

        # within-wave first occurrence by scan order (visited adds mid-wave)
        w_first = Window.partitionBy("canon").orderBy("result_seq", "link_seq")
        passing = (
            disc.withColumn("_occ", F.row_number().over(w_first)).filter(F.col("_occ") == 1).drop("_occ")
        )

        if cfg.max_pages < math.inf:
            w_res = Window.partitionBy("result_seq")
            passing = passing.withColumn("_n_valid", F.count("*").over(w_res))
            sort_flag = (F.col("_n_valid") > F.col("capacity")) & F.lit(
                cfg.score_expr is not None
            )
            order_key = F.when(sort_flag, -F.col("link_score")).otherwise(F.lit(0.0))
            w_rank = Window.partitionBy("result_seq").orderBy(order_key, "link_seq")
            trimmed = (
                passing.withColumn("_rank", F.row_number().over(w_rank))
                .filter(F.col("_rank") <= F.col("capacity"))
            )
            next_order = ["result_seq", "_rank"]
        else:
            trimmed = passing.withColumn("_rank", F.col("link_seq"))
            next_order = ["result_seq", "_rank"]

        seen_delta = passing.select(F.col("canon").alias("url")).distinct()

        if cfg.ordered:
            nxt = global_sequence(
                trimmed.select(
                    F.col("canon").alias("url"),
                    F.col("src_url").alias("parent_url"),
                    F.col("next_depth").alias("depth"),
                    "result_seq",
                    "_rank",
                ),
                [F.col("result_seq"), F.col("_rank")],
            ).select("url", "parent_url", "depth", "result_seq")
        else:
            nxt = trimmed.select(
                F.col("canon").alias("url"),
                F.col("src_url").alias("parent_url"),
                F.col("next_depth").alias("depth"),
                F.monotonically_increasing_id().alias("result_seq"),
            )
        return nxt, seen_delta

    # ------------------------------------------------------------------ DFS
    def crawl_dfs(self, start_url: str) -> CrawlRun:
        """Stack traversal (dfs_strategy.py): driver control flow, Spark
        data flow.  Page link-lists are produced by the same vectorized
        scrape/canonicalize/filter/score pipeline, prefetched in chunks,
        and cached by page URL."""
        cfg = self.cfg
        stack: list[tuple[str, str | None, int]] = [(start_url, None, 0)]
        visited: set[str] = set()
        dfs_seen: set[str] = {start_url}  # raw start URL (dfs_strategy.py:25)
        depths: dict[str, int] = {start_url: 0}
        link_cache: dict[str, list[dict]] = {}
        fetch_ok: dict[str, tuple[bool, int]] = {}
        out_rows: list[tuple] = []
        pages_crawled = 0
        seq = 0

        while stack:
            url, parent, depth = stack.pop()
            if url in visited or depth > cfg.max_depth:
                continue
            visited.add(url)
            if url not in link_cache:
                self._dfs_prefetch([url] + [u for u, _, _ in stack[-cfg.prefetch_chunk:] if u not in link_cache], link_cache, fetch_ok)
            success, status = fetch_ok.get(url, (False, 404))
            out_rows.append((url, depth, parent, 0, seq, success, status))
            seq += 1
            if not success:
                continue
            pages_crawled += 1
            if pages_crawled >= cfg.max_pages:
                # reference DFS (dfs_strategy.py:80-84): the limit break
                # exits only the per-result loop — the OUTER stack loop
                # keeps draining, crawling and emitting already-pushed
                # URLs with no further discovery (overshoot pinned)
                continue
            if depth + 1 > cfg.max_depth:
                continue
            remaining = cfg.max_pages - pages_crawled
            valid: list[tuple[str, float]] = []
            for ln in link_cache.get(url, []):
                canon = ln["canon"]
                if not canon or canon in dfs_seen:
                    continue
                if not ln["pass"]:
                    continue
                sc = ln["score"]
                if sc < cfg.score_threshold:
                    continue
                dfs_seen.add(canon)
                valid.append((canon, sc))
            if len(valid) > remaining:
                if cfg.score_expr is not None:
                    valid.sort(key=lambda x: x[1], reverse=True)
                valid = valid[: int(remaining)]
            new_links = []
            for canon, _sc in valid:
                new_links.append((canon, url))
                depths[canon] = depth + 1
            for new_url, new_parent in reversed(new_links):  # reversed push (pinned)
                stack.append((new_url, new_parent, depths.get(new_url, depth + 1)))

        results = self.spark.createDataFrame(out_rows, self._result_schema())
        seen = self.spark.createDataFrame([(u,) for u in sorted(visited)], SEEN_SCHEMA)
        return CrawlRun(results=results, seen=seen, pages_crawled=pages_crawled, waves=seq)

    def _dfs_prefetch(self, urls: list[str], link_cache: dict, fetch_ok: dict) -> None:
        """Vectorized chunk: fetch + scrape + canonicalize + filter + score
        the given pages in one Spark job; collect their link lists."""
        cfg = self.cfg
        todo = [u for u in dict.fromkeys(urls) if u not in link_cache]
        if not todo:
            return
        wave = self.spark.createDataFrame(
            [(u, None, 0, i) for i, u in enumerate(todo)], WAVE_SCHEMA
        )
        fetched = self.fetch_fn(wave).select("url", "success", "status_code", "html")
        fetched = fetched.localCheckpoint(eager=False)  # one fetch eval for both uses
        links = scrape.extract_links(fetched.filter("success"), "url", "html", with_canon=True)
        if not cfg.include_external:
            links = links.filter(~F.col("is_external"))
        passing = is_valid_url_expr(F.col("href"))
        if cfg.filter_expr is not None:
            passing = passing & cfg.filter_expr(F.col("href"))
        links = links.withColumn("pass", passing)
        score = (
            cfg.score_expr(F.col("canon")) if cfg.score_expr is not None else F.lit(0.0)
        ).cast("double")
        links = links.withColumn("score", score)
        for u in todo:
            link_cache[u] = []
        # never ship the html payloads driver-side — only the tiny status
        # triple is needed here
        for r in fetched.select("url", "success", "status_code").collect():
            fetch_ok[r["url"]] = (bool(r["success"]), int(r["status_code"] or 0))
        for r in links.orderBy("src_url", "link_seq").collect():
            link_cache[r["src_url"]].append(
                dict(canon=r["canon"], score=float(r["score"]), **{"pass": bool(r["pass"])})
            )

    # ----------------------------------------------------------- best-first
    def crawl_best_first(self, start_url: str) -> CrawlRun:
        cfg = self.cfg
        spark = self.spark
        start_score = 0.0  # scorer applies to raw start url
        frontier = spark.createDataFrame(
            [(-start_score, 0, start_url, None, 0)],
            "neg_score double, depth int, url string, parent_url string, push_seq long",
        )
        seen = spark.createDataFrame([], SEEN_SCHEMA)
        if cfg.score_expr is not None:
            frontier = frontier.withColumn(
                "neg_score", -cfg.score_expr(F.col("url")).cast("double")
            )
        pages_crawled = 0
        push_seq = 1
        wave_id = 0
        all_results: list[DataFrame] = []

        while True:
            if pages_crawled >= cfg.max_pages:
                break
            pop_order = [
                F.col("neg_score").asc(),
                F.col("depth").asc(),
                F.col("url").asc(),
                F.col("parent_url").asc_nulls_first(),
                F.col("push_seq").asc(),
            ]
            popped = frontier.orderBy(*pop_order).limit(cfg.batch_size).collect()
            if not popped:
                break
            popped_seqs = [r["push_seq"] for r in popped]
            frontier = frontier.filter(~F.col("push_seq").isin(popped_seqs))

            # visited filtering happens AFTER the pop (dupes consume slots).
            # The popped set is ≤ batch_size rows — broadcast it into a
            # semi-join against seen instead of collecting the whole seen
            # set (O(history) driver traffic per wave, O(n²) over a crawl).
            pop_df = spark.createDataFrame(
                [(u,) for u in {r["url"] for r in popped}], SEEN_SCHEMA
            )
            seen_hits = {
                r["url"]
                for r in seen.join(F.broadcast(pop_df), "url", "left_semi").collect()
            }
            batch = []
            for r in popped:
                if r["url"] in seen_hits:
                    continue
                seen_hits.add(r["url"])
                batch.append(r)
            if batch:
                seen = seen.unionByName(
                    spark.createDataFrame([(r["url"],) for r in batch], SEEN_SCHEMA)
                )
            if not batch:
                wave_id += 1
                continue

            wave = spark.createDataFrame(
                [(r["url"], r["parent_url"], r["depth"], i) for i, r in enumerate(batch)],
                WAVE_SCHEMA,
            )
            fetched = self._checkpoint(self.fetch_fn(wave), f"bff_fetched_{wave_id}")
            rows = {r["url"]: r for r in fetched.collect()}
            emitted = []
            broke = False
            for i, b in enumerate(batch):
                r = rows.get(b["url"])
                if r is None:
                    continue
                success = bool(r["success"])
                if success:
                    pages_crawled += 1
                    if pages_crawled >= cfg.max_pages:
                        broke = True  # limit-reaching result NOT emitted (pinned)
                        break
                emitted.append((b["url"], b["depth"], b["parent_url"], wave_id, i, success, int(r["status_code"] or 0)))
            if emitted:
                all_results.append(spark.createDataFrame(emitted, self._result_schema()))

            if not broke and emitted:
                em_ok = [e[0] for e in emitted if e[5]]
                src = fetched.filter(F.col("url").isin(em_ok))
                links = scrape.extract_links(src, "url", "html", with_canon=True)
                if not cfg.include_external:
                    links = links.filter(~F.col("is_external"))
                meta = wave.select(F.col("url").alias("src_url"), F.col("depth").alias("pdepth"), F.col("result_seq"))
                disc = links.join(meta, "src_url").filter(F.col("pdepth") + 1 <= cfg.max_depth)
                disc = disc.filter(F.col("canon").isNotNull() & is_valid_url_expr(F.col("href")))
                if cfg.filter_expr is not None:
                    disc = disc.filter(cfg.filter_expr(F.col("href")))
                disc = disc.join(seen.withColumnRenamed("url", "canon"), "canon", "left_anti")
                score = (
                    cfg.score_expr(F.col("canon")) if cfg.score_expr is not None else F.lit(0.0)
                ).cast("double")
                new_rows = (
                    global_sequence(disc, [F.col("result_seq"), F.col("link_seq")], "ps")
                    .select(
                        (-score).alias("neg_score"),
                        (F.col("pdepth") + 1).cast("int").alias("depth"),
                        F.col("canon").alias("url"),
                        F.col("src_url").alias("parent_url"),
                        (F.col("ps") + push_seq).cast("long").alias("push_seq"),
                    )
                )
                n_new = new_rows.count()
                push_seq += n_new
                if n_new:
                    frontier = frontier.unionByName(new_rows)
            frontier = self._checkpoint(frontier, f"bff_frontier_{wave_id}")
            wave_id += 1
            if broke:
                break

        results = (
            self._union_all(all_results)
            if all_results
            else spark.createDataFrame([], self._result_schema())
        )
        return CrawlRun(results=results, seen=seen, pages_crawled=pages_crawled, waves=wave_id)

    # ------------------------------------------------------------- helpers
    def _result_schema(self):
        return T.StructType(
            [
                T.StructField("url", T.StringType()),
                T.StructField("depth", T.IntegerType()),
                T.StructField("parent_url", T.StringType()),
                T.StructField("wave_id", T.IntegerType()),
                T.StructField("result_seq", T.LongType()),
                T.StructField("success", T.BooleanType()),
                T.StructField("status_code", T.IntegerType()),
            ]
        )

    def _union_all(self, dfs: list[DataFrame]) -> DataFrame:
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def _checkpoint(self, df: DataFrame, name: str) -> DataFrame:
        """Cut lineage between waves: parquet round-trip through the
        catalog when present (doubles as the resumable snapshot), plain
        localCheckpoint otherwise."""
        if self.catalog is not None:
            import os

            path = os.path.join(self.catalog.root, "tmp", name)
            df.write.mode("overwrite").parquet(path)
            return self.spark.read.parquet(path)
        return df.localCheckpoint(eager=True)


# ---------------------------------------------------------------------------
# fetchers
# ---------------------------------------------------------------------------


def corpus_fetcher(pages: DataFrame) -> FetchFn:
    """Deterministic 'network': look pages up in the synthetic corpus.
    Misses are 404 failures.  The corpus is broadcast when small — at
    bench scale this is a shuffle equi-join on url, which is exactly the
    shape of a cache-backed fetch (SURVEY §2.1 cache read)."""
    src = pages.select(F.col("url").alias("_page_url"), "html", F.col("status_code").alias("_sc"))

    def fetch(wave: DataFrame) -> DataFrame:
        j = wave.join(src, wave["url"] == src["_page_url"], "left")
        return (
            j.withColumn("success", F.col("_page_url").isNotNull() & (F.col("_sc") == 200))
            .withColumn("status_code", F.coalesce(F.col("_sc"), F.lit(404)))
            .drop("_page_url", "_sc")
        )

    return fetch


def canonical_corpus_fetcher(pages: DataFrame, cache: bool = True) -> FetchFn:
    """corpus_fetcher keyed by the canonical (deep-normalized) page URL —
    for pipelines whose frontier holds canonical URLs (CrawlJob), where
    the corpus's raw keys ('https://host/' with trailing slash) must
    resolve for canonical requests ('https://host').

    The canonical index is cached by default: without it every wave
    re-runs the canonicalize UDF + dedup shuffle over the whole world —
    synthetic-network cost masquerading as engine cost."""
    src = pages.select(
        normalize_deep_udf(F.col("url"), F.col("url")).alias("_page_url"),
        "html",
        F.col("status_code").alias("_sc"),
    ).dropDuplicates(["_page_url"])
    if cache:
        src = src.cache()

    def fetch(wave: DataFrame) -> DataFrame:
        j = wave.join(src, wave["url"] == src["_page_url"], "left")
        return (
            j.withColumn("success", F.col("_page_url").isNotNull() & (F.col("_sc") == 200))
            .withColumn("status_code", F.coalesce(F.col("_sc"), F.lit(404)))
            .drop("_page_url", "_sc")
        )

    return fetch


def mock_child_fetcher(n_children: int = 3, max_calls: int | None = None) -> FetchFn:
    """Reference-test fetch mock (tests/deep_crawling/test_deep_crawl_resume.py:40-100):
    every URL succeeds and links to ``{url}/child{n}_{i}`` children,
    generated with pure column expressions (no Python)."""

    def fetch(wave: DataFrame) -> DataFrame:
        links = F.concat_ws(
            "",
            *[
                F.concat(
                    F.lit('<a href="'),
                    F.col("url"),
                    F.lit(f"/child0_{i}"),
                    F.lit(f'">c{i}</a>'),
                )
                for i in range(n_children)
            ],
        )
        return wave.withColumn("success", F.lit(True)).withColumn(
            "status_code", F.lit(200)
        ).withColumn("html", F.concat(F.lit("<html><body>"), links, F.lit("</body></html>")))

    return fetch
