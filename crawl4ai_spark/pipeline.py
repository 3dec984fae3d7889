"""CrawlJob — the production composition of every engine component.

One scheduling wave (SURVEY §3.3's Spark-native main loop):

    frontier ──robots gate──► schedule (per-host token bucket, salted
    top-K) ──► fetch (pandas-UDF / corpus join) ──► scrape (links +
    image refs) ──► image payload emit (decode/validate → payload table)
    ──► expand (canonicalize → bloom prefilter → exact anti-join seen →
    filter/score) ──► next frontier (carried + retries + discoveries)
    ──► host-state backoff update ──► snapshot commit (+ lineage row per
    partition)

Relationship to traversal.CrawlEngine: CrawlEngine is the *parity*
engine (exact reference ordering semantics, oracle-tested); CrawlJob is
the *scale* composition adding politeness, priority aging, robots,
retries, the image payload path, and checkpoint/resume.  The ordering
contract here is the deterministic logical queue discipline:
(wave_id, priority_bucket, score desc, depth, url) per host, spaced by
the politeness delay — the same discipline the reference's dispatcher
implements with wall-clock sleeps (async_dispatcher.py:28-85), made
reproducible.

Everything is append-only at scale: seen/bloom/images/results/lineage
grow by per-wave deltas; only frontier and host_state (both O(open
work), not O(history)) are rewritten.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .functions.urls import host_expr, is_valid_url_expr, normalize_deep_udf
from .operators import scrape
from .operators.dedup import anti_join_seen, bloom_version_ok, build_bloom
from .operators.scheduler import (
    priority_bucket_expr,
    robots_gate,
    salted_range_partition,
    schedule_wave,
    update_host_state,
)
from .sources.catalog import SnapshotCatalog, lineage_from_wave

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("url_hash", T.IntegerType()),
        T.StructField("host", T.StringType()),
        T.StructField("host_hash", T.LongType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("parent_url", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("priority_bucket", T.IntegerType()),
        T.StructField("retry_count", T.IntegerType()),
        T.StructField("wait_waves", T.IntegerType()),
        T.StructField("wave_id", T.IntegerType()),
        T.StructField("status", T.StringType()),
    ]
)


@dataclass
class JobConfig:
    max_depth: int = 3
    max_pages: float = math.inf
    max_waves: int = 100
    wave_budget: float = 60.0  # politeness budget per wave (seconds)
    default_delay: float = 1.0
    max_retries: int = 3  # on 429/503 (RateLimiter semantics)
    score_expr: object | None = None  # Column -> Column on canonical url
    filter_expr: object | None = None  # Column -> Column on raw href
    include_external: bool = False
    use_bloom: bool = True
    bloom_partitions: int = 32
    bloom_bits: int = 1 << 20
    fairness_waves: int = 10
    emit_images: bool = True
    emit_pdfs: bool = False  # pdf_pages/pdf_images tables per wave
    emit_markdown: bool = False  # markdown/citations/fit_markdown table per wave
    emit_doc_dedup: bool = False  # per-wave minhash/simhash signature deltas
    dedup_n_perm: int = 16
    dedup_bands: int = 4
    dedup_shingle_n: int = 3
    durable_tmp: bool = False  # parquet (vs executor-local) intra-wave checkpoints
    markdown_fit_mode: str | None = None  # None | "pruning" | "bm25"
    markdown_query: str | None = None  # bm25 fit query
    n_partitions: int = 0  # 0 → defaultParallelism


@dataclass
class WaveStats:
    wave_id: int
    scheduled: int
    admitted: int
    fetched_ok: int
    failed: int
    discovered: int
    dedup_hits: int
    images: int
    duration_ms: int


class CrawlJob:
    def __init__(
        self,
        spark: SparkSession,
        fetch_fn,
        catalog_root: str,
        config: JobConfig | None = None,
        robots: DataFrame | None = None,
        image_store: DataFrame | None = None,
        pdf_store: DataFrame | None = None,
        run_configs: list | None = None,
    ):
        self.spark = spark
        self.fetch_fn = fetch_fn
        self.cfg = config or JobConfig()
        self.catalog = SnapshotCatalog(catalog_root, spark)
        self.robots = robots
        self.image_store = image_store  # image_id → payload (the synthetic "CDN")
        self.pdf_store = pdf_store  # pdf_id → payload (document plane CDN)
        # per-URL RunConfig selection (async_dispatcher.py:101-125); a URL
        # matching no config becomes a failed result and leaves the frontier
        self.run_configs = run_configs
        self.stats: list[WaveStats] = []

    # ------------------------------------------------------------------ API
    def seed(self, seeds: DataFrame) -> DataFrame:
        """seeds(url[, priority]) → initial frontier (wave 0 snapshot).
        Cross-source duplicate seeds collapse (async_url_seeder.py:429-459)."""
        cfg = self.cfg
        pri = F.col("priority") if "priority" in seeds.columns else F.lit(1.0)
        base = seeds.select(
            normalize_deep_udf(F.col("url"), F.col("url")).alias("url"),
            pri.cast("double").alias("score"),
        )
        frontier = (
            base.filter(F.col("url").isNotNull() & is_valid_url_expr(F.col("url")))
            .dropDuplicates(["url"])
            .select(
                "url",
                F.hash("url").alias("url_hash"),
                host_expr(F.col("url")).alias("host"),
                F.xxhash64(host_expr(F.col("url"))).alias("host_hash"),
                F.lit(0).alias("depth"),
                F.lit(None).cast("string").alias("parent_url"),
                F.col("score"),
                F.lit(0).alias("priority_bucket"),
                F.lit(0).alias("retry_count"),
                F.lit(0).alias("wait_waves"),
                F.lit(0).alias("wave_id"),
                F.lit("QUEUED").alias("status"),
            )
        )
        seen0 = frontier.select("url")
        state = {"frontier": frontier, "host_state": self._empty_host_state()}
        appends = {"seen": seen0}
        if cfg.use_bloom:
            appends["bloom"] = build_bloom(seen0, n_partitions=cfg.bloom_partitions, m_bits=cfg.bloom_bits)
        self.catalog.commit_wave(0, state=state, appends=appends)
        return frontier

    def run(self, max_waves: int | None = None) -> dict:
        """Advance waves until the frontier drains (or limits hit).
        Restartable: always resumes from the latest snapshot."""
        cfg = self.cfg
        max_waves = max_waves or cfg.max_waves
        pages_crawled = self._crawled_so_far()
        waves_done = 0
        while waves_done < max_waves and pages_crawled < cfg.max_pages:
            snap = self.catalog.latest_snapshot()
            frontier = self.catalog.read("frontier", snap)
            if frontier is None or frontier.limit(1).count() == 0:
                break
            stats = self._wave(snap, frontier)
            self.stats.append(stats)
            pages_crawled += stats.fetched_ok
            waves_done += 1
            if stats.scheduled == 0:
                break
        return {
            "waves": waves_done,
            "pages_crawled": pages_crawled,
            "stats": [s.__dict__ for s in self.stats],
        }

    # ------------------------------------------------------------- the wave
    def _wave(self, snap: dict, frontier: DataFrame) -> WaveStats:
        cfg = self.cfg
        t0 = time.time()
        # SPARK_CRAWL_PROFILE=1 → per-phase wall times on stderr
        import os as _os
        import sys as _sys

        _prof = bool(_os.environ.get("SPARK_CRAWL_PROFILE"))
        _pt = [time.time()]

        def _mark(label: str) -> None:
            if _prof:
                now = time.time()
                print(f"  wave phase {label}: {now - _pt[0]:.2f}s", file=_sys.stderr, flush=True)
                _pt[0] = now

        wave_id = int(snap["wave_id"]) + 1
        host_state = self.catalog.read("host_state", snap)
        # size-gate the host-state broadcast (scheduler._join_host_state):
        # count() on the parquet snapshot is footer-metadata-only — cheap
        # — and keeps the explicit broadcast for small states while a
        # 10^7-host state falls back to an AQE-planned equi-join
        host_state_rows = None if host_state is None else host_state.count()
        wave_start = (wave_id - 1) * cfg.wave_budget

        frontier = frontier.withColumn(
            "priority_bucket",
            priority_bucket_expr(F.col("retry_count"), F.col("wait_waves"), cfg.fairness_waves),
        )
        n_parts = cfg.n_partitions or self.spark.sparkContext.defaultParallelism

        # robots gate: denials become FAILED results without a fetch.
        # Checkpoint the gated frontier once — the denied/allowed branch
        # split would otherwise run the robots UDF join twice.  No robots
        # table ⇒ nothing to gate, skip the checkpoint entirely.
        if self.robots is None:
            gated = frontier.withColumn("robots_allowed", F.lit(True))
        else:
            gated = self._ckpt(robots_gate(frontier, self.robots), f"gated_{wave_id}")
        _mark("robots_gate")
        denied = gated.filter(~F.col("robots_allowed"))
        allowed = gated.filter(F.col("robots_allowed")).drop("robots_allowed")

        # per-URL config selection: no match ⇒ failed result (dispatcher
        # semantics, async_dispatcher.py:241-263), row leaves the frontier
        unmatched = None
        if self.run_configs is not None:
            from .operators.config_match import assign_config

            assigned = self._ckpt(
                assign_config(allowed, self.run_configs), f"cfgmatch_{wave_id}"
            )
            unmatched = assigned.filter(F.col("config_name").isNull()).drop("config_name")
            allowed = assigned.filter(F.col("config_name").isNotNull()).drop("config_name")

        # politeness schedule; carried rows age up
        sched = schedule_wave(
            allowed, host_state, wave_start=wave_start, wave_budget=cfg.wave_budget,
            default_delay=cfg.default_delay, host_state_rows=host_state_rows,
        )
        sched = self._ckpt(sched, f"sched_{wave_id}")
        _mark("schedule")
        admitted = sched.filter("admitted").drop("admitted")
        carried = (
            sched.filter(~F.col("admitted"))
            .drop("admitted", "rank_in_host", "scheduled_offset")
            .withColumn("wait_waves", F.col("wait_waves") + 1)
        )

        # one aggregation job for all scheduling counters (a count() per
        # branch would launch a separate job each — wave overhead is what
        # bounds end-to-end crawl throughput at small corpus sizes)
        srow = sched.agg(
            F.count("*").alias("n"),
            F.sum(F.col("admitted").cast("long")).alias("n_admit"),
        ).first()
        n_sched, n_admit = int(srow["n"]), int(srow["n_admit"] or 0)
        _mark("sched_counts")
        n_denied = 0 if self.robots is None else denied.count()  # scans the gated checkpoint
        n_unmatched = 0 if unmatched is None else unmatched.count()

        # fetch
        fetched = self.fetch_fn(admitted)
        fetched = self._ckpt(fetched, f"fetched_{wave_id}")
        _mark("fetch")
        ok = fetched.filter("success")
        rate_limited = fetched.filter(F.col("status_code").isin(429, 503))

        # retries: requeue with retry_count+1 until max_retries (dispatcher
        # requeue semantics, async_dispatcher.py:289-317 / RateLimiter give-up)
        retry_rows = (
            rate_limited.filter(F.col("retry_count") < cfg.max_retries)
            .select(*[f.name for f in FRONTIER_SCHEMA.fields])
            .withColumn("retry_count", F.col("retry_count") + 1)
            .withColumn("status", F.lit("QUEUED"))
        )

        is_rl = F.col("status_code").isin(429, 503)
        frow = fetched.agg(
            F.sum(F.col("success").cast("long")).alias("n_ok"),
            F.sum((~F.col("success") & ~is_rl).cast("long")).alias("n_hard"),
            F.sum((is_rl & (F.col("retry_count") >= cfg.max_retries)).cast("long")).alias("n_gaveup"),
        ).first()
        n_ok = int(frow["n_ok"] or 0)
        _mark("fetch_counts")
        n_failed = n_denied + n_unmatched + int(frow["n_hard"] or 0) + int(frow["n_gaveup"] or 0)

        # results log (lineage-grade, not the payload)
        results_log = fetched.select(
            "url", "host", "depth", "parent_url", "status_code", "success",
            "scheduled_offset", F.lit(wave_id).alias("wave_id"),
        ).unionByName(
            denied.select(
                "url", "host", "depth", "parent_url",
                F.lit(403).alias("status_code"), F.lit(False).alias("success"),
                F.lit(0.0).alias("scheduled_offset"), F.lit(wave_id).alias("wave_id"),
            )
        )
        if unmatched is not None:
            # "No matching configuration found" → failed result, no fetch
            results_log = results_log.unionByName(
                unmatched.select(
                    "url", "host", "depth", "parent_url",
                    F.lit(0).alias("status_code"), F.lit(False).alias("success"),
                    F.lit(0.0).alias("scheduled_offset"), F.lit(wave_id).alias("wave_id"),
                )
            )

        # image payload emit
        images_delta, n_images = None, 0
        if cfg.emit_images and self.image_store is not None:
            # pin the validated payload once: counting and the snapshot
            # write would otherwise each run the decode/validate UDF
            images_delta = self._ckpt(self._emit_images(ok, wave_id), f"img_delta_{wave_id}")
            n_images = images_delta.count()

        # PDF document emit: fetched pages' .pdf links resolve against the
        # pdf store and fan out to per-page text + per-image rows — the
        # reference's NaivePDFProcessorStrategy plane
        # (processors/pdf/processor.py:25-50) landing as catalog tables
        pdf_pages_delta = pdf_images_delta = None
        if cfg.emit_pdfs and self.pdf_store is not None:
            pdf_pages_delta, pdf_images_delta = self._emit_pdfs(ok, wave_id, snap)

        # markdown emit (reference: every CrawlResult carries .markdown —
        # markdown_generation_strategy.py:55-260; fit via content filter)
        markdown_delta = None
        if cfg.emit_markdown:
            markdown_delta = self._emit_markdown(ok, wave_id)

        # document-dedup state emit: signatures for THIS wave's pages
        # only (anti-join inside wave_deltas), landing in the same
        # snapshot commit — the training-data near-dup path grows
        # append-only with the crawl (operators/dedup_state.py)
        dedup_deltas: dict = {}
        if cfg.emit_doc_dedup:
            dedup_deltas, _ = self.doc_dedup_state().wave_deltas(
                ok, text_col="html", id_col="url"
            )

        # frontier expansion
        seen = self.catalog.read("seen", snap)
        blooms = self.catalog.read("bloom", snap) if cfg.use_bloom else None
        bloom_rebuilt = None
        if blooms is not None and not bloom_version_ok(
            blooms, n_partitions=cfg.bloom_partitions, m_bits=cfg.bloom_bits
        ):
            # persisted shards predate the current hash scheme OR were
            # built with a different geometry (resume across an engine
            # upgrade / JobConfig change): stale bit positions or
            # wrong-shard routing would yield false NEGATIVES that bypass
            # the exact anti-join — rebuild the whole bloom from the seen
            # table and commit it as a reset baseline so later waves
            # don't rebuild again.
            bloom_rebuilt = self._ckpt(
                build_bloom(seen, n_partitions=cfg.bloom_partitions, m_bits=cfg.bloom_bits),
                f"bloom_rebuild_{wave_id}",
            )
            blooms = bloom_rebuilt
        new_rows, seen_delta, n_disc, n_dedup = self._expand(ok, seen, blooms, wave_id)
        _mark("expand")

        # host state update (politeness backoff fold)
        new_host_state = update_host_state(
            fetched.select("host", "status_code", "scheduled_offset"),
            host_state,
            wave_start=wave_start,
            base_delay=(cfg.default_delay, cfg.default_delay),
            max_retries=cfg.max_retries,  # freeze threshold = give-up threshold
            host_state_rows=host_state_rows,
        )
        _mark("host_state_def")

        # the salted (priority_bucket, host_hash) range layout is applied at
        # WRITE time — the scheduler's own windows re-shuffle by host, so
        # partitioning the input frontier first would just add a shuffle
        next_frontier = salted_range_partition(
            carried.unionByName(retry_rows).unionByName(new_rows), n_parts
        )

        lineage = lineage_from_wave(
            wave_id,
            results_log.withColumn("status", F.when(F.col("success"), "OK").otherwise("FAILED")),
            None,
        ).withColumn("urls_out", F.lit(n_disc).cast("long")).withColumn(
            "dedup_hits", F.lit(n_dedup).cast("long")
        ).withColumn("duration_ms", F.lit(int((time.time() - t0) * 1000)).cast("long"))

        appends = {"seen": seen_delta, "results": results_log, "lineage": lineage}
        resets = {}
        if cfg.use_bloom:
            delta_bloom = build_bloom(
                seen_delta, n_partitions=cfg.bloom_partitions, m_bits=cfg.bloom_bits
            )
            if bloom_rebuilt is not None:
                resets["bloom"] = bloom_rebuilt.unionByName(delta_bloom)
            else:
                appends["bloom"] = delta_bloom
        if images_delta is not None:
            appends["images"] = images_delta
        if pdf_pages_delta is not None:
            appends["pdf_pages"] = pdf_pages_delta
            appends["pdf_images"] = pdf_images_delta
        if markdown_delta is not None:
            appends["markdown"] = markdown_delta
        appends.update(dedup_deltas)
        self.catalog.commit_wave(
            wave_id,
            state={"frontier": next_frontier, "host_state": new_host_state},
            appends=appends,
            resets=resets or None,
        )
        _mark("commit")
        return WaveStats(
            wave_id=wave_id,
            scheduled=n_sched,
            admitted=n_admit,
            fetched_ok=n_ok,
            failed=n_failed,
            discovered=n_disc,
            dedup_hits=n_dedup,
            images=n_images,
            duration_ms=int((time.time() - t0) * 1000),
        )

    # ------------------------------------------------------------- helpers
    def _expand(self, ok: DataFrame, seen, blooms, wave_id: int):
        cfg = self.cfg
        ok = ok.filter(F.col("depth") + 1 <= cfg.max_depth)
        links = scrape.extract_links(ok, url_col="url", html_col="html", with_canon=True)
        meta = ok.select(F.col("url").alias("src_url"), "depth")
        disc = links.join(meta, "src_url")
        if not cfg.include_external:
            disc = disc.filter(~F.col("is_external"))
        disc = disc.filter(F.col("canon").isNotNull() & is_valid_url_expr(F.col("href")))
        if cfg.filter_expr is not None:
            disc = disc.filter(cfg.filter_expr(F.col("href")))
        disc = disc.dropDuplicates(["canon"])
        # checkpoint BEFORE counting: the scrape+canonicalize UDF pass runs
        # once; n_before and the anti-join both read the parquet
        disc = self._ckpt(disc, f"disc_{wave_id}")
        n_before = disc.count()
        fresh = anti_join_seen(
            disc, seen, url_col="canon", blooms=blooms, n_partitions=cfg.bloom_partitions
        )
        fresh = self._ckpt(fresh, f"fresh_{wave_id}")
        n_fresh = fresh.count()
        score = (
            cfg.score_expr(F.col("canon")) if cfg.score_expr is not None else F.lit(0.0)
        ).cast("double")
        new_rows = fresh.select(
            F.col("canon").alias("url"),
            F.hash("canon").alias("url_hash"),
            host_expr(F.col("canon")).alias("host"),
            F.xxhash64(host_expr(F.col("canon"))).alias("host_hash"),
            (F.col("depth") + 1).cast("int").alias("depth"),
            F.col("src_url").alias("parent_url"),
            score.alias("score"),
            F.lit(0).alias("priority_bucket"),
            F.lit(0).alias("retry_count"),
            F.lit(0).alias("wait_waves"),
            F.lit(wave_id).alias("wave_id"),
            F.lit("QUEUED").alias("status"),
        )
        seen_delta = new_rows.select("url")
        return new_rows, seen_delta, n_fresh, n_before - n_fresh

    def _emit_images(self, ok: DataFrame, wave_id: int) -> DataFrame:
        """Scrape <img> refs from fetched pages, look the payloads up in
        the image store (the synthetic CDN), land validated rows in the
        payload table with caption = alt text."""
        from .operators.multimodal import decode_and_validate

        refs = scrape.extract_image_refs(ok, url_col="url", html_col="html", score_threshold=2)
        refs = refs.withColumn(
            "image_id", F.regexp_extract(F.col("img_src"), r"/img/([A-Za-z0-9\-]+)\.", 1)
        ).filter(F.col("image_id") != "")
        payload = refs.join(self.image_store, "image_id").select(
            "image_id",
            "bytes",
            "w",
            "h",
            "fmt",
            F.col("alt").alias("caption"),
            "phash",
        ).dropDuplicates(["image_id"])
        payload = self._ckpt(payload, f"img_payload_{wave_id}")
        checks = decode_and_validate(payload)
        valid_ids = checks.filter("ok AND dims_match AND phash_matches").select("image_id")
        return payload.join(valid_ids, "image_id")

    def _emit_pdfs(self, ok: DataFrame, wave_id: int, snap: dict | None):
        """Resolve the wave's fetched ``<a href=*.pdf>`` refs against the
        pdf store and land two validated deltas: per-page text rows
        (process_pdfs — raw text, reference markdown cleanup, links,
        metadata) and per-image rows (extract_pdf_images — the X-Object
        ladder with decoded-pixel phash).  Same shape as the image plane:
        stateless mapInPandas fan-out, linear in fetched documents."""
        from .operators.pdfproc import extract_pdf_images, process_pdfs

        refs = scrape.extract_links(ok, url_col="url", html_col="html")
        refs = refs.withColumn(
            "pdf_id", F.regexp_extract(F.col("href"), r"/files/([A-Za-z0-9\-]+)\.pdf$", 1)
        ).filter(F.col("pdf_id") != "")
        payload = (
            refs.join(self.pdf_store, "pdf_id")
            .select(F.col("pdf_id").alias("doc_id"), "bytes")
            .dropDuplicates(["doc_id"])
        )
        # cross-WAVE dedup: a PDF linked from pages crawled in different
        # waves must land once — anti-join the already-emitted set, the
        # same first-writer-wins shape as the URL seen set
        prev = self.catalog.read("pdf_pages", snap)
        if prev is not None:
            emitted = prev.select(F.col("pdf_id").alias("doc_id")).distinct()
            payload = payload.join(emitted, "doc_id", "left_anti")
        payload = self._ckpt(payload, f"pdf_payload_{wave_id}")
        pages = process_pdfs(payload).withColumnRenamed("doc_id", "pdf_id")
        images = extract_pdf_images(payload).withColumnRenamed("doc_id", "pdf_id")
        wid = F.lit(wave_id).cast("int").alias("wave_id")
        return pages.select("*", wid), images.select("*", wid)

    def _emit_markdown(self, ok: DataFrame, wave_id: int) -> DataFrame:
        from .functions.markdown import markdown_for_pages
        from .operators.content_filter import bm25_filter_content, pruning_filter_content

        cfg = self.cfg
        content_filter = None
        if cfg.markdown_fit_mode == "pruning":
            content_filter = pruning_filter_content
        elif cfg.markdown_fit_mode == "bm25":
            q = cfg.markdown_query

            def content_filter(html):  # noqa: F811
                return bm25_filter_content(html, user_query=q)

        md = markdown_for_pages(ok, content_filter=content_filter)
        return md.withColumn("wave_id", F.lit(wave_id))

    def _crawled_so_far(self) -> int:
        res = self.catalog.read("results")
        if res is None:
            return 0
        return res.filter("success").count()

    def _empty_host_state(self) -> DataFrame:
        from .operators.scheduler import HOST_STATE_SCHEMA

        return self.spark.createDataFrame([], HOST_STATE_SCHEMA)

    def _ckpt(self, df: DataFrame, name: str) -> DataFrame:
        """Intra-wave pin: cut lineage + stop branch recompute.  These
        intermediates never participate in resume (the snapshot is what
        commit_wave writes), so an executor-local checkpoint suffices —
        the parquet round-trip it replaces cost ~2-4 s/wave of the e2e
        fixed overhead.  ``durable_tmp`` restores the parquet path (e.g.
        for debugging a wave post-mortem)."""
        if self.cfg.durable_tmp:
            import os

            path = os.path.join(self.catalog.root, "tmp", name)
            df.write.mode("overwrite").parquet(path)
            return self.spark.read.parquet(path)
        return df.localCheckpoint(eager=True)

    # ------------------------------------------------------------- queries
    def seen_urls(self) -> DataFrame:
        return self.catalog.read("seen")

    def results(self) -> DataFrame:
        return self.catalog.read("results")

    def images(self) -> DataFrame | None:
        return self.catalog.read("images")

    def markdown(self) -> DataFrame | None:
        return self.catalog.read("markdown")

    def doc_dedup_state(self):
        """The crawl's persisted document-dedup state (lazy; shares the
        job's catalog so signature deltas ride the wave commits)."""
        from .operators.dedup_state import DedupState

        if not hasattr(self, "_doc_dedup_state"):
            cfg = self.cfg
            self._doc_dedup_state = DedupState(
                self.catalog, n_perm=cfg.dedup_n_perm, bands=cfg.dedup_bands,
                shingle_n=cfg.dedup_shingle_n,
            )
        return self._doc_dedup_state

    def doc_dups(self, threshold: float = 0.5, new_ids: DataFrame | None = None) -> DataFrame:
        """Near-duplicate page pairs from the persisted signatures
        (requires emit_doc_dedup; pass ``new_ids`` for the incremental
        latest-wave check)."""
        return self.doc_dedup_state().minhash_pairs(threshold, new_ids=new_ids)

    def lineage(self) -> DataFrame:
        return self.catalog.lineage()
