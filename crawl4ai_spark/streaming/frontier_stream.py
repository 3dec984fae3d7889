"""Structured Streaming mode (SURVEY §2.12).

The reference's "stream mode" is an asyncio generator yielding results
in completion order (base_strategy.py:102-105, async_dispatcher.py:
529-619) — not event-time streaming.  Parity therefore never *requires*
Structured Streaming; the wave/batch engine covers it.  This module
offers the streaming surface for pipelines that want it:

* :func:`stream_link_expansion` — discovered-link stream → stream-static
  anti-join against the (static snapshot of the) seen table → fresh
  frontier candidates.  The stream-static join re-reads the static side
  per micro-batch, which is exactly the Iceberg-snapshot semantics the
  batch engine uses.
* :func:`windowed_host_rates` — per-host fetch counts over sliding
  event-time windows with a watermark: the streaming analog of the
  politeness monitor (the reference keeps wall-clock dicts,
  async_dispatcher.py:45-85).
* :func:`foreach_wave` — micro-batch runner: each batch of seed URLs is
  pushed through a caller-supplied batch wave function (e.g. a CrawlJob
  wave), giving at-least-once processing with checkpointed offsets —
  Spark's own checkpoint dir replaces the reference's per-URL
  on_state_change JSON snapshots (bfs_strategy.py:213-223).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import host_expr, is_valid_url_expr, normalize_deep_udf


def stream_link_expansion(
    links_stream: DataFrame,
    seen: DataFrame,
    href_col: str = "href",
    base_col: str = "src_url",
) -> DataFrame:
    """Streaming frontier expansion: canonicalize each discovered link and
    anti-join the static seen snapshot.  Output: (url, host) candidates.

    Within-stream duplicates are NOT dropped here (streaming
    dropDuplicates would need unbounded state); the downstream batch
    committer dedups per micro-batch exactly like a wave does.
    """
    canon = links_stream.withColumn(
        "url", normalize_deep_udf(F.col(href_col), F.col(base_col))
    )
    fresh = canon.filter(
        F.col("url").isNotNull() & is_valid_url_expr(F.col("url"))
    ).join(seen.select("url"), "url", "left_anti")
    return fresh.withColumn("host", host_expr(F.col("url")))


def windowed_host_rates(
    fetch_stream: DataFrame,
    window_duration: str = "60 seconds",
    slide: str = "30 seconds",
    watermark: str = "2 minutes",
    ts_col: str = "fetched_at",
) -> DataFrame:
    """Sliding-window per-host fetch counts with late-data handling —
    feeds the politeness controller with observed request rates."""
    return (
        fetch_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration, slide), F.col("host"))
        .agg(
            F.count("*").alias("n_fetches"),
            F.sum(F.when(F.col("status_code").isin(429, 503), 1).otherwise(0)).alias(
                "n_throttled"
            ),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "host",
            "n_fetches",
            "n_throttled",
        )
    )


def foreach_wave(
    seeds_stream: DataFrame,
    wave_fn,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Run ``wave_fn(batch_df, batch_id)`` per micro-batch of seed URLs —
    the foreachBatch bridge between a streaming source and the batch wave
    engine.  Returns the started StreamingQuery."""
    writer = (
        seeds_stream.writeStream.foreachBatch(wave_fn)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


HOST_STATE_STREAM_SCHEMA = "host string, last_request_time double, current_delay double, fail_count int"


def stateful_host_politeness(
    fetch_stream: DataFrame,
    base_delay: float = 1.0,
    max_delay: float = 60.0,
    max_retries: int = 3,
    ts_col: str = "fetched_at",
):
    """Per-host politeness state as a custom stateful streaming operator
    (``applyInPandasWithState`` — the Structured Streaming analog of the
    batch engine's ``update_host_state`` fold, same RateLimiter rule:
    429/503 → fail++ / double delay unless past max_retries (frozen);
    success → decay 0.75 toward base, fail=0).

    Emits the updated (host, last_request_time, current_delay,
    fail_count) row per host per micro-batch.  State lives in the
    streaming checkpoint — the micro-batch twin of the host_state table
    snapshot the wave engine commits.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    # epoch seconds JVM-side: Arrow hands the state function tz-NAIVE
    # timestamps localized to the session timezone, and pandas
    # .timestamp() would re-read those as UTC — wrong by the tz offset on
    # any non-UTC driver.  A timestamp→double cast is tz-independent
    # (same technique as windowed_host_rates' long cast).
    if dict(fetch_stream.dtypes).get(ts_col, "").startswith("timestamp"):
        fetch_stream = fetch_stream.withColumn(ts_col, F.col(ts_col).cast("double"))

    def update(key, pdfs, state: GroupState):
        host = key[0]
        if state.exists:
            last, delay, fails = state.get
        else:
            last, delay, fails = 0.0, base_delay, 0
        # gather ALL chunks first: a large group arrives as several Arrow
        # batches, and the fold is order-dependent — sorting per chunk
        # would interleave events out of global time order
        events: list[tuple[float, int]] = []
        for pdf in pdfs:
            for ts, status in zip(pdf[ts_col], pdf["status_code"]):
                ts = ts.timestamp() if hasattr(ts, "timestamp") else float(ts)
                events.append((ts, int(status)))
        events.sort(key=lambda e: e[0])
        for ts, status in events:
            last = max(last, ts)
            if status in (429, 503):
                fails += 1
                if fails > max_retries:
                    continue  # give-up: delay frozen (RateLimiter :71-73)
                delay = min(delay * 2, max_delay)
            else:
                delay = max(base_delay, delay * 0.75)
                fails = 0
        state.update((last, delay, fails))
        yield pd.DataFrame(
            {"host": [host], "last_request_time": [last],
             "current_delay": [delay], "fail_count": [fails]}
        )

    return fetch_stream.groupBy("host").applyInPandasWithState(
        update,
        outputStructType=HOST_STATE_STREAM_SCHEMA,
        stateStructType="last_request_time double, current_delay double, fail_count int",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
