"""Streaming mode: file-source micro-batches through the frontier
expansion, windowed host rates with watermark, and the foreachBatch wave
bridge — all driven with Trigger.AvailableNow against parquet dirs."""

import datetime
import os

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.streaming.frontier_stream import (
    foreach_wave,
    stream_link_expansion,
    windowed_host_rates,
)


@pytest.fixture()
def tmpdirs(tmp_path):
    src = tmp_path / "src"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    return str(src), str(ckpt)


def test_stream_link_expansion(spark, tmpdirs):
    src, ckpt = tmpdirs
    links = spark.createDataFrame(
        [
            ("https://a.com/p1", "/new1"),
            ("https://a.com/p1", "/seen1"),
            ("https://a.com/p1", "/new1#frag"),  # canon dup of new1 (kept: per-batch dedup is downstream)
            ("https://b.com/p2", "https://b.com/new2?utm_source=x"),
            ("https://b.com/p2", "mailto:x@y.com"),
        ],
        "src_url string, href string",
    )
    links.write.mode("overwrite").parquet(src)
    seen = spark.createDataFrame([("https://a.com/seen1",)], "url string")

    stream = spark.readStream.schema("src_url string, href string").parquet(src)
    out = stream_link_expansion(stream, seen)
    q = (
        out.writeStream.format("memory")
        .queryName("expansion_sink")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {(r["url"], r["host"]) for r in spark.sql("select * from expansion_sink").collect()}
    assert rows == {
        ("https://a.com/new1", "a.com"),
        ("https://b.com/new2", "b.com"),
    }


def test_windowed_host_rates(spark, tmpdirs):
    src, ckpt = tmpdirs
    t0 = datetime.datetime(2026, 1, 1, 0, 0, 0)

    def ts(s):
        return t0 + datetime.timedelta(seconds=s)

    rows = [
        ("a.com", ts(5), 200),
        ("a.com", ts(20), 429),
        ("a.com", ts(50), 200),
        ("b.com", ts(10), 200),
    ]
    spark.createDataFrame(rows, "host string, fetched_at timestamp, status_code int").write.mode(
        "overwrite"
    ).parquet(src)
    stream = spark.readStream.schema("host string, fetched_at timestamp, status_code int").parquet(src)
    out = windowed_host_rates(stream, "60 seconds", "30 seconds", "2 minutes")
    # complete mode: append would only emit windows already closed by the
    # watermark, and a finite file source never advances it past them
    q = (
        out.writeStream.format("memory")
        .queryName("rates_sink")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"].second + 60 * r["window_start"].minute, r["host"]): (
            r["n_fetches"],
            r["n_throttled"],
        )
        for r in spark.sql("select * from rates_sink").collect()
        if r["window_start"] >= t0 - datetime.timedelta(seconds=30)
    }
    # windows sliding every 30s: [-30,30) [0,60) [30,90)
    assert got[(0, "a.com")] == (3, 1)  # 5, 20, 50 all in [0,60)
    assert got[(30, "a.com")] == (1, 0)  # only 50 in [30,90)
    assert got[(0, "b.com")] == (1, 0)


def test_foreach_wave_bridge(spark, tmpdirs):
    src, ckpt = tmpdirs
    spark.createDataFrame(
        [(f"https://h{i % 3}.com/p{i}",) for i in range(20)], "url string"
    ).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("url string").parquet(src)

    seen_batches = []

    def wave(batch_df, batch_id):
        seen_batches.append((batch_id, batch_df.count()))

    q = foreach_wave(stream, wave, ckpt)
    q.awaitTermination(120)
    assert sum(n for _, n in seen_batches) == 20


def test_stateful_host_politeness(spark, tmpdirs):
    """State carries across micro-batches: batch 1's backoff is the
    starting delay for batch 2 (maxFilesPerTrigger=1 forces two batches)."""
    from crawl4ai_spark.streaming.frontier_stream import stateful_host_politeness

    src, ckpt = tmpdirs
    t0 = datetime.datetime(2026, 1, 1)

    def ts(s):
        return t0 + datetime.timedelta(seconds=s)

    b1 = [("a.com", ts(1), 429), ("a.com", ts(2), 429), ("b.com", ts(1), 200)]
    b2 = [("a.com", ts(10), 200), ("b.com", ts(11), 503)]

    collected = []

    def run_batch(rows_):
        spark.createDataFrame(
            rows_, "host string, fetched_at timestamp, status_code int"
        ).coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(
            "host string, fetched_at timestamp, status_code int"
        ).parquet(src)
        out = stateful_host_politeness(stream, base_delay=1.0)
        # foreachBatch sink: the memory sink can't recover from a
        # checkpoint, and checkpoint recovery across restarts is exactly
        # what this test exercises
        q = (
            out.writeStream.foreachBatch(
                lambda df, _id: collected.extend(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # two separate query runs over one checkpoint: state must survive the
    # restart and batch 1's backoff seeds batch 2
    run_batch(b1)
    run_batch(b2)
    rows = collected
    # last emitted row per host = final state
    final = {}
    for r in rows:
        if r["host"] not in final or r["last_request_time"] > final[r["host"]]["last_request_time"]:
            final[r["host"]] = r
    # a.com: 1 → 429:2 → 429:4, then success: max(1, 3) = 3
    assert final["a.com"]["current_delay"] == pytest.approx(3.0)
    assert final["a.com"]["fail_count"] == 0
    # b.com: success (stays 1), then 503 → 2.0
    assert final["b.com"]["current_delay"] == pytest.approx(2.0)
    assert final["b.com"]["fail_count"] == 1
