#!/usr/bin/env python
"""Shuffle-volume audit for the frontier scheduling wave.

Measures ACTUAL shuffle bytes (Spark's own stage metrics, via the
monitoring REST API) for one full scheduling wave — canonicalize →
exact seen anti-join → priority bucket → per-host schedule → salted
range partition — and derives bytes/URL, the number that governs the
wave at 10^10 URLs on a real cluster: wave shuffle volume = bytes/URL ×
frontier size, and wave time on the shuffle plane ≈ volume / cluster
bisection bandwidth.  Run:

    python tools/shuffle_audit.py [n_urls] [cpus]

Prints one JSON line with the measured totals and the 10^10-URL
extrapolation recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stage_totals(app_id: str, port: int = 4040) -> tuple[int, int]:
    url = f"http://localhost:{port}/api/v1/applications/{app_id}/stages?status=complete"
    data = json.load(urllib.request.urlopen(url))
    return (
        sum(s["shuffleWriteBytes"] for s in data),
        sum(s["shuffleReadBytes"] for s in data),
    )


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    if os.path.isdir("/dev/shm") and not os.environ.get("SPARK_LOCAL_DIRS"):
        os.makedirs("/dev/shm/spark-local", exist_ok=True)
        os.environ["SPARK_LOCAL_DIRS"] = "/dev/shm/spark-local"

    from pyspark.sql import functions as F

    from crawl4ai_spark.functions.urls import normalize_deep_udf
    from crawl4ai_spark.operators.dedup import anti_join_seen
    from crawl4ai_spark.operators.scheduler import (
        priority_bucket_expr,
        salted_range_partition,
        schedule_wave,
    )
    from crawl4ai_spark.session import get_spark
    from crawl4ai_spark.sources.corpus import synth_frontier

    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="shuffle_audit",
        shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.ui.enabled": "true"},
    )
    sc = spark.sparkContext
    n_parts = sc.defaultParallelism * 2

    fr = synth_frontier(spark, n_urls).cache()
    fr.count()
    seen = fr.filter(F.xxhash64("url") % 3 == 0).select("url").cache()
    seen.count()

    # warm-up wave (codegen, python workers) — NOT counted
    pre_w, pre_r = stage_totals(sc.applicationId)

    def wave():
        canon = fr.withColumn("canon", normalize_deep_udf(F.col("url"), F.col("url")))
        fresh = anti_join_seen(canon, seen, url_col="canon", blooms=None)
        sched_in = fresh.select(
            F.col("canon").alias("url"),
            "host",
            "score",
            "depth",
            priority_bucket_expr(F.col("retry_count"), F.lit(0), fairness_waves=10).alias(
                "priority_bucket"
            ),
        )
        sched = schedule_wave(sched_in, None, wave_start=0.0, wave_budget=120.0, default_delay=0.05)
        sched = salted_range_partition(sched, n_parts)
        return sched.filter("admitted").count()

    t0 = time.time()
    n_admitted = wave()
    wall = time.time() - t0
    post_w, post_r = stage_totals(sc.applicationId)

    bytes_written = post_w - pre_w
    bytes_read = post_r - pre_r
    bpu = bytes_written / n_urls

    # 10^10-URL extrapolation (pure arithmetic on the measured rate):
    # full-wave shuffle volume, and shuffle-plane wave time on a
    # 1000-node cluster with 10 Gb/s (=1.25 GB/s) per-node links,
    # all-to-all (bisection ≈ nodes/2 × link).
    frontier_1e10 = 1e10
    vol_1e10 = bpu * frontier_1e10
    bisection_bps = 1000 / 2 * 1.25e9
    shuffle_plane_sec = vol_1e10 / bisection_bps

    out = {
        "n_urls": n_urls,
        "cpus": cpus,
        "n_admitted": n_admitted,
        "wave_sec": round(wall, 2),
        "shuffle_bytes_written": bytes_written,
        "shuffle_bytes_read": bytes_read,
        "bytes_per_url": round(bpu, 1),
        "extrapolation_1e10": {
            "wave_shuffle_volume_tb": round(vol_1e10 / 1e12, 2),
            "cluster": "1000 nodes x 10 Gb/s, bisection = N/2 x link",
            "shuffle_plane_wave_sec": round(shuffle_plane_sec, 1),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
