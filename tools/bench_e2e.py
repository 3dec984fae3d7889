#!/usr/bin/env python
"""End-to-end CrawlJob throughput: seeds → waves → drained frontier over
a deterministic synthetic web (no images, politeness on, robots on,
bloom dedup on, snapshots + lineage written every wave).

    python tools/bench_e2e.py [n_hosts] [pages_per_host] [cpus]

Prints one JSON line: pages crawled, wall seconds, pages/sec, per-wave
stats. 3000×20 reproduces the round-1 "60k pages" headline row.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_hosts = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    pages_per_host = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else int(os.environ.get("SPARK_GRAFT_CPUS", 32))

    if os.path.isdir("/dev/shm") and not os.environ.get("SPARK_LOCAL_DIRS"):
        os.makedirs("/dev/shm/spark-local", exist_ok=True)
        os.environ["SPARK_LOCAL_DIRS"] = "/dev/shm/spark-local"

    from crawl4ai_spark.session import get_spark
    from crawl4ai_spark.operators.traversal import canonical_corpus_fetcher
    from crawl4ai_spark.pipeline import CrawlJob, JobConfig
    from crawl4ai_spark.sources.corpus import generate_corpus, page_url

    spark = get_spark(master=f"local[{cpus}]", app_name="bench_e2e", shuffle_partitions=max(cpus, 8))

    t_gen = time.time()
    corpus = generate_corpus(seed=42, n_hosts=n_hosts, pages_per_host=pages_per_host, with_images=False)
    pages = spark.createDataFrame(corpus["pages"]).repartition(cpus * 2).cache()
    n_world = pages.count()
    robots = spark.createDataFrame(corpus["robots"])
    seeds = spark.createDataFrame([(page_url(h, 0),) for h in range(n_hosts)], "url string")
    print(f"world: {n_world} pages in {time.time()-t_gen:.1f}s", file=sys.stderr)

    cfg = JobConfig(
        max_depth=4, wave_budget=1000.0, default_delay=1.0,
        use_bloom=True, bloom_partitions=16, bloom_bits=1 << 20,
        emit_images=False,
    )
    root = tempfile.mkdtemp(prefix="bench_e2e_", dir="/dev/shm")
    job = CrawlJob(spark, canonical_corpus_fetcher(pages), catalog_root=root, config=cfg, robots=robots)
    job.seed(seeds)
    t0 = time.time()
    summary = job.run(max_waves=10)
    dt = time.time() - t0
    crawled = summary["pages_crawled"]
    print(
        json.dumps(
            {
                "world_pages": n_world,
                "pages_crawled": crawled,
                "waves": summary["waves"],
                "seconds": round(dt, 1),
                "pages_per_sec": round(crawled / dt, 1),
                "cpus": cpus,
                "wave_ms": [s["duration_ms"] for s in summary["stats"]],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
