"""spark-submit entry point: one frontier scheduling wave.

Usage:
    tools/build_pkg.sh          # builds dist/crawl4ai_spark.zip
    spark-submit --py-files dist/crawl4ai_spark.zip tools/submit_job.py [n_urls]

On a cluster, add --master/--num-executors etc.; the job code is
identical (nothing in the engine is local-mode-only).
"""

import sys

from pyspark.sql import SparkSession, functions as F


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = SparkSession.builder.appName("crawl4ai_spark_wave").getOrCreate()

    from crawl4ai_spark.functions.urls import normalize_deep_udf
    from crawl4ai_spark.operators.dedup import anti_join_seen, build_bloom
    from crawl4ai_spark.operators.scheduler import schedule_wave
    from crawl4ai_spark.sources.corpus import synth_frontier

    fr = synth_frontier(spark, n)
    seen = fr.filter(F.xxhash64("url") % 3 == 0).select("url")
    blooms = build_bloom(seen, n_partitions=8, m_bits=1 << 20)
    canon = fr.withColumn("canon", normalize_deep_udf(F.col("url"), F.col("url")))
    fresh = anti_join_seen(canon, seen, url_col="canon", blooms=blooms, n_partitions=8)
    sched = schedule_wave(
        fresh.select(
            F.col("canon").alias("url"), "host", "score", "depth",
            F.lit(0).alias("priority_bucket"),
        ),
        None, wave_start=0.0, wave_budget=60.0, default_delay=0.5,
    )
    admitted = sched.filter("admitted").count()
    print(f"WAVE_OK n={n} admitted={admitted}")
    spark.stop()


if __name__ == "__main__":
    main()
