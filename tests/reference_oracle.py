"""Pure-Python reference traversal oracles — moved to
crawl4ai_spark.oracles so `__spark_entry__.oracle_sql()` can materialize
driver fixtures from them; this shim keeps the historical test import
path working."""

from crawl4ai_spark.oracles import (  # noqa: F401
    best_first_oracle,
    bff_rows,
    bfs_oracle,
    bfs_rows,
    corpus_fetch_fn,
    dfs_oracle,
    dfs_rows,
    job_rows,
    page_links,
)
