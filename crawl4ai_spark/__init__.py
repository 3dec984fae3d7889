"""crawl4ai_spark — a PySpark-native crawl frontier + fetch scheduler.

A from-scratch, Spark-first re-expression of the capabilities of the
reference crawler (crawl4ai, surveyed in SURVEY.md): a URL frontier held
in snapshot-checkpointed tables, a partitioned-bloom + exact-anti-join
URL-seen set over canonicalized URLs, a per-host politeness scheduler
(token-bucket crawl delay + robots.txt broadcast dimension), a priority
queue realized as salted range partitioning on (priority_bucket,
host_hash), and an image+caption payload pipeline
(image_id, bytes, w, h, fmt, caption, phash) decoded via Arrow-batched
pandas UDFs.

Everything is DataFrame/SQL-first: scorers and filters are Catalyst
column expressions; Python appears only inside vectorized pandas UDFs
(URL canonicalization via urllib.parse, robots.txt via stdlib
RobotFileParser, image decode). No per-row Python UDFs, no RDDs.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
