"""Hashing helpers.

Two families:

* **Engine hashes** — Spark built-ins, JVM-side: ``F.hash`` (murmur3_32,
  the north-rule bloom key over canonical URLs) and ``F.xxhash64`` (64-bit
  partitioning / salting key).
* **Portable hashes** — md5 hex strings, identical in Spark, DuckDB and
  Python: used wherever an external SQL oracle must reproduce the exact
  value (minhash signatures, exact-dedup keys, fingerprints).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def url_hash_expr(url_canon: Column) -> Column:
    """murmur3_32 of the canonical URL — bloom-filter key (int)."""
    return F.hash(url_canon)


def host_hash_expr(host: Column) -> Column:
    """64-bit host key used in the salted (priority_bucket, host_hash)
    range partitioning."""
    return F.xxhash64(host)


def md5_hex(s: str) -> str:
    """Python twin of SQL md5(s) — portable across Spark/DuckDB."""
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def minhash_expr(shingles: Column, perm: int) -> Column:
    """One minhash value for a shingle array: min over md5('{perm}|'||s).

    Lexicographic min over fixed-width hex strings == min over the
    underlying 128-bit integers, and is identical in Spark and DuckDB —
    which makes the signature oracle-checkable.
    """
    hashed = F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{perm}|"), s)))
    return F.array_min(hashed)


def minhash_sql(shingles_sql: str, perm: int) -> str:
    """DuckDB twin of :func:`minhash_expr` (list_transform + list_min)."""
    return (
        f"list_min(list_transform({shingles_sql}, s -> md5(concat('{perm}|', s))))"
    )
