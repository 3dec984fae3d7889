"""CacheValidator ladder tests (reference: cache_validator.py:83-270).

The operator (operators/cache.py validate_cache) and the oracle
(__spark_entry__._cache_val_oracle) are independent re-expressions of the
same ladder; the driver hash-compares them over 500 scenarios.  Here the
branches are pinned explicitly, quirks included.
"""

import pytest
from pyspark.sql import types as T

from crawl4ai_spark.functions.heads import head_fingerprint_py
from crawl4ai_spark.operators.cache import validate_cache

HEAD = '<head><title>T</title><meta name="description" content="d"></head>'
NO_SIGNAL_HEAD = "<head><script>x</script></head>"

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("stored_etag", T.StringType()),
        T.StructField("stored_last_modified", T.StringType()),
        T.StructField("stored_fp", T.StringType()),
        T.StructField("live_status", T.IntegerType()),
        T.StructField("live_head_html", T.StringType()),
        T.StructField("live_etag", T.StringType()),
        T.StructField("live_last_modified", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


def _run(spark, **kw):
    row = {
        "url": "u", "stored_etag": None, "stored_last_modified": None,
        "stored_fp": None, "live_status": 200, "live_head_html": HEAD,
        "live_etag": "E2", "live_last_modified": "L2", "error": None,
    }
    row.update(kw)
    df = spark.createDataFrame([tuple(row[f.name] for f in SCHEMA.fields)], SCHEMA)
    return validate_cache(df).collect()[0]


def test_304_fresh(spark):
    r = _run(spark, stored_etag="E1", live_status=304)
    assert r["status"] == "fresh"
    assert r["reason"] == "Server returned 304 Not Modified"
    assert r["new_etag"] is None and r["new_fingerprint"] is None


def test_fingerprint_match_fresh(spark):
    fp = head_fingerprint_py(HEAD)
    r = _run(spark, stored_etag="E1", stored_fp=fp)
    assert r["status"] == "fresh" and r["reason"] == "Head fingerprint matches"
    assert r["new_etag"] == "E2" and r["new_fingerprint"] == fp


def test_fingerprint_changed_stale(spark):
    r = _run(spark, stored_etag="E1", stored_fp="f" * 32)
    assert r["status"] == "stale" and r["reason"] == "Head fingerprint changed"
    assert r["new_fingerprint"] == head_fingerprint_py(HEAD)


def test_200_without_fp_generic_stale(spark):
    r = _run(spark, stored_last_modified="L1")
    assert r["status"] == "stale"
    assert r["reason"] == "Server returned 200, content may have changed"
    assert r["new_etag"] == "E2" and r["new_fingerprint"] is None


def test_no_signal_head_falls_to_generic_stale(spark):
    # headers + stored fp, but the live head has no signals → fingerprint
    # undecidable → generic 200-stale WITHOUT a new fingerprint
    r = _run(spark, stored_etag="E1", stored_fp="f" * 32, live_head_html=NO_SIGNAL_HEAD)
    assert r["status"] == "stale"
    assert r["reason"] == "Server returned 200, content may have changed"
    assert r["new_fingerprint"] is None


def test_fingerprint_only_paths(spark):
    fp = head_fingerprint_py(HEAD)
    assert _run(spark, stored_fp=fp)["status"] == "fresh"
    assert _run(spark, stored_fp="f" * 32)["status"] == "stale"


def test_fp_only_no_signal_head_unknown_quirk(spark):
    # cache_validator.py:180-184 — stored fp + signal-less head lands on
    # UNKNOWN with the "no etag…" reason even though a fingerprint exists
    r = _run(spark, stored_fp="f" * 32, live_head_html=NO_SIGNAL_HEAD)
    assert r["status"] == "unknown"
    assert r["reason"] == "No validation data available (no etag, last-modified, or fingerprint)"


def test_nothing_stored_unknown(spark):
    r = _run(spark)
    assert r["status"] == "unknown" and r["new_etag"] is None


def test_error_paths(spark):
    r = _run(spark, stored_etag="E1", error="timeout")
    assert r["status"] == "error" and r["reason"] == "Validation request timed out"
    r = _run(spark, stored_etag="E1", error="request:ConnectError")
    assert r["status"] == "error"
    assert r["reason"] == "Validation request failed: ConnectError"
    assert r["new_etag"] is None


def test_empty_string_stored_headers_are_absent(spark):
    # `if stored_etag:` truthiness — "" behaves like None (falls to the
    # fingerprint-only / unknown arm, NOT the conditional-request arm)
    r = _run(spark, stored_etag="", live_status=304)
    assert r["status"] == "unknown"
