"""Cache-read path: frontier ⟕ results-cache with freshness validation.

Re-expresses the reference's cache lifecycle
(/root/reference/crawl4ai/async_webcrawler.py:269-335 + cache_validator.py)
as one left join plus a CASE column:

* no cached row                         → ``miss``  (fetch)
* cached, freshness check disabled      → ``hit``
* cached, etag or head-fingerprint
  matches the live head                 → ``hit_validated``
* cached, live head unavailable
  (validator ERROR → use cache)         → ``hit_fallback``
* cached but live head differs (STALE)  → ``miss`` (force recrawl)

The reference runs a HEAD request per URL at crawl time; at engine
scale the "live head" is itself a table (the HEAD-peek stage's output,
SURVEY §2.1), so validation is a second broadcast-or-shuffle equi-join
on url instead of per-row I/O.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cache_lookup(
    frontier: DataFrame,
    cache: DataFrame | None,
    live_heads: DataFrame | None = None,
    check_freshness: bool = False,
    url_col: str = "url",
) -> DataFrame:
    """Adds ``cache_status`` ∈ {hit, hit_validated, hit_fallback, miss}
    and ``cached_html`` (null on miss/stale).

    ``cache``: (url, html, etag, head_fingerprint).
    ``live_heads``: (url, etag, head_fingerprint) — current values from
    the HEAD-peek stage; rows absent ⇒ validation ERROR ⇒ fallback.
    """
    if cache is None:
        return frontier.withColumn("cache_status", F.lit("miss")).withColumn(
            "cached_html", F.lit(None).cast("string")
        )
    c = cache.select(
        F.col(url_col),
        F.col("html").alias("_c_html"),
        F.col("etag").alias("_c_etag"),
        F.col("head_fingerprint").alias("_c_fp"),
    )
    out = frontier.join(c, url_col, "left")
    if not check_freshness or live_heads is None:
        status = F.when(F.col("_c_html").isNotNull(), "hit").otherwise("miss")
        return (
            out.withColumn("cache_status", status)
            .withColumn("cached_html", F.col("_c_html"))
            .drop("_c_html", "_c_etag", "_c_fp")
        )
    lh = live_heads.select(
        F.col(url_col),
        F.col("etag").alias("_l_etag"),
        F.col("head_fingerprint").alias("_l_fp"),
        F.lit(True).alias("_l_present"),
    )
    out = out.join(lh, url_col, "left")
    fresh = (
        (F.col("_c_etag").isNotNull() & (F.col("_c_etag") == F.col("_l_etag")))
        | (F.col("_c_fp").isNotNull() & (F.col("_c_fp") == F.col("_l_fp")))
    )
    status = (
        F.when(F.col("_c_html").isNull(), "miss")
        .when(F.col("_l_present").isNull(), "hit_fallback")
        .when(fresh, "hit_validated")
        .otherwise("miss")  # STALE/UNKNOWN → force recrawl
    )
    return (
        out.withColumn("cache_status", status)
        .withColumn(
            "cached_html",
            F.when(F.col("cache_status") != "miss", F.col("_c_html")),
        )
        .drop("_c_html", "_c_etag", "_c_fp", "_l_etag", "_l_fp", "_l_present")
    )


# ---------------------------------------------------------------------------
# CacheMode / CacheContext (cache_context.py:1-117)
# ---------------------------------------------------------------------------

CACHE_ENABLED = "enabled"
CACHE_DISABLED = "disabled"
CACHE_READ_ONLY = "read_only"
CACHE_WRITE_ONLY = "write_only"
CACHE_BYPASS = "bypass"

_CACHE_MODES = {CACHE_ENABLED, CACHE_DISABLED, CACHE_READ_ONLY, CACHE_WRITE_ONLY, CACHE_BYPASS}


def _check_mode(cache_mode: str) -> None:
    if cache_mode not in _CACHE_MODES:
        raise ValueError(f"unknown cache_mode: {cache_mode!r} (expected one of {sorted(_CACHE_MODES)})")


def is_cacheable_expr(url):
    """CacheContext.is_cacheable (:54): http/https/file URLs only —
    raw: HTML is never cached."""
    return (
        url.startswith("http://") | url.startswith("https://") | url.startswith("file://")
    )


def should_read_expr(url, cache_mode: str = CACHE_ENABLED, always_bypass: bool = False):
    """CacheContext.should_read (:60-73) as a boolean column.  Unknown
    modes raise (the reference makes them unrepresentable via the enum)."""
    _check_mode(cache_mode)
    if always_bypass or cache_mode not in (CACHE_ENABLED, CACHE_READ_ONLY):
        return F.lit(False)
    return is_cacheable_expr(url)


def should_write_expr(url, cache_mode: str = CACHE_ENABLED, always_bypass: bool = False):
    """CacheContext.should_write (:75-88)."""
    _check_mode(cache_mode)
    if always_bypass or cache_mode not in (CACHE_ENABLED, CACHE_WRITE_ONLY):
        return F.lit(False)
    return is_cacheable_expr(url)


def cache_lookup_mode(
    frontier: DataFrame,
    cache: DataFrame | None,
    cache_mode: str = CACHE_ENABLED,
    live_heads: DataFrame | None = None,
    check_freshness: bool = False,
    url_col: str = "url",
    always_bypass: bool = False,
) -> DataFrame:
    """Mode-aware cache read: rows whose CacheContext.should_read is
    False stay ``miss`` regardless of cache contents (BYPASS/DISABLED/
    WRITE_ONLY semantics); eligible rows go through the freshness-
    validated lookup.  When the MODE itself forbids reading, the cache
    joins are skipped entirely (the join would only be overwritten to
    miss — Catalyst can't prune it because a left join may change
    multiplicity)."""
    _check_mode(cache_mode)
    if always_bypass or cache_mode not in (CACHE_ENABLED, CACHE_READ_ONLY):
        return cache_lookup(frontier, None, url_col=url_col)
    out = cache_lookup(
        frontier, cache, live_heads=live_heads, check_freshness=check_freshness,
        url_col=url_col,
    )
    readable = should_read_expr(F.col(url_col), cache_mode, always_bypass)
    return out.withColumn(
        "cache_status", F.when(readable, F.col("cache_status")).otherwise(F.lit("miss"))
    ).withColumn(
        "cached_html", F.when(readable, F.col("cached_html"))
    )


# ---------------------------------------------------------------------------
# CacheValidator decision ladder (cache_validator.py:83-270)
# ---------------------------------------------------------------------------
#
# The reference's validator makes the HTTP round-trips itself (HEAD with
# If-None-Match/If-Modified-Since, then a bounded <head> fetch); here the
# live observations arrive as columns (status code, head HTML, etag,
# last-modified, error marker — the fetch plane, same I/O ruling as
# elsewhere) and the DECISION ladder is reproduced exactly, all JVM-side:
#
#   error                      → ERROR  (timeout / request-failure reasons)
#   conditional headers stored:
#     304                      → FRESH "Server returned 304 Not Modified"
#     200 + stored fp + head:
#       fp match               → FRESH "Head fingerprint matches"
#       fp changed             → STALE "Head fingerprint changed"
#       fp empty (no signals)  → fall through
#     200                      → STALE "Server returned 200, content may
#                                       have changed"
#   no headers + stored fp + head:
#       fp match / changed     → FRESH / STALE (as above)
#       fp empty               → fall through
#   otherwise                  → UNKNOWN "No validation data available
#                                 (no etag, last-modified, or fingerprint)"
#
# Pinned quirk: with only a stored fingerprint and a no-signal live head,
# the ladder lands on UNKNOWN with the "no etag…" reason even though a
# fingerprint WAS stored (cache_validator.py:180-184).

VALIDATION_FRESH = "fresh"
VALIDATION_STALE = "stale"
VALIDATION_UNKNOWN = "unknown"
VALIDATION_ERROR = "error"


def validate_cache(entries: DataFrame) -> DataFrame:
    """Columnar CacheValidator.validate: input columns ``url, stored_etag,
    stored_last_modified, stored_fp, live_status, live_head_html,
    live_etag, live_last_modified, error`` (error: 'timeout' |
    'request:<ExcName>' | NULL) → ``status, reason, new_etag,
    new_last_modified, new_fingerprint``."""
    from ..functions.heads import head_fingerprint_expr

    # `if stored_etag:` truthiness — empty strings count as absent
    has_headers = (
        (F.col("stored_etag").isNotNull() & (F.col("stored_etag") != ""))
        | (F.col("stored_last_modified").isNotNull() & (F.col("stored_last_modified") != ""))
    )
    has_fp = F.col("stored_fp").isNotNull() & (F.col("stored_fp") != "")
    nf = head_fingerprint_expr(F.col("live_head_html"))
    has_head = F.col("live_head_html").isNotNull() & (F.col("live_head_html") != "")
    fp_decided = has_fp & has_head & (nf != "")
    fp_match = fp_decided & (nf == F.col("stored_fp"))
    is_timeout = F.col("error") == "timeout"
    is_req_err = F.col("error").startswith("request:")

    status = (
        F.when(is_timeout | is_req_err, F.lit(VALIDATION_ERROR))
        .when(F.col("error").isNotNull(), F.lit(VALIDATION_ERROR))
        .when(has_headers & (F.col("live_status") == 304), F.lit(VALIDATION_FRESH))
        .when(has_headers & fp_match, F.lit(VALIDATION_FRESH))
        .when(has_headers & fp_decided, F.lit(VALIDATION_STALE))
        .when(has_headers, F.lit(VALIDATION_STALE))
        .when(fp_match, F.lit(VALIDATION_FRESH))
        .when(fp_decided, F.lit(VALIDATION_STALE))
        .otherwise(F.lit(VALIDATION_UNKNOWN))
    )
    reason = (
        F.when(is_timeout, F.lit("Validation request timed out"))
        .when(
            is_req_err,
            F.concat(F.lit("Validation request failed: "),
                     F.substring_index(F.col("error"), ":", -1)),
        )
        .when(F.col("error").isNotNull(),
              F.concat(F.lit("Validation error: "), F.col("error")))
        .when(has_headers & (F.col("live_status") == 304),
              F.lit("Server returned 304 Not Modified"))
        .when(fp_match, F.lit("Head fingerprint matches"))
        .when(fp_decided, F.lit("Head fingerprint changed"))
        .when(has_headers, F.lit("Server returned 200, content may have changed"))
        .otherwise(
            F.lit("No validation data available (no etag, last-modified, or fingerprint)")
        )
    )
    err_or_304 = (
        F.col("error").isNotNull() | (has_headers & (F.col("live_status") == 304))
    )
    keeps_new = ~err_or_304 & (has_headers | fp_decided)
    return entries.select(
        "url",
        status.alias("status"),
        reason.alias("reason"),
        F.when(keeps_new, F.col("live_etag")).alias("new_etag"),
        F.when(keeps_new, F.col("live_last_modified")).alias("new_last_modified"),
        F.when(~err_or_304 & fp_decided, nf).alias("new_fingerprint"),
    )
