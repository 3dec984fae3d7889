"""URL filters as Catalyst boolean column expressions.

Builders return ``url Column -> Column<boolean>`` closures mirroring the
reference's URLFilter classes (deep_crawling/filters.py).  A FilterChain
is a plain conjunction — Catalyst reorders deterministic predicates
itself, which replaces the reference's hand-written sync-first
short-circuit (filters.py:91-116).
"""

from __future__ import annotations

import fnmatch
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from .scorers import domain_expr

# extension → MIME (transcribed from filters.py:272-368)
MIME_MAP = {
    "txt": "text/plain", "html": "text/html", "htm": "text/html",
    "xhtml": "application/xhtml+xml", "css": "text/css", "csv": "text/csv",
    "ics": "text/calendar", "js": "application/javascript",
    "bmp": "image/bmp", "gif": "image/gif", "jpeg": "image/jpeg",
    "jpg": "image/jpeg", "png": "image/png", "svg": "image/svg+xml",
    "tiff": "image/tiff", "ico": "image/x-icon", "webp": "image/webp",
    "mp3": "audio/mpeg", "wav": "audio/wav", "ogg": "audio/ogg",
    "m4a": "audio/mp4", "aac": "audio/aac",
    "mp4": "video/mp4", "mpeg": "video/mpeg", "webm": "video/webm",
    "avi": "video/x-msvideo", "mov": "video/quicktime", "flv": "video/x-flv",
    "wmv": "video/x-ms-wmv", "mkv": "video/x-matroska",
    "json": "application/json", "xml": "application/xml",
    "pdf": "application/pdf", "zip": "application/zip",
    "gz": "application/gzip", "tar": "application/x-tar",
    "rar": "application/vnd.rar", "7z": "application/x-7z-compressed",
    "exe": "application/vnd.microsoft.portable-executable",
    "msi": "application/x-msdownload",
    "woff": "font/woff", "woff2": "font/woff2", "ttf": "font/ttf",
    "otf": "font/otf",
    "doc": "application/msword", "dot": "application/msword",
    "docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "xlsx": "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "xls": "application/vnd.ms-excel", "ppt": "application/vnd.ms-powerpoint",
    "pptx": "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    "odt": "application/vnd.oasis.opendocument.text",
    "ods": "application/vnd.oasis.opendocument.spreadsheet",
    "odp": "application/vnd.oasis.opendocument.presentation",
    "tgz": "application/gzip", "bz2": "application/x-bzip2",
    "rtf": "application/rtf", "apk": "application/vnd.android.package-archive",
    "epub": "application/epub+zip", "jar": "application/java-archive",
    "swf": "application/x-shockwave-flash", "midi": "audio/midi",
    "mid": "audio/midi", "ps": "application/postscript",
    "ai": "application/postscript", "eps": "application/postscript",
    "bin": "application/octet-stream", "dmg": "application/x-apple-diskimage",
    "iso": "application/x-iso9660-image", "deb": "application/x-debian-package",
    "rpm": "application/x-rpm", "sqlite": "application/vnd.sqlite3",
    "unknown": "application/octet-stream",
    "php": "application/x-httpd-php", "php3": "application/x-httpd-php",
    "php4": "application/x-httpd-php", "php5": "application/x-httpd-php",
    "php7": "application/x-httpd-php", "phtml": "application/x-httpd-php",
    "phps": "application/x-httpd-php-source",
}


def url_pattern(patterns: str | list[str], reverse: bool = False):
    """Glob/regex pattern filter (filters.py:119-263).

    The reference categorizes patterns into suffix/prefix/domain/regex
    fast paths; those are an interpreter optimization that Catalyst's
    codegen makes unnecessary — semantics preserved, dispatch dropped:

    * ``*.html`` (one star, leading "*.") → extension-of-last-path-segment
      equality against the pre-query string;
    * ``/foo/*`` (one star, trailing "/*") → path-boundary-checked prefix
      on the pre-query string;
    * ``*.example.com...`` with "://" → regex with "*." → "[^/]+\\.";
    * leading ^ / trailing $ / "\\d" → raw regex, ``search`` semantics;
    * everything else → fnmatch.translate, ``search`` semantics.
    """
    pats = [patterns] if isinstance(patterns, str) else list(patterns)
    suffixes, prefixes, domain_res, path_res = [], [], [], []
    for p in pats:
        if p.startswith("^") or p.endswith("$") or "\\d" in p:
            path_res.append(p)
        elif p.count("*") == 1 and p.startswith("*."):
            suffixes.append(p[2:])
        elif p.count("*") == 1 and p.endswith("/*"):
            prefixes.append(p[:-2])
        elif "://" in p and p.startswith("*."):
            domain_res.append(p.replace("*.", r"[^/]+\."))
        else:
            q = p
            if "**" in q:
                q = q.replace("**", ".*")
            if "{" in q:
                q = re.sub(r"\{([^}]+)\}", lambda m: f"({'|'.join(m.group(1).split(','))})", q)
            path_res.append(fnmatch.translate(q))

    def flt(url: Column) -> Column:
        cond = F.lit(False)
        if suffixes:
            pre_query = F.split(url, r"\?").getItem(0)
            last_seg = F.element_at(F.split(pre_query, "/"), -1)
            ext = F.element_at(F.split(last_seg, r"\."), -1)
            cond = cond | ext.isin(*suffixes)
        for d in domain_res:
            cond = cond | url.rlike("^(?:" + d + ")")  # re.match → anchored
        for p in prefixes:
            pre_query = F.split(url, r"\?").getItem(0)
            boundary = F.substring(pre_query, len(p) + 1, 1)
            cond = cond | (
                pre_query.startswith(p)
                & ((F.length(pre_query) == len(p)) | boundary.isin("/", "?", "#"))
            )
        for p in path_res:
            cond = cond | url.rlike(p)  # re.search semantics
        return ~cond if reverse else cond

    return flt


def extension_of_path_expr(url: Column) -> Column:
    """filters.py:374-389: extension of the last path segment (scheme and
    domain stripped first); '' when the filename has no dot."""
    after_scheme = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    path = F.regexp_extract(after_scheme, r"(/.*)$", 1)
    filename = F.when(path.contains("/"), F.element_at(F.split(path, "/"), -1)).otherwise(F.lit(""))
    return F.when(
        filename.contains("."), F.lower(F.regexp_extract(filename, r"\.([^.]*)$", 1))
    ).otherwise(F.lit(""))


def content_type(allowed_types: str | list[str]):
    """MIME allow-list by extension (filters.py:266-429): extensionless
    URLs pass; otherwise the mapped MIME must contain one of the allowed
    type substrings."""
    allowed = [allowed_types] if isinstance(allowed_types, str) else list(allowed_types)
    ok_exts = sorted(
        e for e, m in MIME_MAP.items() if any(a.lower() in m for a in allowed)
    )

    def flt(url: Column) -> Column:
        ext = extension_of_path_expr(url)
        return (ext == "") | ext.isin(*ok_exts)

    return flt


def domain(allowed_domains=None, blocked_domains=None):
    """Blocked-then-allowed, subdomain-inclusive (filters.py:432-506)."""
    # reference: `frozenset(...) if allowed_domains else None` — a FALSY
    # allow-list ([], "", None) means "no restriction", not "reject all"
    allowed = None if not allowed_domains else [d.lower() for d in (
        [allowed_domains] if isinstance(allowed_domains, str) else allowed_domains
    )]
    blocked = [] if blocked_domains is None else [d.lower() for d in (
        [blocked_domains] if isinstance(blocked_domains, str) else blocked_domains
    )]

    def flt(url: Column) -> Column:
        if not blocked and allowed is None:
            return F.lit(True)
        dom = F.lower(F.regexp_extract(url, r"://([^/]+)", 1))
        ok = F.lit(True)
        for b in blocked:
            ok = ok & ~((dom == b) | dom.endswith("." + b))
        if allowed is not None:
            any_allowed = F.lit(False)
            for a in allowed:
                any_allowed = any_allowed | (dom == a) | dom.endswith("." + a)
            ok = ok & any_allowed
        return ok

    return flt


def url_quality_score_expr(url: Column) -> Column:
    """SEOFilter's URL-quality feature (filters.py:682-698 exact):
    multiplicative penalties on the lowercased urlparse *path* — len>80
    ×0.7, a 4-digit run ×0.8, query present ×0.6, underscore ×0.9."""
    raw_path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    # urlparse splits the LAST segment's ';params' out of .path — strip it
    path = F.lower(F.regexp_replace(raw_path, r";[^/]*$", ""))
    # anchored before any fragment: a '?' appearing only after '#' is part
    # of the fragment, not a query (urlparse semantics)
    query = F.regexp_extract(url, r"^[^#]*?\?([^#]*)", 1)
    score = F.lit(1.0)
    score = score * F.when(F.length(path) > 80, F.lit(0.7)).otherwise(F.lit(1.0))
    score = score * F.when(path.rlike(r"\d{4}"), F.lit(0.8)).otherwise(F.lit(1.0))
    score = score * F.when(query != "", F.lit(0.6)).otherwise(F.lit(1.0))
    score = score * F.when(path.contains("_"), F.lit(0.9)).otherwise(F.lit(1.0))
    return score


def head_bm25_score_expr(
    title: Column,
    description: Column,
    keywords: Column,
    all_meta: Column,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    avgdl: int = 1000,
) -> Column:
    """ContentRelevanceFilter's simplified BM25 over the weighted head
    document (filters.py:509-585).  Pinned quirk: field weighting is
    PYTHON STRING REPETITION — ``title * 3`` concatenates copies with no
    separator, so the boundary tokens fuse ('a b'*3 → 'a ba ba b').
    ``all_meta`` is the space-joined concatenation of every meta value
    (which re-includes description/keywords, as ``meta.values()`` does).
    IDF = log(2/(tf+0.5)+1) — a per-document constant-N variant."""
    doc = F.concat_ws(
        " ",
        F.repeat(F.coalesce(title, F.lit("")), 3),
        F.repeat(F.coalesce(description, F.lit("")), 2),
        F.coalesce(keywords, F.lit("")),
        F.coalesce(all_meta, F.lit("")),
    )
    toks = F.filter(F.split(F.lower(doc), r"\s+"), lambda t: t != "")
    dl = F.size(toks).cast("double")
    score = F.lit(0.0)
    for term in sorted({t for t in " ".join(query_terms).lower().split()}):
        tf = F.size(F.filter(toks, lambda t: t == F.lit(term))).cast("double")
        idf = F.log(F.lit(2.0) / (tf + 0.5) + 1.0)
        score = score + idf * (tf * (k1 + 1.0)) / (
            tf + k1 * (1.0 - b + b * (dl / float(avgdl)))
        )
    return score


SEO_DEFAULT_WEIGHTS = {
    "title_length": 0.15,
    "title_kw": 0.18,
    "meta_description": 0.12,
    "canonical": 0.10,
    "robot_ok": 0.20,
    "schema_org": 0.10,
    "url_quality": 0.15,
}


def seo_score_expr(
    url: Column,
    title: Column,
    description: Column,
    canonical: Column,
    robots: Column,
    head_html: Column,
    keywords: list[str] | None = None,
    weights: dict[str, float] | None = None,
) -> Column:
    """SEOFilter's quantitative head-quality score (filters.py:588-698):
    weighted sum of title-length band, keyword hits (0.3 each, capped),
    meta-description band, canonical match, robots noindex gate, ld+json
    presence, and URL quality."""
    w = weights or SEO_DEFAULT_WEIGHTS
    t_len = F.length(F.coalesce(title, F.lit("")))
    title_length = (
        F.when((t_len >= 50) & (t_len <= 60), 1.0)
        .when(((t_len >= 40) & (t_len < 50)) | ((t_len > 60) & (t_len <= 70)), 0.7)
        .otherwise(0.3)
    )
    if keywords:
        pat = r"(?i)\b(" + "|".join(re.escape(k) for k in keywords) + r")\b"
        matches = F.size(F.regexp_extract_all(F.coalesce(title, F.lit("")), F.lit(pat), 0))
        title_kw = F.least(matches.cast("double") * 0.3, F.lit(1.0))
    else:
        title_kw = F.lit(0.0)
    d_len = F.length(F.coalesce(description, F.lit("")))
    meta_description = (
        F.when((d_len >= 140) & (d_len <= 160), 1.0)
        .when((d_len >= 120) & (d_len <= 200), 0.5)
        .otherwise(0.2)
    )
    canonical_s = (
        F.when(canonical.isNull() | (canonical == ""), 0.5)
        .when(canonical == url, 1.0)
        .otherwise(0.2)
    )
    robot_ok = F.when(F.coalesce(robots, F.lit("")).contains("noindex"), 0.0).otherwise(1.0)
    schema_org = F.when(
        F.coalesce(head_html, F.lit("")).rlike(r"""<script[^>]+type=["']application/ld\+json"""),
        1.0,
    ).otherwise(0.0)
    parts = {
        "title_length": title_length,
        "title_kw": title_kw,
        "meta_description": meta_description,
        "canonical": canonical_s,
        "robot_ok": robot_ok,
        "schema_org": schema_org,
        "url_quality": url_quality_score_expr(url),
    }
    total = F.lit(0.0)
    for factor, weight in w.items():
        total = total + F.lit(float(weight)) * parts[factor]
    return total


def chain(*filters):
    """FilterChain.apply = AND of all member predicates (filters.py:91-116)."""

    def flt(url: Column) -> Column:
        cond = F.lit(True)
        for f in filters:
            cond = cond & f(url)
        return cond

    return flt
