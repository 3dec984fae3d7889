"""Common Crawl index seeder — the paginated index-shard fetch shape.

Grafts the reference's CC source (async_url_seeder.py): latest-index
discovery from collinfo (``collinfo.json[0]["id"]``, :1744-1760), the
domain → CDX glob rule (:814-833), 503 retries with the (1, 3, 7)
backoff ladder (:839-856), and URL pattern matching on the streamed
records (:848 — every record is cached, only pattern matches are
yielded).  The real CDX API serves results in pages
(``showNumPages``/``page=N``); the reference streams one response, but
at corpus scale the paginated form is the only one that parallelizes —
so the page is the unit of work here: the driver discovers
(index, glob, n_pages) per domain, and every page fetch runs as one
task of a Spark job (mapInPandas over the page task list).

No network exists in this sandbox, so the index server is an injected
interface; :class:`SyntheticCCIndex` is the deterministic in-repo
implementation (with configurable transient 503s).  A production
deployment implements the same three methods over HTTP — the operator
shape (per-page tasks, retry ladder, pattern filter, downstream seeds
pipeline) is identical.
"""

from __future__ import annotations

import math
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CC_RETRY_DELAYS = (1, 3, 7)  # :843 — then give up


class CC503(Exception):
    """Transient index-server overload (HTTP 503)."""


def cc_glob(domain: str) -> str:
    """Domain → CDX glob (async_url_seeder.py:814-833): strip scheme /
    query / fragment / leading dots; keep an explicit path, else append
    ``/*``."""
    raw = re.sub(r"^https?://", "", domain).split("#", 1)[0].split("?", 1)[0].lstrip(".")
    return f"*.{raw}*" if "/" in raw else f"*.{raw}/*"


def _glob_rx(pattern: str) -> re.Pattern:
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    # (?s) must lead in Python re (Java regex tolerates it mid-pattern)
    return re.compile("(?s)^" + "".join(out) + "$")


def match_url(url: str, pattern: str) -> bool:
    """`_match` (:178-183) python twin of seeder.glob_match_expr: glob
    against the full URL, the scheme-stripped and www-stripped forms."""
    rx = _glob_rx(pattern)
    canon = re.sub(r"^[A-Za-z][A-Za-z0-9+.\-]*://", "", url)
    no_www = re.sub(r"^www\.", "", canon)
    return bool(rx.match(url) or rx.match(canon) or rx.match(no_www))


class SyntheticCCIndex:
    """Deterministic stand-in for index.commoncrawl.org.

    ``collinfo``: list of {"id": ...} dicts, latest first (the live
    endpoint's order).  ``records``: index_id → list of URLs in index
    order.  ``fail503``: (index_id, glob, page) → number of attempts
    that 503 before one succeeds."""

    def __init__(
        self,
        collinfo: list[dict],
        records: dict[str, list[str]],
        page_size: int = 10,
        fail503: dict | None = None,
    ):
        self._collinfo = collinfo
        self._records = records
        self.page_size = page_size
        self._fail503 = dict(fail503 or {})

    def collinfo(self) -> list[dict]:
        return list(self._collinfo)

    @staticmethod
    def _cdx_match(url: str, glob: str) -> bool:
        """CDX-server interpretation of the ``*.domain/path*`` glob:
        SURT-style domain matching — the apex host AND any subdomain
        match (the live index keys are SURT-form ``com,example)/path``,
        so ``*.example.com/*`` covers example.com itself), with a path
        prefix when the glob carries one.  This is the SERVER side of
        the match; the client-side pattern filter stays the reference's
        ``_match`` glob (match_url)."""
        body = glob[2:] if glob.startswith("*.") else glob
        if body.endswith("*"):
            body = body[:-1]
        if "/" in body:
            ghost, gpath = body.split("/", 1)
            gpath = "/" + gpath
        else:
            ghost, gpath = body, ""
        canon = re.sub(r"^[A-Za-z][A-Za-z0-9+.\-]*://", "", url)
        host, _, path = canon.partition("/")
        path = "/" + path
        return (host == ghost or host.endswith("." + ghost)) and path.startswith(gpath)

    def _matching(self, index_id: str, glob: str) -> list[str]:
        return [u for u in self._records.get(index_id, []) if self._cdx_match(u, glob)]

    def num_pages(self, index_id: str, glob: str) -> int:
        return math.ceil(len(self._matching(index_id, glob)) / self.page_size)

    def page(self, index_id: str, glob: str, page: int, attempt: int) -> list[str]:
        remaining = self._fail503.get((index_id, glob, page), 0)
        if attempt < remaining:
            raise CC503(f"{index_id} {glob} page {page} attempt {attempt}")
        rows = self._matching(index_id, glob)
        return rows[page * self.page_size : (page + 1) * self.page_size]


def latest_index(server) -> str:
    """collinfo.json[0]["id"] (:1756) — first entry is the newest crawl."""
    return server.collinfo()[0]["id"]


CC_SEED_SCHEMA = T.StructType(
    [
        T.StructField("domain", T.StringType()),
        T.StructField("page", T.IntegerType()),
        T.StructField("url", T.StringType()),
        T.StructField("attempts", T.IntegerType()),
    ]
)


def cc_seed(
    spark,
    server,
    domains: list[str],
    pattern: str = "*",
    index_id: str | None = None,
) -> DataFrame:
    """Paginated CC seed fetch → (domain, page, url, attempts).

    Driver: latest-index discovery + per-domain page counts (two cheap
    metadata calls).  Executors: ONE task per index page, each running
    the reference's retry ladder — ``attempts`` records how many 503s
    the page survived (a page failing more than len(CC_RETRY_DELAYS)
    times raises, like the reference's final re-raise).  Only records
    matching ``pattern`` are emitted (:848), exactly the reference's
    yield filter."""
    idx = index_id or latest_index(server)
    tasks = []
    for d in domains:
        glob = cc_glob(d)
        for p in range(server.num_pages(idx, glob)):
            tasks.append((d, glob, p))
    if not tasks:
        return spark.createDataFrame([], CC_SEED_SCHEMA)
    bc = spark.sparkContext.broadcast(server)

    def gen(batches):
        srv = bc.value
        for pdf in batches:
            rows = []
            for d, glob, p in zip(pdf["domain"], pdf["glob"], pdf["page"]):
                attempt = 0
                while True:
                    try:
                        urls = srv.page(idx, glob, int(p), attempt)
                        break
                    except CC503:
                        if attempt >= len(CC_RETRY_DELAYS):
                            raise  # give-up: the reference re-raises (:856)
                        attempt += 1  # ladder position = (1, 3, 7)[attempt-1] s
                for u in urls:
                    if match_url(u, pattern):
                        rows.append((d, int(p), u, attempt + 1))
            yield pd.DataFrame(rows, columns=["domain", "page", "url", "attempts"])

    task_df = spark.createDataFrame(
        tasks, "domain string, glob string, page int"
    ).repartition(min(len(tasks), spark.sparkContext.defaultParallelism))
    return task_df.mapInPandas(gen, CC_SEED_SCHEMA)
