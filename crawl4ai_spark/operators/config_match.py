"""Per-URL config selection (url_matcher / MatchMode).

Transcribes the reference's CrawlerRunConfig.is_match
(async_configs.py:1569-1612) and MemoryAdaptiveDispatcher.select_config
(async_dispatcher.py:101-125):

* a matcher is a glob string (fnmatch, case-sensitive), a Python
  callable, or a list mixing both; list results combine with
  MatchMode.OR / AND; non-str/callable entries are skipped; an empty
  list (or a list whose entries were all skipped) matches NOTHING;
* a config with NO matcher matches everything;
* ``select_config`` returns the FIRST matching config, else None — and a
  None selection means the URL is skipped with a failed result
  (async_dispatcher.py:241-263, metadata {"status": "no_config_match"}).

Spark surfaces:

* :func:`assign_config_expr` — pure-Catalyst path when every matcher is
  a glob string: a CASE WHEN chain of ``rlike`` on fnmatch-translated
  regexes, fully codegen'd (the scale path);
* :func:`assign_config` — general path (callables allowed) through an
  Arrow-batched pandas UDF running the exact pure-Python matcher.

Both add a ``config_name`` column; NULL = no match = skip-with-failure.
"""

from __future__ import annotations

import fnmatch
from dataclasses import dataclass, field
from typing import Callable, Iterator, Union

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

UrlMatcher = Union[str, Callable[[str], bool], list, None]

MATCH_OR = "or"
MATCH_AND = "and"


@dataclass
class RunConfig:
    """The slice of CrawlerRunConfig this engine parameterizes per URL:
    a name (keys the per-row parameter struct) + matcher + arbitrary
    params applied downstream (scrape mode, filters, delays...)."""

    name: str
    url_matcher: UrlMatcher = None
    match_mode: str = MATCH_OR
    params: dict = field(default_factory=dict)


def is_match(url: str, matcher: UrlMatcher, match_mode: str = MATCH_OR) -> bool:
    """async_configs.py:1569-1612 exact."""
    if matcher is None:
        return True
    if callable(matcher):
        return bool(matcher(url))
    if isinstance(matcher, str):
        return fnmatch.fnmatch(url, matcher)
    if isinstance(matcher, list):
        if not matcher:
            return False
        results = []
        for m in matcher:
            if callable(m):
                results.append(bool(m(url)))
            elif isinstance(m, str):
                results.append(fnmatch.fnmatch(url, m))
            else:
                continue  # skip invalid matchers
        if match_mode == MATCH_OR:
            return any(results) if results else False
        return all(results) if results else False
    return False


def select_config(url: str, configs: RunConfig | list[RunConfig] | None) -> RunConfig | None:
    """async_dispatcher.py:101-125 exact: first match wins; None ⇒ skip."""
    if isinstance(configs, RunConfig):
        return configs
    if not configs:
        return None
    for config in configs:
        if is_match(url, config.url_matcher, config.match_mode):
            return config
    return None


def _glob_only(configs: list[RunConfig]) -> bool:
    for c in configs:
        m = c.url_matcher
        if m is None or isinstance(m, str):
            continue
        if isinstance(m, list) and all(isinstance(x, str) or x is None for x in m):
            continue
        return False
    return True


def _fn_rx(pattern: str) -> str:
    # fnmatch.translate anchors only the END (\Z) — rlike is a substring
    # find, so without \A a pattern like 'doc?' would match 'xdoc5'
    return r"\A" + fnmatch.translate(pattern)


def _matcher_col(url: Column, c: RunConfig) -> Column:
    m = c.url_matcher
    if m is None:
        return F.lit(True)
    if isinstance(m, str):
        return url.rlike(_fn_rx(m))
    # list of glob strings (invalid entries skipped, as the reference does)
    pats = [x for x in m if isinstance(x, str)]
    if not pats:
        return F.lit(False)
    cols = [url.rlike(_fn_rx(p)) for p in pats]
    out = cols[0]
    for col in cols[1:]:
        out = (out | col) if c.match_mode == MATCH_OR else (out & col)
    return out


def assign_config_expr(url: Column, configs: list[RunConfig]) -> Column:
    """CASE WHEN chain — first matching config's name, NULL on no match.
    Requires glob-only matchers (checked); stays in whole-stage codegen."""
    if not _glob_only(configs):
        raise ValueError("assign_config_expr requires glob-string matchers only; "
                         "use assign_config for callable matchers")
    expr = F.lit(None).cast("string")
    for c in reversed(configs):
        expr = F.when(_matcher_col(url, c), F.lit(c.name)).otherwise(expr)
    return expr


def assign_config(
    frontier: DataFrame, configs: list[RunConfig], url_col: str = "url"
) -> DataFrame:
    """Adds ``config_name`` (NULL = no match).  Glob-only config sets take
    the pure-Catalyst path automatically; callables fall back to an
    Arrow-batched UDF over the exact pure-Python matcher."""
    if _glob_only(configs):
        return frontier.withColumn("config_name", assign_config_expr(F.col(url_col), configs))

    @F.pandas_udf(T.StringType())
    def pick(urls: pd.Series) -> pd.Series:
        return urls.map(
            lambda u: (lambda c: c.name if c is not None else None)(select_config(u, configs))
        )

    return frontier.withColumn("config_name", pick(F.col(url_col)))


def no_config_match_results(assigned: DataFrame, url_col: str = "url") -> DataFrame:
    """Rows whose config_name is NULL become failed results
    (async_dispatcher.py:241-263: success=False, html='',
    status 'no_config_match')."""
    return assigned.filter(F.col("config_name").isNull()).withColumn(
        "success", F.lit(False)
    ).withColumn("error_message", F.concat(F.lit("No matching configuration found for URL: "), F.col(url_col))).withColumn(
        "match_status", F.lit("no_config_match")
    )
