"""URL scorers as Catalyst column expressions.

Each builder returns ``url Column -> score Column`` (a closure), so
scorers compose exactly like the reference's URLScorer objects
(scorers.py:63-519) while staying entirely inside WholeStageCodegen —
no Python in the scoring hot path.  Weights are squeezed through float32
first (``ctypes.c_float`` semantics, scorers.py:68) so weighted scores
match the reference bit-for-bit.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

Scorer = "Callable[[Column], Column]"

_SCORE_LOOKUP = [1.0, 0.5, 0.3333333333333333, 0.25]  # scorers.py:14
_FRESHNESS_SCORES = [1.0, 0.9, 0.8, 0.7, 0.6, 0.5]  # scorers.py:17-24


def _w(weight: float) -> float:
    """float32 round-trip (reference stores weights as c_float)."""
    return float(np.float32(weight))


def keyword_relevance(keywords: list[str], weight: float = 1.0, case_sensitive: bool = False):
    """matches/len(keywords) by substring containment (scorers.py:160-188)."""
    kws = [k if case_sensitive else k.lower() for k in keywords]

    def scorer(url: Column) -> Column:
        target = url if case_sensitive else F.lower(url)
        hits = sum(
            (F.instr(target, k) > 0).cast("double") for k in kws
        ) if kws else F.lit(0.0)
        return (hits / F.lit(float(len(kws) or 1))) * F.lit(_w(weight))

    return scorer


def path_depth_expr(url: Column) -> Column:
    """Segment count of the path after the authority (scorers.py:198-230:
    consecutive slashes collapse, trailing slash ignored)."""
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/]*(/.*)?$", 1)
    segs = F.filter(F.split(path, "/"), lambda x: x != "")
    return F.size(segs)


def path_depth(optimal_depth: int = 3, weight: float = 1.0):
    """lookup [1.0, .5, .3333, .25] by |depth-optimal|, else 1/(1+d)
    (scorers.py:232-245)."""

    def scorer(url: Column) -> Column:
        dist = F.abs(path_depth_expr(url) - F.lit(optimal_depth))
        expr = F.lit(1.0) / (F.lit(1.0) + dist)
        for d in range(3, -1, -1):
            expr = F.when(dist == d, F.lit(_SCORE_LOOKUP[d])).otherwise(expr)
        return expr * F.lit(_w(weight))

    return scorer


def extension_expr(url: Column) -> Column:
    """Last-dot alnum run, lowercased (scorers.py:273-302 quick_extension)."""
    return F.lower(F.regexp_extract(url, r"^.*\.([A-Za-z0-9]+)", 1))


def content_type(type_weights: dict[str, float], weight: float = 1.0):
    """'.ext$' patterns → exact extension lookup; other patterns → regex
    search ordered by score desc (scorers.py:247-330)."""
    exact: dict[str, float] = {}
    regex: list[tuple[str, float]] = []
    for pattern, score in type_weights.items():
        if pattern.startswith(".") and pattern.endswith("$"):
            exact[pattern[1:-1]] = score
        else:
            regex.append((pattern, score))
    regex.sort(key=lambda x: -x[1])

    def scorer(url: Column) -> Column:
        expr = F.lit(0.0)
        for pat, sc in reversed(regex):
            expr = F.when(url.rlike(pat), F.lit(sc)).otherwise(expr)
        if exact:
            ext = extension_expr(url)
            mapping = F.lit(0.0)
            for e, sc in exact.items():
                mapping = F.when(ext == e, F.lit(sc)).otherwise(mapping)
            hit = ext.isin(*exact.keys())
            expr = F.when((ext != "") & hit, mapping).otherwise(expr)
        return expr * F.lit(_w(weight))

    return scorer


def freshness_year_expr(url: Column, current_year: int = 2024) -> Column:
    """Latest plausible year in the URL (scorers.py:353-379): years
    1900-2099 preceded by / - or _, capped at current_year; null if none.
    The reference pattern CONSUMES an optional /mm[/dd] tail, so
    non-overlapping matching skips month/day digits that would otherwise
    read as extra years (e.g. '/2023-08-2024…' finds only 2023+…)."""
    years = F.regexp_extract_all(
        url,
        F.lit(r"(?:/|[-_])((?:19|20)\d{2})(?:(?:/|[-_])\d{2}(?:(?:/|[-_])\d{2})?)?"),
        1,
    )
    ints = F.transform(years, lambda y: y.cast("int"))
    valid = F.filter(ints, lambda y: y <= F.lit(current_year))
    return F.array_max(valid)


def freshness(weight: float = 1.0, current_year: int = 2024):
    """[1.0,.9,.8,.7,.6,.5] by age, else max(0.1, 1-0.1*diff); no year →
    0.5 (scorers.py:381-412)."""

    def scorer(url: Column) -> Column:
        year = freshness_year_expr(url, current_year)
        diff = F.lit(current_year) - year
        expr = F.greatest(F.lit(0.1), F.lit(1.0) - diff * F.lit(0.1))
        for d in range(len(_FRESHNESS_SCORES) - 1, -1, -1):
            expr = F.when(diff == d, F.lit(_FRESHNESS_SCORES[d])).otherwise(expr)
        expr = F.when(year.isNull(), F.lit(0.5)).otherwise(expr)
        return expr * F.lit(_w(weight))

    return scorer


def domain_expr(url: Column) -> Column:
    """Domain between '://' and first /?#, port-stripped, lowercased
    (scorers.py:456-494)."""
    return F.lower(
        F.split(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1), ":").getItem(0)
    )


def domain_authority(domain_weights: dict[str, float], default_weight: float = 0.5, weight: float = 1.0):
    """domain → weight map with default (scorers.py:414-519). Small dict →
    inlined CASE (codegen); large dict should become a broadcast join."""
    dw = {d.lower(): s for d, s in domain_weights.items()}

    def scorer(url: Column) -> Column:
        dom = domain_expr(url)
        expr = F.lit(float(default_weight))
        for d, s in dw.items():
            expr = F.when(dom == d, F.lit(float(s))).otherwise(expr)
        return expr * F.lit(_w(weight))

    return scorer


def composite(scorers: list, normalize: bool = True):
    """Sum of children's weighted scores, ÷ count when normalize
    (scorers.py:91-158).  Pinned quirk: the reference accumulates child
    scores through a pre-allocated ``array('f')`` (scorers.py:113,136),
    so every child score is float32-truncated before the float64 sum —
    reproduced with a float↔double cast round-trip."""

    def scorer(url: Column) -> Column:
        total = F.lit(0.0)
        for s in scorers:
            total = total + s(url).cast("float").cast("double")
        if normalize and scorers:
            total = total / F.lit(float(len(scorers)))
        return total

    return scorer
