"""Head-fingerprint graft tests (reference: utils.py compute_head_fingerprint,
consumed by the cache freshness path async_webcrawler.py:273-315).

The xxhash lib is absent, so the graft substitutes md5 (fingerprints are
opaque equality tokens).  Parity is proven by running the REFERENCE'S OWN
extracted function with an md5 shim injected for ``xxhash`` — every signal
scrape (title, seven metas, both attribute orders, empty-content matches,
break-on-first-pattern) is then cross-executed, with only the final hash
call swapped identically on both sides.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from reference_loader import load_defs

from crawl4ai_spark.functions.heads import head_fingerprint_expr, head_fingerprint_py


class _Md5Shim:
    """Stands in for the xxhash module: xxh64(b).hexdigest() -> md5 hex."""

    @staticmethod
    def xxh64(data: bytes):
        class _H:
            def hexdigest(self, _d=data):
                return hashlib.md5(_d).hexdigest()

        return _H()


@pytest.fixture(scope="module")
def ref_fp():
    return load_defs("utils.py", ["compute_head_fingerprint"], extra={"xxhash": _Md5Shim})[
        "compute_head_fingerprint"
    ]


CASES = [
    "",
    "<head></head>",
    "<head><script>x</script></head>",
    "<head><title>Simple</title></head>",
    "<head><title>  Padded  </title></head>",
    "<head><title>Multi\nline\ntitle</title></head>",
    "<head><TITLE>Upper Tag</TITLE></head>",
    '<head><meta name="description" content="d1"></head>',
    '<head><meta content="d2" name="description"></head>',  # reversed order
    '<head><meta name="description" content=""></head>',  # empty content IS a signal
    '<head><meta NAME="Description" CONTENT="cased"></head>',  # lowered first
    '<head><meta property="og:title" content="og t"><meta property="og:image" content="/i.png"></head>',
    '<head><meta property="og:updated_time" content="2025-01-01">'
    '<meta property="article:modified_time" content="2025-02-02"></head>',
    '<head><meta name="last-modified" content="yesterday"></head>',
    "<head><title>Both</title>"
    '<meta name="description" content="forward"><meta content="ignored" name="description"></head>',
    '<head><meta name="description" content=\'single quoted\'></head>',
    '<head><title>t</title><meta name="unrelated" content="skip"></head>',
]


def test_fingerprint_matches_reference_with_shim(ref_fp):
    for head in CASES:
        assert head_fingerprint_py(head) == ref_fp(head), head


def test_signal_break_on_first_pattern(ref_fp):
    # both attribute orders present: pattern 1 wins and pattern 2 is skipped
    head = '<head><meta name="description" content="first"><meta content="second" name="description"></head>'
    assert head_fingerprint_py(head) == ref_fp(head)
    alone = '<head><meta name="description" content="first"></head>'
    assert head_fingerprint_py(head) == head_fingerprint_py(alone)


def test_equality_token_semantics(ref_fp):
    # same signals -> same token; any signal change -> different token
    a = '<head><title>T</title><meta name="description" content="x"></head>'
    b = '<head><title>T</title><meta name="description" content="x"><link href="/s.css"></head>'
    c = '<head><title>T</title><meta name="description" content="y"></head>'
    assert head_fingerprint_py(a) == head_fingerprint_py(b)  # non-signal change invisible
    assert head_fingerprint_py(a) != head_fingerprint_py(c)
    assert ref_fp(a) == ref_fp(b) and ref_fp(a) != ref_fp(c)


def test_expr_matches_python_mirror(spark):
    df = spark.createDataFrame([(i, h) for i, h in enumerate(CASES)], ["i", "head_html"])
    rows = df.select("i", head_fingerprint_expr(F.col("head_html")).alias("fp")).collect()
    for r in rows:
        assert r["fp"] == head_fingerprint_py(CASES[r["i"]]), CASES[r["i"]]


def test_expr_is_jvm_only(spark):
    df = spark.createDataFrame([("<head><title>t</title></head>",)], ["head_html"])
    plan = (
        df.select(head_fingerprint_expr(F.col("head_html")).alias("fp"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan  # whole-stage JVM
