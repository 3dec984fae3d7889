"""UA rotation graft (operators/user_agent.py): assembly-logic parity
against the reference's own extracted class driven by an identical
choice stream, client-hints parity, quirk pins, and the Spark column
operator."""

import pytest

from crawl4ai_spark.operators import user_agent as ua

from reference_loader import load_defs


class _ScriptedRandom:
    """Deterministic random.choice stand-in: call i picks index
    f(i) % len(seq).  Driving the reference with this and our pick with
    the same stream must produce identical UA strings."""

    def __init__(self, stride: int = 1):
        self.n = 0
        self.stride = stride

    def choice(self, seq):
        v = list(seq)[(self.n * self.stride) % len(seq)]
        self.n += 1
        return v


def _stream_pick(stride: int = 1):
    state = {"n": 0}

    def pick(site, seq):
        v = list(seq)[(state["n"] * stride) % len(seq)]
        state["n"] += 1
        return v

    return pick


@pytest.fixture(scope="module")
def ref_gen():
    import random as _random
    import re as _re
    import typing as t

    defs = load_defs(
        "user_agent_generator.py",
        ["UserAgentGenerator"],
        extra={
            "re": _re,
            "random": _random,
            "Optional": t.Optional,
            "Literal": t.Literal,
            "List": t.List,
            "Dict": t.Dict,
            "Tuple": t.Tuple,
            "Union": t.Union,
        },
    )
    return defs["UserAgentGenerator"]


PARAM_GRID = [
    dict(),
    dict(num_browsers=1),
    dict(num_browsers=2),
    dict(device_type="desktop"),
    dict(device_type="mobile"),
    dict(os_type="macos"),
    dict(os_type="android", device_brand="pixel"),
    dict(browser_type="firefox", num_browsers=1),
    dict(browser_type="edge", num_browsers=1),
]


def test_generate_matches_reference_choice_stream(ref_gen):
    for stride in (1, 2, 3, 5, 7):
        for params in PARAM_GRID:
            gen = ref_gen()
            import types

            scripted = _ScriptedRandom(stride)
            # the extracted class resolves ``random`` from its module
            # globals — rebind for this drive
            gen_module_globals = ref_gen.generate.__globals__
            old = gen_module_globals.get("random")
            gen_module_globals["random"] = scripted
            try:
                theirs = gen.generate(**params)
            finally:
                gen_module_globals["random"] = old
            ours = ua.generate_ua(_stream_pick(stride), **params)
            assert ours == theirs, (stride, params)


def test_client_hints_match_reference(ref_gen):
    gen = ref_gen()
    samples = [
        "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/119.0.6045.199 Safari/537.36",
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/118.0.5993.117 Safari/537.36 Edg/118.0.2088.76",
        "Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/119.0",
        "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 Version/16.5 Safari/605.1.15",
        "Mozilla/5.0 (Macintosh) AppleWebKit/605.1.15 Safari/605.1.15",  # no Version/
        "CompletelyUnknown/1.0",
    ]
    for s in samples:
        assert ua.parse_user_agent(s) == gen.parse_user_agent(s)
        assert ua.generate_client_hints(s) == gen.generate_client_hints(s)


def test_edge_legacy_token_branch_is_dead_from_stack_content():
    """Reference quirk: edge versions spell 'Edg/', so the Edge branch
    of the legacy-token chain can only fire via browser_type='edge'
    (with a stack containing no Chrome/Safari/Firefox marker)."""
    # num_browsers=1, combination pick -> ["edge"] at stream index 3
    def pick(site, seq):
        if site == 10:
            return [c for c in seq if c == ["edge"]][0]
        return seq[0]

    s = ua.generate_ua(pick, num_browsers=1)
    # stack = ["Edg/119..."]; no branch matches -> NO legacy webkit token
    assert "AppleWebKit" not in s and "Edg/" in s
    s2 = ua.generate_ua(pick, num_browsers=1, browser_type="edge")
    assert ua.SAFARI_WEBKIT in s2  # only the explicit type reaches it


def test_pure_safari_stack_yields_empty_hints():
    """Generated safari UAs carry 'Safari/…' not 'Version/…', so they
    parse to {} → client hints are the empty string (reference quirk)."""

    def pick(site, seq):
        if site == 10:
            return [c for c in seq if c == ["safari"]][0]
        return seq[0]

    s = ua.generate_ua(pick, num_browsers=1)
    assert "Chrome/" not in s and "Version/" not in s
    assert ua.generate_client_hints(s) == ""


def test_hash_pick_deterministic_and_spread():
    p1, p2 = ua.hash_pick("https://a.com/x"), ua.hash_pick("https://a.com/x")
    seq = list(range(50))
    assert [p1(i, seq) for i in range(5)] == [p2(i, seq) for i in range(5)]
    # different keys decorrelate
    uas = {ua.generate_ua(ua.hash_pick(f"u{k}")) for k in range(60)}
    assert len(uas) > 10


def test_assign_user_agents_spark(spark):
    df = spark.createDataFrame([(f"https://h{i}.com/p{i}",) for i in range(30)], ["url"])
    out = ua.assign_user_agents(df).collect()
    assert len(out) == 30
    for r in out:
        exp = ua.generate_ua(ua.hash_pick(r.url))
        assert r.user_agent == exp
        assert r.client_hints == ua.generate_client_hints(exp)
        assert r.user_agent.startswith("Mozilla/5.0 (")
