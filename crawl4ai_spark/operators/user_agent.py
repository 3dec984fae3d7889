"""User-agent rotation + Sec-CH-UA client hints as column assignment.

Grafts the reference's offline ``UserAgentGenerator``
(user_agent_generator.py:143-428): platform/browser-stack template
assembly, the legacy-token branch chain, ``parse_user_agent`` and
``generate_client_hints``.  The template data (platform strings,
version lists — public UA strings) is carried verbatim as parity data;
the ASSEMBLY logic is transcribed with one deliberate divergence: the
reference draws every choice from process-global ``random``, which a
distributed engine cannot replay — here every choice site is a
deterministic function of a per-row key (hash-split streams), the same
re-expression used for proxy rotation (operators/proxy.py): identical
input row → identical UA on every executor, every resume.

Reference quirks preserved (pinned in tests/test_user_agent.py):

* the Edge legacy-token branch (:333) is UNREACHABLE from stack
  content — edge versions spell ``Edg/``, and ``"Edge" in str(stack)``
  is False — it only fires via ``browser_type="edge"``;
* ``parse_user_agent`` looks for Safari's ``Version/(\\d+)`` which the
  generator never emits (it emits ``Safari/605…``), so a pure-safari
  stack parses to {} and its client hints are the EMPTY string (not
  ``'""'`` — that value is Firefox's);
* the gecko engine list keeps the duplicate entry and the
  ``Gecko/2010010`` truncation (:216-220).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

import pandas as pd
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- template data (user_agent_generator.py:175-263, verbatim values) ---

DESKTOP_PLATFORMS = {
    "windows": {
        "10_64": "(Windows NT 10.0; Win64; x64)",
        "10_32": "(Windows NT 10.0; WOW64)",
    },
    "macos": {
        "intel": "(Macintosh; Intel Mac OS X 10_15_7)",
        "newer": "(Macintosh; Intel Mac OS X 10.15; rv:109.0)",
    },
    "linux": {
        "generic": "(X11; Linux x86_64)",
        "ubuntu": "(X11; Ubuntu; Linux x86_64)",
        "chrome_os": "(X11; CrOS x86_64 14541.0.0)",
    },
}

MOBILE_PLATFORMS = {
    "android": {
        "samsung": "(Linux; Android 13; SM-S901B)",
        "pixel": "(Linux; Android 12; Pixel 6)",
        "oneplus": "(Linux; Android 13; OnePlus 9 Pro)",
        "xiaomi": "(Linux; Android 12; M2102J20SG)",
    },
    "ios": {
        "iphone": "(iPhone; CPU iPhone OS 16_5 like Mac OS X)",
        "ipad": "(iPad; CPU OS 16_5 like Mac OS X)",
    },
}

BROWSER_COMBINATIONS = {
    1: [["chrome"], ["firefox"], ["safari"], ["edge"]],
    2: [["gecko", "firefox"], ["chrome", "safari"], ["webkit", "safari"]],
    3: [["chrome", "safari", "edge"], ["webkit", "chrome", "safari"]],
}

CHROME_WEBKIT = "AppleWebKit/537.36"
SAFARI_WEBKIT = "AppleWebKit/605.1.15"
GECKO_ENGINES = ["Gecko/20100101", "Gecko/20100101", "Gecko/2010010"]

CHROME_VERSIONS = [
    "Chrome/119.0.6045.199",
    "Chrome/118.0.5993.117",
    "Chrome/117.0.5938.149",
    "Chrome/116.0.5845.187",
    "Chrome/115.0.5790.171",
]
EDGE_VERSIONS = [
    "Edg/119.0.2151.97",
    "Edg/118.0.2088.76",
    "Edg/117.0.2045.47",
    "Edg/116.0.1938.81",
    "Edg/115.0.1901.203",
]
SAFARI_VERSIONS = [
    "Safari/537.36",
    "Safari/605.1.15",
    "Safari/604.1",
    "Safari/602.1",
    "Safari/601.5.17",
]
FIREFOX_VERSIONS = [
    "Firefox/119.0",
    "Firefox/118.0.2",
    "Firefox/117.0.1",
    "Firefox/116.0",
    "Firefox/115.0.3",
    "Firefox/114.0.2",
    "Firefox/113.0.1",
    "Firefox/112.0",
    "Firefox/111.0.1",
    "Firefox/110.0",
]

PickFn = Callable[[int, list], object]


def hash_pick(key: str) -> PickFn:
    """Deterministic choice streams: site i of row ``key`` selects
    ``seq[md5(key|i) % len]`` — independent per site, replayable on any
    executor (the distributed stand-in for the reference's
    ``random.choice``)."""

    def pick(site: int, seq: list):
        h = int.from_bytes(hashlib.md5(f"{key}|{site}".encode()).digest()[:8], "big")
        return seq[h % len(seq)]

    return pick


def get_browser_stack(pick: PickFn, num_browsers: int = 1) -> list:
    """get_browser_stack (:261-298) with choice sites 10/11+: the
    combination draw then one versioned draw per member."""
    if num_browsers not in BROWSER_COMBINATIONS:
        raise ValueError(f"Unsupported number of browsers: {num_browsers}")
    combination = pick(10, BROWSER_COMBINATIONS[num_browsers])
    browser_stack = []
    for j, browser in enumerate(combination):
        if browser == "chrome":
            browser_stack.append(pick(11 + j, CHROME_VERSIONS))
        elif browser == "firefox":
            browser_stack.append(pick(11 + j, FIREFOX_VERSIONS))
        elif browser == "safari":
            browser_stack.append(pick(11 + j, SAFARI_VERSIONS))
        elif browser == "edge":
            browser_stack.append(pick(11 + j, EDGE_VERSIONS))
        elif browser == "gecko":
            browser_stack.append(pick(11 + j, GECKO_ENGINES))
        elif browser == "webkit":
            browser_stack.append(CHROME_WEBKIT)
    return browser_stack


def get_platform(
    pick: PickFn,
    device_type: Optional[str] = None,
    os_type: Optional[str] = None,
    device_brand: Optional[str] = None,
) -> str:
    """get_random_platform (:350-369): filter by device/os, then the
    os draw (site 0) and brand draw (site 1)."""
    platforms = (
        DESKTOP_PLATFORMS
        if device_type == "desktop"
        else MOBILE_PLATFORMS
        if device_type == "mobile"
        else {**DESKTOP_PLATFORMS, **MOBILE_PLATFORMS}
    )
    if os_type:
        for platform_group in [DESKTOP_PLATFORMS, MOBILE_PLATFORMS]:
            if os_type in platform_group:
                platforms = {os_type: platform_group[os_type]}
                break
    os_key = pick(0, list(platforms.keys()))
    if device_brand and device_brand in platforms[os_key]:
        return platforms[os_key][device_brand]
    return pick(1, list(platforms[os_key].values()))


def generate_ua(
    pick: PickFn,
    device_type: Optional[str] = None,
    os_type: Optional[str] = None,
    device_brand: Optional[str] = None,
    browser_type: Optional[str] = None,
    num_browsers: int = 3,
) -> str:
    """generate (:299-343) exact assembly: Mozilla/5.0 + platform +
    legacy token chain (branch order AND the Edg/-vs-"Edge" dead branch
    preserved) + the browser stack."""
    platform = get_platform(pick, device_type, os_type, device_brand)
    components = ["Mozilla/5.0", platform]
    browser_stack = get_browser_stack(pick, num_browsers)

    if "Firefox" in str(browser_stack) or browser_type == "firefox":
        components.append(pick(20, GECKO_ENGINES))
    elif "Chrome" in str(browser_stack) or "Safari" in str(browser_stack) or browser_type == "chrome":
        components.append(CHROME_WEBKIT)
        components.append("(KHTML, like Gecko)")
    elif "Edge" in str(browser_stack) or browser_type == "edge":
        components.append(SAFARI_WEBKIT)
        components.append("(KHTML, like Gecko)")
    elif "Safari" in str(browser_stack) or browser_type == "safari":
        components.append(CHROME_WEBKIT)
        components.append("(KHTML, like Gecko)")

    components.extend(browser_stack)
    return " ".join(components)


_UA_BROWSER_PATTERNS = {
    "chrome": r"Chrome/(\d+)",
    "edge": r"Edg/(\d+)",
    "safari": r"Version/(\d+)",
    "firefox": r"Firefox/(\d+)",
}


def parse_user_agent(user_agent: str) -> dict:
    """parse_user_agent (:371-387) exact."""
    result = {}
    for browser, pattern in _UA_BROWSER_PATTERNS.items():
        match = re.search(pattern, user_agent)
        if match:
            result[browser] = match.group(1)
    return result


def generate_client_hints(user_agent: str) -> str:
    """generate_client_hints (:388-418) exact, including the
    empty-string result for a UA that parses to no known browser."""
    browsers = parse_user_agent(user_agent)
    hints = []
    if "chrome" in browsers:
        hints.append(f'"Chromium";v="{browsers["chrome"]}"')
        hints.append('"Not_A Brand";v="8"')
        if "edge" in browsers:
            hints.append(f'"Microsoft Edge";v="{browsers["edge"]}"')
        else:
            hints.append(f'"Google Chrome";v="{browsers["chrome"]}"')
    elif "firefox" in browsers:
        return '""'
    elif "safari" in browsers:
        hints.append(f'"Safari";v="{browsers["safari"]}"')
        hints.append('"Not_A Brand";v="8"')
    return ", ".join(hints)


UA_SCHEMA = T.StructType(
    [
        T.StructField("user_agent", T.StringType()),
        T.StructField("client_hints", T.StringType()),
    ]
)


def assign_user_agents(
    frontier: DataFrame,
    key_col: str = "url",
    device_type: Optional[str] = None,
    os_type: Optional[str] = None,
    device_brand: Optional[str] = None,
    browser_type: Optional[str] = None,
    num_browsers: int = 3,
) -> DataFrame:
    """Adds ``user_agent`` + ``client_hints`` columns, one Arrow-batched
    pandas UDF (generate_with_client_hints per row, :344-348) — string
    assembly from broadcast-size template tables, stateless, no
    shuffle."""

    @F.pandas_udf(UA_SCHEMA)
    def ua_udf(keys: pd.Series) -> pd.DataFrame:
        uas, hints = [], []
        for k in keys:
            ua = generate_ua(
                hash_pick(str(k)), device_type, os_type, device_brand,
                browser_type, num_browsers,
            )
            uas.append(ua)
            hints.append(generate_client_hints(ua))
        return pd.DataFrame({"user_agent": uas, "client_hints": hints})

    out = frontier.withColumn("_ua", ua_udf(F.col(key_col)))
    return out.withColumn("user_agent", F.col("_ua.user_agent")).withColumn(
        "client_hints", F.col("_ua.client_hints")
    ).drop("_ua")
