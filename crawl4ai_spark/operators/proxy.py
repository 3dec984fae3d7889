"""Proxy rotation (proxy_strategy.py:12-341) as column assignment.

The reference rotates a proxy pool per request (RoundRobinProxyStrategy,
:190-260) and supports STICKY sessions — a session_id bound to one proxy
for its lifetime (:137-160) — used by deep crawls to keep one IP per
host.  The Spark analog assigns a ``proxy_server`` column per frontier
row:

* ``mode="round_robin"`` — the i-th row of the wave's queue order gets
  ``proxies[i % n]``, the deterministic re-expression of cycling a pool
  in dispatch order (the reference's dispatch order is wall-clock
  nondeterministic; ours is the logical queue discipline).
* ``mode="sticky"`` — ``proxies[murmur3(session_key) % n]``: every row
  of a session (host, by default) maps to the same pool member, the
  get_proxy_for_session semantics without driver state.

``parse_proxy_string`` transcribes ProxyConfig.from_string/_extract_ip
(:48-67) so pool specs round-trip identically; it is xcheck-tested
against the reference class.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_proxy_string(proxy_str: str) -> dict:
    """ProxyConfig.from_string (:48-67) exact: 'ip:port:user:pass' or
    'ip:port' → dict(server, username, password, ip)."""
    parts = proxy_str.split(":")
    if len(parts) == 4:
        ip, port, username, password = parts
        return {"server": f"http://{ip}:{port}", "username": username,
                "password": password, "ip": ip}
    if len(parts) == 2:
        ip, port = parts
        return {"server": f"http://{ip}:{port}", "username": None,
                "password": None, "ip": ip}
    raise ValueError(f"Invalid proxy string format: {proxy_str}")


def _pool_element(idx: Column, servers: list[str]) -> Column:
    arr = F.array(*[F.lit(s) for s in servers])
    return F.element_at(arr, (idx + 1).cast("int"))


def assign_proxies(
    frontier: DataFrame,
    servers: list[str],
    mode: str = "sticky",
    session_col: str = "host",
    rank_col: str | None = None,
) -> DataFrame:
    """Adds ``proxy_server``.  sticky: stable per ``session_col``;
    round_robin: by ``rank_col`` (a 0-based queue rank, e.g. the
    scheduler's ``rank_in_host`` − 1 or a global sequence)."""
    if not servers:
        return frontier.withColumn("proxy_server", F.lit(None).cast("string"))
    n = len(servers)
    if mode == "sticky":
        idx = F.pmod(F.hash(F.col(session_col)), F.lit(n))
    elif mode == "round_robin":
        if rank_col is None:
            raise ValueError("round_robin needs rank_col (a deterministic queue rank)")
        idx = F.pmod(F.col(rank_col).cast("long"), F.lit(n))
    else:
        raise ValueError(f"unknown proxy assignment mode: {mode}")
    return frontier.withColumn("proxy_server", _pool_element(idx, servers))
