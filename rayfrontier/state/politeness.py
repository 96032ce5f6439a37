"""Per-host politeness token buckets + robots cache (sharded actors).

The reference has NO rate limiting or robots handling (SURVEY.md T6: only
3s/6s HTTP timeouts, ``src/utils/utils.py:149``); the north rule adds both as
pinned actor state. One shard owns ``hash(host) % n_shards`` of the hosts, so a
host's budget is decided by exactly one actor — skewed (hot) hosts are still
*parsed* in parallel (stateless stages), only their *fetch admission* is
serialized (SURVEY.md §7 "politeness vs throughput").

Politeness is a scheduling concern only: a URL denied this wave rolls over to
the next wave; outputs (crawl order, seen set) are unaffected — which is what
makes reference parity achievable while adding rate limiting.
"""

from __future__ import annotations

from collections import defaultdict


class PolitenessShard:
    """Token buckets for a shard of hosts; refilled once per wave.

    ``grant(hosts, wants)`` is the single batched RPC per wave per shard:
    returns how many fetches each host may issue this wave.
    """

    def __init__(self, tokens_per_wave: int = 64, burst: int = 128):
        self.rate = tokens_per_wave
        self.burst = burst
        self.level: dict[str, int] = defaultdict(lambda: self.burst)

    def refill(self) -> None:
        for h in list(self.level):
            self.level[h] = min(self.burst, self.level[h] + self.rate)

    def grant(self, hosts: list[str], wants: list[int]) -> list[int]:
        out = []
        for h, w in zip(hosts, wants):
            avail = self.level[h]
            g = min(avail, w)
            self.level[h] = avail - g
            out.append(g)
        return out

    def dump(self) -> dict:
        return dict(self.level)

    def load(self, state: dict) -> None:
        self.level = defaultdict(lambda: self.burst, state)


class RobotsCache:
    """Host → disallowed path prefixes; resolved once per host, cached.

    ``rules_source`` is a mapping-like or callable host→list[str]. In the
    sandbox the synthetic universe supplies rules (empty by default, matching
    the reference's no-robots behavior); against a real network this actor
    would fetch+parse /robots.txt once per host.
    """

    def __init__(self, rules_source=None):
        self.rules_source = rules_source or {}
        self.cache: dict[str, tuple[str, ...]] = {}

    def _rules_for(self, host: str) -> tuple[str, ...]:
        if host not in self.cache:
            if callable(self.rules_source):
                rules = self.rules_source(host)
            else:
                rules = self.rules_source.get(host, ())
            self.cache[host] = tuple(rules)
        return self.cache[host]

    def allowed(self, hosts: list[str], paths: list[str]) -> list[bool]:
        out = []
        for h, p in zip(hosts, paths):
            rules = self._rules_for(h)
            out.append(not any(p.startswith(r) for r in rules))
        return out


class StaticRobots:
    """Driver-side robots view for the oracle (same rules, no actor)."""

    def __init__(self, rules: dict[str, tuple[str, ...]]):
        self.rules = rules

    def disallowed(self, url: str) -> bool:
        from ..functions.urltools import host_of

        try:
            from urllib.parse import urlsplit

            path = urlsplit(url).path or "/"
        except ValueError:
            return False
        return any(path.startswith(r) for r in self.rules.get(host_of(url), ()))
