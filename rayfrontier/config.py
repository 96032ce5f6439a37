"""Crawl configuration (reference CLI-arg surface, src/crawler.py:296-332)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class CrawlConfig:
    # reference args (run_crawler.sh:1-8)
    cos_sim_threshold: float = 0.6     # src/crawler.py:205
    max_crawler_depth: int = 2         # expanded *pages* per domain, src/crawler.py:196-201
    num_domains: int | None = None     # head-N cut of the seed list, src/crawler.py:337-338
    keywords: tuple[str, ...] = ("privacy",)  # PRIVACY_POLICY_KEYWORDS, src/crawler.py:20
    # english filter (src/verification/verify.py:48)
    word_percentage: float = 50.0
    char_percentage: float = 85.0
    # engine-side (north-rule additions; do not change outputs, only scheduling)
    wave_url_cap: int = 200_000        # max URLs fetched per wave
    per_host_wave_cap: int = 64        # politeness: max fetches/host/wave
    host_tokens_per_wave: int = 64     # token-bucket refill per wave
    expand_slack: int = 2              # prefetch expands max_depth+slack pages/domain
    n_seen_shards: int = 8             # cuckoo-filter actor shards
    n_politeness_shards: int = 4
    # robots gating is enabled by passing robots= to CrawlEngine (reference has
    # no robots handling, SURVEY T6 — the engine adds it as an opt-in object)
    tentative_shards: int = 1          # >1: distribute the prefetch-prediction
                                       # replay over contiguous domain ranges as
                                       # Ray tasks (scheduling-only; committed
                                       # outputs identical by construction)
    overlap_replay: bool = False       # advance the committed replay inside
                                       # _fetch's ray.wait gaps (scheduling
                                       # only; outputs identical, parity-
                                       # tested). OFF by default and measured
                                       # NOT to pay on this workload even with
                                       # a dedicated driver core (5 pinned
                                       # cores / 4 slots A/B: 26.7 s off vs
                                       # 28.5 s on — the committed replay here
                                       # is a post-final-fetch tail burst, so
                                       # there is little to overlap and the
                                       # driver work delays result draining).
                                       # On a wave-spread politeness-bound
                                       # crawl it PAYS: same box/cores, caps
                                       # 16/16/8k → 24.2 s off vs 19.6 s on
                                       # (19% faster, identical outputs).
                                       # Rule: replay spread over many waves
                                       # → on; single tail burst → off.
    sharded_commit: bool = False       # run the COMMITTED replay on the
                                       # tentative range actors (requires
                                       # tentative_shards > 1): every wave all
                                       # uncommitted ranges replay their
                                       # domains in parallel against wave-start
                                       # state; the driver consumes the
                                       # decision records in rank order,
                                       # validating each domain's cross-range
                                       # reads, resolving policy first-wins
                                       # itself (deferred — policy never
                                       # alters a walk), and repairing any
                                       # conflicted domain in place with an
                                       # exact one-domain serial walk.
                                       # Outputs byte-identical
                                       # (parity-tested); converts the driver's
                                       # O(total-URLs) per-URL Python into
                                       # C-speed bulk dict merges + O(rows)
                                       # first-wins resolution. Mutually
                                       # exclusive with overlap_replay (both
                                       # re-enter the committed pass; the
                                       # engine rejects the combination).
    striped_commit: bool = False       # sharded_commit range assignment
                                       # variant: actor r speculates ranks
                                       # {p : p % R == r} (rank-striped)
                                       # instead of a contiguous block, so a
                                       # contiguous commit burst spreads
                                       # across all R actors instead of
                                       # landing in one (VERDICT r4 #2). The
                                       # trade-off: every domain's speculation
                                       # misses its R-1 predecessors' writes
                                       # (vs only at R-1 block boundaries), so
                                       # cross-domain first-sight collisions
                                       # within a burst become repairs — see
                                       # the A/B in BASELINE.md before turning
                                       # this on. Requires sharded_commit.
    state_cap: int | None = None       # bounded-driver-state mode (SURVEY §8):
                                       # hot-artifact cap before consumed
                                       # artifacts spill to mmap'd Arrow files,
                                       # crawl rows stream out per wave, and
                                       # the pending want-set is capped with
                                       # parquet frontier overflow. Outputs are
                                       # identical (parity-tested); only driver
                                       # residency changes. None = resident
                                       # dicts (the small-corpus default).


@dataclass(frozen=True)
class DatagenConfig:
    """Deterministic synthetic corpus parameters (FIXTURES.md §1-§5)."""

    n_images: int = 2000
    n_hosts: int = 50
    n_seeds: int | None = None         # default: all hosts
    seed: int = 42
    n_shards: int = 8                  # pages table hash shards (fetch-by-key layout)
    policy_rate: float = 0.22          # fraction of non-landing pages that are policies
    dup_rate: float = 0.10             # policies whose text duplicates a template
    foreign_rate: float = 0.08         # non-english pages
    links_per_page: tuple[int, int] = (1, 6)
    extra_query_rate: float = 0.3
    fragment_rate: float = 0.25
    min_dim: int = 16
    max_dim: int = 64
    qjpg_rate: float = 0.2
