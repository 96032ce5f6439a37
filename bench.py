"""Benchmark runner (driver contract).

Plain run: one fresh Ray session at $RAY_GRAFT_CPUS (default 32) over
$GRAFT_SF_DIR (default /root/testdata/sf0.1); prints ONE JSON line:
    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
     "frontier_urls_per_sec": ...}

--scaling: runs the headline crawl pipeline twice in FRESH subprocesses at
num_cpus=8 and num_cpus=32 on the same (pre-generated, page-cache-warmed)
input and prints both throughputs + scaling efficiency (T32/T8)/4 — the
sandbox evidence for the north rule's N→4N cluster criterion.

The headline metric is BASELINE.json's: frontier URLs fetched+parsed per
second over the synthetic image+caption corpus (a scale model of the 10^10-URL
frontier), measured over the full crawl engine (waves, politeness, cuckoo
probes, keyed parquet lookups, artifact actor pools).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# bench-scale synthetic corpus (scale model of the 10^10 frontier)
N_IMAGES = int(os.environ.get("GRAFT_BENCH_IMAGES", "300000"))
N_HOSTS = int(os.environ.get("GRAFT_BENCH_HOSTS", "6000"))
N_SHARDS = int(os.environ.get("GRAFT_BENCH_SHARDS", "32"))
BENCH_CORPUS = os.environ.get(
    "GRAFT_BENCH_CORPUS", f"/tmp/rayfrontier_bench_corpus_{N_IMAGES}_{N_HOSTS}"
)


def _loadavg():
    """1/5/15-min load — co-tenant evidence: load ≳3 measurably slows every
    draw on this shared box (see BASELINE.md noise notes)."""
    try:
        with open("/proc/loadavg") as fp:
            return [float(x) for x in fp.read().split()[:3]]
    except OSError:
        return None


def _cpu_canary() -> float:
    """Seconds for a fixed single-core integer loop — a box-speed reference
    baked into every bench artifact. Needed because the VM's effective
    per-core speed has been observed to HALVE at the host level with zero
    steal ticks and an idle box (BASELINE.md 2026-08-19 note): loadavg
    cannot see that, this can. Nominal ~0.25 s; 2× nominal means absolute
    draws in the same JSON under-report the engine ~2×. Min-of-3 (matching
    the bench's best-of-2 convention) so a one-off scheduler preemption or
    GC pause cannot forge a degraded-box reading."""
    best = None
    for _ in range(3):
        t = time.time()
        x = 0
        for i in range(2_000_000):
            x += i * i
        dt = time.time() - t
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def _membw_canary() -> float:
    """Seconds for a fixed memory-bandwidth sweep (3×80 MB numpy copies,
    min-of-3). A SECOND host-degradation mode was observed 2026-08-19
    (BASELINE round-5 'Box-state caveat'): all-phase ~1.8× slowdowns on
    identical code with an UNCHANGED single-core canary — a tight integer
    loop runs in registers/L1 and cannot see memory-bandwidth contention,
    while the engine's vectorized replay/ingest phases are bandwidth-bound.
    Nominal ~0.05-0.1 s on this box; interpret absolute draws against BOTH
    canaries."""
    import numpy as np

    a = np.arange(10_000_000, dtype=np.int64)  # 80 MB, past any LLC
    best = None
    for _ in range(3):
        t = time.time()
        for _ in range(3):
            b = a.copy()
            a[0] = int(b[-1])  # defeat elision
        dt = time.time() - t
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def _bench_cfgs():
    from rayfrontier.config import CrawlConfig, DatagenConfig

    dcfg = DatagenConfig(
        n_images=N_IMAGES, n_hosts=N_HOSTS, n_shards=N_SHARDS, links_per_page=(2, 8)
    )
    ccfg = CrawlConfig(per_host_wave_cap=1024, host_tokens_per_wave=1024, wave_url_cap=1_000_000)
    from dataclasses import replace

    if os.environ.get("GRAFT_WAVE_CAP"):
        # steady-state regime knob (the 3M wave-spread A/Bs)
        ccfg = replace(ccfg, wave_url_cap=int(os.environ["GRAFT_WAVE_CAP"]))
    if os.environ.get("GRAFT_MAIN_STATE_CAP"):
        ccfg = replace(ccfg, state_cap=int(os.environ["GRAFT_MAIN_STATE_CAP"]))
    if os.environ.get("GRAFT_OVERLAP_REPLAY"):
        # dedicated-driver-core mode (pin N+1 cores, RAY_GRAFT_CPUS=N)
        ccfg = replace(ccfg, overlap_replay=True)
    if os.environ.get("GRAFT_SHARDED_COMMIT"):
        # committed replay on the range actors (speculate→validate→sequence)
        ccfg = replace(
            ccfg,
            sharded_commit=True,
            striped_commit=bool(os.environ.get("GRAFT_STRIPED_COMMIT")),
            tentative_shards=int(os.environ.get("GRAFT_TENTATIVE_SHARDS", "8")),
        )
    elif os.environ.get("GRAFT_TENTATIVE_SHARDS"):
        ccfg = replace(ccfg, tentative_shards=int(os.environ["GRAFT_TENTATIVE_SHARDS"]))
    return dcfg, ccfg


def ensure_corpus() -> None:
    import ray

    from rayfrontier.datagen import write_corpus
    from rayfrontier.sources.storage import PagesStore

    dcfg, _ = _bench_cfgs()
    marker = os.path.join(BENCH_CORPUS, "meta.json")
    if not os.path.exists(marker):
        write_corpus(BENCH_CORPUS, dcfg, use_ray=True)
    # pre-build the payload sidecars (one-time corpus prep, not crawl work)
    store = PagesStore(BENCH_CORPUS, dcfg.n_shards)

    @ray.remote
    def build(s: int) -> bool:
        return PagesStore(BENCH_CORPUS, dcfg.n_shards).ensure_sidecar(s)

    inflight = []
    for s in range(store.n_shards):
        if len(inflight) >= 8:
            _, inflight = ray.wait(inflight, num_returns=1)
        inflight.append(build.remote(s))
    ray.get(inflight)
    # warm the page cache so both scaling runs see memory-speed reads
    # (chunked: whole-file reads of multi-hundred-MB shards would spike the
    # measuring process's own peak RSS, polluting --rss evidence)
    total = 0
    for root, _dirs, files in os.walk(BENCH_CORPUS):
        for f in files:
            with open(os.path.join(root, f), "rb") as fp:
                while chunk := fp.read(1 << 24):
                    total += len(chunk)


def _warm_workers() -> None:
    """Spin up Ray worker processes AND their parquet-read import path outside
    the timed section (we measure compute+shuffle, not forks/imports)."""
    import pyarrow.dataset as pads
    import ray
    import ray.data as rd

    n = int(ray.cluster_resources().get("CPU", 8))
    rd.range(n * 1000, override_num_blocks=n).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).count()
    rd.read_parquet(
        os.path.join(BENCH_CORPUS, "pages", "shard=0"),
        columns=["image_id"],
        filter=pads.field("image_id").isin(["img00000000"]),
    ).count()


def run_crawl_bench() -> dict:
    from rayfrontier.pipelines.crawl import CrawlEngine

    dcfg, ccfg = _bench_cfgs()
    _warm_workers()
    t0 = time.time()
    # validate_rows=True: the fetch pass decodes every image payload and checks
    # the per-row input_hint invariant (pixel allclose / PSNR + caption
    # equality) inline — the workload the north star describes
    eng = CrawlEngine(BENCH_CORPUS, dcfg, ccfg, validate_rows=True)
    eng.run()
    sec = time.time() - t0
    eng.shutdown()
    n_urls = eng.seq + len(eng.domains)  # link attempts + landings
    out = {
        "sec": sec,
        "urls": n_urls,
        "pages_fetched": eng.n_fetched,
        "urls_per_sec": n_urls / sec,
        "phase_secs": {k: round(v, 3) for k, v in eng.phase_secs.items()},
        # driver PROCESS-CPU per phase: the 10^10 scaling bound is the
        # driver's serial CPU, not phase wall (wall includes cluster waits)
        "phase_cpu_secs": {k: round(v, 3) for k, v in eng.phase_cpu_secs.items()},
    }
    if ccfg.sharded_commit:
        out["commit_stats"] = dict(eng.commit_stats)
    if eng.admit_secs is not None:  # GRAFT_DEBUG_PHASES=1
        out["admit_secs"] = {
            k: (v if isinstance(v, list) else round(v, 3))
            for k, v in eng.admit_secs.items()
        }
    return out


def run_query_bench() -> dict:
    """Per-pipeline wall times over $GRAFT_SF_DIR (the operator suite)."""
    import __ray_entry__ as e

    out = {}
    qs = e.queries()
    for name in (
        "pricing_summary",
        "top_orders",
        "mkt_revenue",
        "event_hourly",
        "top_lineitems_per_flag",
        "docs_exact_dedup",
        "docs_quality",
        "docs_word_count",
        "knn_brute",
        "docs_minhash_pairs",
        "docs_sample_profile",
        "user_sessions",
        "click_last_purchase",
        "docs_ngram_pairs",
        "lineitem_quantiles",
        "order_lineitem_join",
        "event_hopping",
        "customer_running_total",
    ):
        # best-of-2 per query, matching the crawl section: a single draw on
        # this co-tenant box swings ±30-75% (measured: order_lineitem_join
        # 4.9 s vs 8.6 s across same-day runs) and reads as a regression
        best = None
        for _ in range(2):
            t0 = time.time()
            qs[name](SF_DIR)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    return out


def main() -> None:
    import ray

    # co-tenant evidence: read BEFORE corpus prep — ensure_corpus's own
    # page-cache warm-up (a full-corpus read) drives the 1-min load past ~2.5
    # by itself, so a post-prep reading can never show a quiet box
    loadavg_start = _loadavg()
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    from rayfrontier.functions.groupagg import mute_empty_schema_warnings

    mute_empty_schema_warnings()  # native groupby().aggregate() paths too
    DataContext.get_current().enable_progress_bars = False

    ensure_corpus()
    loadavg = _loadavg()
    # best-of-2, like --scaling: single-machine draws vary ±25-30% (page
    # cache, plasma reuse, co-tenant noise) — one draw under-reports the
    # engine (the r02 recorded headline was a slow-edge single draw)
    draws = [run_crawl_bench() for _ in range(2)]
    if abs(draws[0]["sec"] - draws[1]["sec"]) > 0.25 * min(d["sec"] for d in draws):
        # the two draws disagree badly — a co-tenant burst hit one of them;
        # one more draw so the min is less likely to be a contaminated pair
        draws.append(run_crawl_bench())
    crawl = min(draws, key=lambda r: r["sec"])
    queries = run_query_bench()
    result = {
        "metric": "frontier URLs fetched+parsed per second (synthetic image+caption corpus)",
        "value": round(crawl["sec"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "frontier_urls_per_sec": round(crawl["urls_per_sec"], 2),
        "pages_fetched": crawl["pages_fetched"],
        "crawl_urls": crawl["urls"],
        "crawl_phase_secs": crawl["phase_secs"],
        "crawl_phase_cpu_secs": crawl["phase_cpu_secs"],
        "crawl_draws_sec": [round(d["sec"], 3) for d in draws],
        "loadavg_1_5_15": loadavg_start,
        # post-prep reading (includes the bench's own warm-up load; kept so
        # old records stay comparable — they were taken at this point)
        "loadavg_pre_draw": loadavg,
        "cpu_canary_sec": _cpu_canary(),
        "membw_canary_sec": _membw_canary(),
    }
    print(json.dumps(result))
    ray.shutdown()


def decode_control(nproc: int) -> None:
    """Hardware-ceiling control: ``nproc`` worker processes each decoding the
    same image payloads in a tight loop (the crawl's dominant kernel —
    memory-bound, unlike a pure-ALU spin). Printed decodes/sec at two proc
    counts bound how much of the crawl's measured scaling loss is the BOX
    (shared memory bandwidth / turbo), not the engine. Run via
    ``bench.py --decode-control N`` under taskset by scaling()."""
    import multiprocessing as mp

    import pyarrow.parquet as pq

    from rayfrontier.sources.storage import PagesStore

    dcfg, _ = _bench_cfgs()
    store = PagesStore(BENCH_CORPUS, dcfg.n_shards)
    t = pq.read_table(store.shard_paths({0})[0], columns=["bytes", "fmt"])
    payloads = list(zip(t["bytes"].to_pylist()[:256], t["fmt"].to_pylist()[:256]))

    with mp.Pool(nproc, initializer=_decode_init, initargs=(payloads,)) as pool:
        t0 = time.time()
        counts = pool.map(_decode_worker, range(nproc))
        dt = time.time() - t0
    print(json.dumps({"nproc": nproc, "decodes_per_sec": round(sum(counts) / dt, 1)}))


_DECODE_PAYLOADS: list = []


def _decode_init(payloads) -> None:
    _DECODE_PAYLOADS[:] = payloads


def _decode_worker(_i: int) -> int:
    from rayfrontier.codecs import decode_image

    n = 0
    t_end = time.time() + 3.0
    while time.time() < t_end:
        for data, fmt in _DECODE_PAYLOADS:
            decode_image(data, fmt)
            n += 1
            if time.time() >= t_end:
                break
    return n


def scaling() -> None:
    # pre-generate + warm cache once, outside the timed runs
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ensure_corpus()
    ray.shutdown()

    def run_once(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        # taskset pins the WHOLE Ray process tree to ncpu physical cores:
        # ray.init(num_cpus=N) only limits task slots, while pyarrow's
        # internal thread pool (parquet decode, compute kernels) would still
        # use all 32 cores — an "8-CPU node" borrowing 32 cores is not a
        # faithful proxy for a small cluster
        cmd = [sys.executable, __file__, "--crawl-only"]
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
        out = subprocess.run(
            cmd, env=env, capture_output=True, text=True, check=True
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def run(ncpu: int) -> dict:
        # best-of-2: single-machine runs vary ±30% (page cache, plasma reuse,
        # co-tenant noise); min is the fair proxy for steady-state throughput
        a, b = run_once(ncpu), run_once(ncpu)
        return a if a["sec"] <= b["sec"] else b

    def control(nproc: int) -> float:
        cmd = [sys.executable, __file__, "--decode-control", str(nproc)]
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{nproc - 1}"] + cmd
        out = subprocess.run(cmd, capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])["decodes_per_sec"]

    result = {}
    for lo, hi in ((8, 32), (4, 16)):
        r_lo, r_hi = run(lo), run(hi)
        eff = (r_lo["sec"] / r_hi["sec"]) / (hi / lo)
        # hardware ceiling: the same decode kernel in plain pinned processes —
        # (per-proc slowdown at hi)×ideal is the best ANY engine could do here
        c_lo, c_hi = control(lo), control(hi)
        ceiling = (c_hi / c_lo) / (hi / lo)
        result[f"{lo}v{hi}"] = {
            "cpus_lo": lo,
            "cpus_hi": hi,
            "sec_lo": round(r_lo["sec"], 3),
            "sec_hi": round(r_hi["sec"], 3),
            "urls_per_sec_lo": round(r_lo["urls_per_sec"], 2),
            "urls_per_sec_hi": round(r_hi["urls_per_sec"], 2),
            "scaling_efficiency": round(eff, 3),
            "hardware_ceiling": round(ceiling, 3),
            "efficiency_vs_ceiling": round(min(eff / ceiling, 1.5), 3),
        }
    primary = result["8v32"]
    primary["scaling_efficiency_4v16"] = result["4v16"]["scaling_efficiency"]
    result["loadavg_1_5_15"] = _loadavg()
    print(json.dumps(result))


def rss_probe(mode: str) -> None:
    """--rss-probe resident|bounded: one crawl; print driver peak RSS + the
    engine's residency high-water marks. Run in a fresh subprocess per mode
    (ru_maxrss is a process-lifetime high-water mark)."""
    import resource

    import ray

    from dataclasses import replace

    from rayfrontier.pipelines.crawl import CrawlEngine

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ensure_corpus()
    dcfg, ccfg = _bench_cfgs()
    # scale-model admission: at the 10^10 target the per-wave admission cap is
    # a tiny fraction of the frontier, so domains interleave and the committed
    # prefix advances throughout the crawl (artifacts die progressively). The
    # throughput bench's wave_url_cap=1M admits everything at once — override
    # it here (BOTH modes, apples-to-apples) so the probe measures the memory
    # contract in the regime it is designed for.
    wave_cap = int(os.environ.get("GRAFT_RSS_WAVE_CAP", "10000"))
    ccfg = replace(ccfg, wave_url_cap=wave_cap)
    if mode == "bounded":
        ccfg = replace(ccfg, state_cap=int(os.environ.get("GRAFT_STATE_CAP", "4000")))
    _warm_workers()
    base_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    t0 = time.time()
    eng = CrawlEngine(BENCH_CORPUS, dcfg, ccfg, validate_rows=True)
    eng.run()
    sec = time.time() - t0
    peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    out = {
        "mode": mode,
        "n_images": N_IMAGES,
        "sec": round(sec, 2),
        "urls_per_sec": round((eng.seq + len(eng.domains)) / sec, 1),
        "pages_fetched": eng.n_fetched,
        "crawl_rows_total": eng.seq,
        "driver_peak_rss_mb": round(peak_mb, 1),
        "driver_rss_before_crawl_mb": round(base_mb, 1),
        "hwm": eng.hwm,
    }
    if mode == "bounded":
        out["artifacts_spilled"] = len(eng.artifacts.spill)
        out["artifact_readbacks"] = eng.artifacts.readbacks
        out["rows_spilled"] = eng._row_spill.n_rows
        # tiered link/policy dicts: strings resident vs escrowed (VERDICT r4
        # #1 — link/policy residency must be O(active + hot cap))
        out["link_dict"] = eng.link_dict.resident()
        out["policy_dict"] = eng.policy_dict.resident()
    eng.shutdown()
    print(json.dumps(out))
    ray.shutdown()


def rss() -> None:
    """--rss: driver-residency evidence — the same crawl with resident dicts
    vs cfg.state_cap bounded state, each in a fresh process; prints both."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ensure_corpus()
    ray.shutdown()
    result = {}
    for mode in ("resident", "bounded"):
        out = subprocess.run(
            [sys.executable, __file__, "--rss-probe", mode],
            capture_output=True, text=True, check=True,
        ).stdout
        result[mode] = json.loads(out.strip().splitlines()[-1])
    r, b = result["resident"], result["bounded"]
    result["rss_delta_mb"] = round(r["driver_peak_rss_mb"] - b["driver_peak_rss_mb"], 1)
    result["artifacts_resident_ratio"] = round(
        b["hwm"]["artifacts_resident"] / max(r["hwm"]["artifacts_resident"], 1), 3
    )
    result["rows_resident_ratio"] = round(
        b["hwm"]["rows_resident"] / max(r["hwm"]["rows_resident"], 1), 3
    )
    print(json.dumps(result))


def actor_rss() -> None:
    """--actor-rss: per-replay-actor residency at tentative_shards R — the
    VERDICT #4/#5 evidence that actor state is de-replicated: each actor's
    heap holds an 8 B/artifact id index + bounded cache, while the artifact
    payload lives ONCE in plasma (node-shared zero-copy), so summed per-actor
    structural bytes grow only by the small index as R grows."""
    import ray

    from dataclasses import replace

    from rayfrontier.pipelines.crawl import CrawlEngine

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ensure_corpus()
    dcfg, ccfg0 = _bench_cfgs()
    result = {"n_images": N_IMAGES}
    for R in (4, 16):
        ccfg = replace(ccfg0, tentative_shards=R)
        eng = CrawlEngine(BENCH_CORPUS, dcfg, ccfg, validate_rows=True)
        eng.run()
        fps = ray.get([a.footprint.remote() for a in (eng._replay_actors or [])])
        eng.shutdown()
        result[f"R{R}"] = {
            "n_actors": len(fps),
            "per_actor_rss_mb": [f["rss_mb"] for f in fps],
            "per_actor_index_mb": [round(f["index_bytes"] / 2**20, 2) for f in fps],
            "sum_index_mb": round(sum(f["index_bytes"] for f in fps) / 2**20, 2),
            "plasma_shared_mb": round(
                max((f["plasma_shared_bytes"] for f in fps), default=0) / 2**20, 2
            ),
            "cache_entries": [f["cache_entries"] for f in fps],
        }
    print(json.dumps(result))
    ray.shutdown()


def crawl_only() -> None:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    ensure_corpus()
    out = run_crawl_bench()
    out["cpu_canary_sec"] = _cpu_canary()
    out["membw_canary_sec"] = _membw_canary()
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    elif "--decode-control" in sys.argv:
        decode_control(int(sys.argv[sys.argv.index("--decode-control") + 1]))
    elif "--rss-probe" in sys.argv:
        rss_probe(sys.argv[sys.argv.index("--rss-probe") + 1])
    elif "--rss" in sys.argv:
        rss()
    elif "--actor-rss" in sys.argv:
        actor_rss()
    elif "--crawl-only" in sys.argv:
        crawl_only()
    else:
        main()
