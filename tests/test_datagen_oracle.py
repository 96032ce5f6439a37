"""Datagen determinism + sequential-oracle behavior on the synthetic corpus."""

from collections import Counter

import numpy as np

from rayfrontier.codecs import decode_image, psnr
from rayfrontier.config import CrawlConfig, DatagenConfig
from rayfrontier.datagen import (
    HostMap,
    SyntheticStore,
    caption_html,
    dictionary_set,
    gen_row,
    ground_truth_text,
    image_id,
    pixels_of,
    seeds_list,
)
from rayfrontier.oracle import sequential_crawl


def test_rows_deterministic(small_cfg):
    r1 = gen_row(small_cfg, 17)
    r2 = gen_row(small_cfg, 17)
    assert r1["caption"] == r2["caption"]
    assert r1["bytes"] == r2["bytes"]
    assert r1["phash"] == r2["phash"]


def test_row_invariants(small_cfg):
    for i in range(0, 120, 7):
        r = gen_row(small_cfg, i)
        px = pixels_of(small_cfg, i)
        dec = decode_image(r["bytes"], r["fmt"])
        assert (int(r["h"]), int(r["w"]), 3) == dec.shape
        if r["fmt"] == "ppm":
            assert np.array_equal(dec, px)
        else:
            assert psnr(px, dec) >= 40.0


def test_store_fetch_semantics(small_cfg):
    store = SyntheticStore(small_cfg)
    hm = HostMap(small_cfg)
    # landing page
    assert store.fetch("http://site0000.com") == caption_html(small_cfg, hm.landing_image(0))
    # direct page on its own host
    i = hm.landing_image(1) + 1
    url = f"http://site0001.com/{image_id(i)}"
    assert store.fetch(url) == caption_html(small_cfg, i)
    # query string ignored, fragment ignored by server
    assert store.fetch(url + "?lang=en&x=1") == caption_html(small_cfg, i)
    # wrong host → 404
    assert store.fetch(f"http://site0000.com/{image_id(i)}") == ""
    # unknown host / junk
    assert store.fetch("http://nosuch.org/x") == ""
    assert store.fetch("mailto:a@b.c") == ""
    assert store.fetch(f"http://site0001.com/{image_id(10**7)}") == ""


def test_oracle_covers_reference_paths(small_cfg):
    cfg = CrawlConfig()
    store = SyntheticStore(small_cfg)
    res = sequential_crawl(
        seeds_list(small_cfg), store, cfg,
        ground_truth_text(small_cfg), dictionary_set(small_cfg),
    )
    status = Counter(res.domain_status.values())
    assert status["successful"] >= 5
    # every link-attempt class occurs in the corpus
    assert any(r[5] for r in res.crawl_log), "duplicates must occur"
    assert any(not r[3] for r in res.crawl_log), "failed fetches must occur"
    assert any(r[3] and not r[4] and not r[5] for r in res.crawl_log), "rejected policies occur"
    sims = [r[2] for r in res.crawl_log]
    assert max(sims) >= 0.6 and min(sims) == 0.0
    # seq strictly increasing = exact sequential order
    seqs = [r[6] for r in res.crawl_log]
    assert seqs == list(range(len(seqs)))
    # revisits recorded in the seen dict
    assert sum(res.url_seen.values()) > 0
    # determinism
    res2 = sequential_crawl(
        seeds_list(small_cfg), store, cfg,
        ground_truth_text(small_cfg), dictionary_set(small_cfg),
    )
    assert res2.crawl_log == res.crawl_log
    assert res2.url_seen == res.url_seen


def test_zipf_exp_cache_compat():
    """Guard the math.exp == np.exp int-equality assumption that regenerated
    captions rely on for compatibility with corpora cached by np.exp-era code
    (ADVICE round-4), on THIS box's libm, for the shipped vocab sizes
    (policy=120, generic=300, foreign=120 — see datagen.vocabularies).

    Two sweeps: a dense linspace and a large sample of u values produced by
    the actual splitmix stream (the only u values that can ever reach
    _zipf_word). Adversarially-crafted u at an int boundary CAN show a 1-ulp
    math/np divergence (verified present even on the reference box:
    u=ln(16)/harm gives 15.999…8 vs 16.0), but a real draw lands in that
    ulp-wide window with probability ~2^-50 — the guard that matters is over
    the reachable stream, which this pins on every box."""
    import math

    from rayfrontier.datagen import _u

    for n in (120, 300):
        harm = float(np.log(n + 1.0))
        us = np.linspace(0.0, 1.0, 200_001, endpoint=False)
        m = np.array([int(math.exp(u * harm)) for u in us.tolist()])
        v = np.exp(us * harm).astype(np.int64)
        assert (m == v).all(), f"dense linspace sweep diverged for n={n}"
        stream = [_u(1234, f"compat{n}", k) for k in range(100_000)]
        ms = np.array([int(math.exp(u * harm)) for u in stream])
        vs = np.exp(np.array(stream) * harm).astype(np.int64)
        assert (ms == vs).all(), f"splitmix-stream sweep diverged for n={n}"
