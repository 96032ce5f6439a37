"""Tiered link/policy dict unit tests (state/tiered.py — VERDICT r4 #1).

Model-based equivalence against a plain dict under cap pressure (every op
sequence must be observationally identical), plus forged 64-bit collisions
via injected hash functions — the escrow-verify path that real FNV would
exercise ~once per 10^19 probe pairs.
"""

from __future__ import annotations

import numpy as np
import pytest

from rayfrontier.state.tiered import TieredLinkDict, TieredPolicyDict


def _mk(tmp_path, cap=8, **kw):
    return TieredLinkDict(str(tmp_path / "links"), hot_cap=cap, **kw)


def test_link_dict_model_equivalence(tmp_path):
    rng = np.random.default_rng(7)
    t = _mk(tmp_path, cap=8)
    model: dict[str, int] = {}
    universe = [f"http://h{i % 40}.example/p{i}" for i in range(160)]
    for step in range(2000):
        k = universe[int(rng.integers(len(universe)))]
        op = int(rng.integers(4))
        if op == 0:  # mark
            if k not in model:
                t[k] = 0
                model[k] = 0
        elif op == 1:  # bump
            if k in model:
                t[k] += 1
                model[k] += 1
        elif op == 2:  # probe
            assert (k in t) == (k in model)
            assert t.get(k, -1) == model.get(k, -1)
        else:  # bulk update (an Overlay.commit)
            batch = {
                universe[int(j)]: int(rng.integers(5))
                for j in rng.integers(len(universe), size=6)
            }
            t.update(batch)
            model.update(batch)
    assert len(t) == len(model)
    assert t == model
    assert dict(t.items()) == model
    assert set(t) == set(model)
    assert t.flushes > 0, "cap=8 over 160 keys never flushed — no tier pressure"
    # every key hash present exactly once per key (collisions none here)
    assert t.key_hashes().size == len(model)
    # resident strings bounded by the contract
    res = t.resident()
    assert res["hot_strings"] <= 8 + 6  # cap + one bulk batch transient
    assert res["cold_entries"] + res["hot_strings"] + res["collision_strings"] == len(model)


def test_link_dict_forged_collisions(tmp_path):
    # hash = string length: heavy forged collisions; membership/counts must
    # stay exact via the escrow verify + collision quarantine
    hs = lambda s: len(s)
    hv = lambda ks: np.array([len(k) for k in ks], dtype=np.uint64)
    t = _mk(tmp_path, cap=4, hash_scalar=hs, hash_vec=hv)
    model: dict[str, int] = {}
    keys = ["aa", "bb", "cc", "ddd", "eee", "ffff", "g", "hh", "iii", "jjjj", "kkkkk"]
    for i, k in enumerate(keys):
        t[k] = i
        model[k] = i
    for k in keys:
        assert k in t
        assert t[k] == model[k]
    # same-length absent keys must NOT be confused with present ones
    for absent in ["zz", "yyy", "xxxx", "wwwww", "q"]:
        assert absent not in t
        assert t.get(absent) is None
    t.update({"zz": 9, "aa": 7})
    model.update({"zz": 9, "aa": 7})
    assert t == model
    assert sorted(t.items()) == sorted(model.items())
    assert len(t.collisions) > 0, "forged collisions never quarantined"
    assert t.has_all(["aa", "bb", "zz"])
    assert not t.has_all(["aa", "absent-key"])


def test_link_dict_intra_batch_duplicate_hash(tmp_path):
    hv = lambda ks: np.array([len(k) for k in ks], dtype=np.uint64)
    t = _mk(tmp_path, cap=2, hash_scalar=len, hash_vec=hv)  # clamped to 8
    # one flush batch holding two same-hash strings ("ab"/"cd"): both quarantine
    batch = {"ab": 1, "cd": 2} | {"k" * n: n for n in range(3, 10)}
    t.update(batch)
    assert t.flushes == 1
    for k, v in batch.items():
        assert t[k] == v
    assert "ab" in t.collisions and "cd" in t.collisions
    assert t == batch


def test_link_dict_getitem_keyerror(tmp_path):
    t = _mk(tmp_path)
    t["k"] = 1
    with pytest.raises(KeyError):
        t["missing"]


def test_policy_dict_model_and_first_wins(tmp_path):
    t = TieredPolicyDict(str(tmp_path / "policy"), hot_cap=4)
    model: dict[int, str] = {}
    rng = np.random.default_rng(3)
    for i in range(200):
        k = int(rng.integers(0, 1 << 64, dtype=np.uint64))
        if k not in model:
            t[k] = f"domain{i % 17}"
            model[k] = f"domain{i % 17}"
        assert k in t
    assert t == model
    assert len(t) == len(model)
    assert t.flushes > 0
    # cold values are first-wins immutable: a re-set of a cold key is a no-op
    cold_key = next(iter(int(h) for h in t.cold_h[:1]))
    t[cold_key] = "other"
    assert t.get(cold_key) == model[cold_key]
    assert t.resident()["hot_values"] <= 4 + 1


def test_policy_dict_top_bit_keys(tmp_path):
    t = TieredPolicyDict(str(tmp_path / "policy"), hot_cap=2)
    ks = [(1 << 63) + 5, (1 << 64) - 1, 3, 1 << 62]
    for i, k in enumerate(ks):
        t[k] = f"d{i}"
    for i, k in enumerate(ks):
        assert k in t
        assert t.get(k) == f"d{i}"
    assert t.to_dict() == {k: f"d{i}" for i, k in enumerate(ks)}
