"""Mergeable cardinality sketch (HyperLogLog) for distributed approx-distinct.

The reference has no sketches (SURVEY.md §2.6); a 100 TB training-data
pipeline needs approx-distinct for URL/user/token cardinalities where exact
`unique()` would shuffle every value. Pattern per ray_guide "Aggregation at
scale": one sketch per batch inside map_batches (vectorized), merge the tiny
registers in a second stage — the shuffle carries 2^p bytes per batch, not
the values.

Standard HLL (Flajolet et al. 2007) with the usual small-range correction;
p=12 → 4096 registers, ~1.6% relative error.
"""

from __future__ import annotations

import numpy as np

from .hashing import splitmix64


def hll_create(p: int = 12) -> np.ndarray:
    return np.zeros(1 << p, dtype=np.uint8)


def hll_add_hashes(reg: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Add pre-hashed uint64 values (vectorized)."""
    p = int(np.log2(len(reg)))
    h = splitmix64(hashes.astype(np.uint64))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))  # sentinel bit
    # rank = leading zeros of rest + 1, capped at 64-p+1
    lz = np.zeros(len(h), dtype=np.uint8)
    cur = rest.copy()
    mask_top = np.uint64(1) << np.uint64(63)
    alive = np.ones(len(h), dtype=bool)
    for _ in range(64 - p + 1):
        top = (cur & mask_top) != 0
        done = alive & top
        alive &= ~top
        if not alive.any():
            break
        lz[alive] += 1
        cur = cur << np.uint64(1)
    rank = lz + 1
    np.maximum.at(reg, idx, rank)
    return reg


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_count(reg: np.ndarray) -> float:
    m = float(len(reg))
    if m >= 128:
        alpha = 0.7213 / (1 + 1.079 / m)
    elif m == 64:
        alpha = 0.709
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.673
    est = alpha * m * m / np.sum(np.power(2.0, -reg.astype(np.float64)))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)  # linear counting for small cardinalities
    return float(est)


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """Distributed approx-distinct over an integer column of a Dataset."""
    import pyarrow as pa

    def sketch(t: pa.Table) -> pa.Table:
        reg = hll_create(p)
        vals = t[col].to_numpy(zero_copy_only=False).astype(np.uint64)
        hll_add_hashes(reg, vals)
        return pa.table({"reg": pa.array([reg.tobytes()], pa.binary())})

    parts = ds.map_batches(sketch, batch_format="pyarrow", batch_size=65536).take_all()
    reg = hll_create(p)
    for row in parts:
        reg = hll_merge(reg, np.frombuffer(row["reg"], dtype=np.uint8).copy())
    return hll_count(reg)
