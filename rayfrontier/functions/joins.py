"""Large×large joins for Ray Data.

Three regimes (ray_guide.md "Joins and lookups" / SURVEY.md J-family):

* small side  → broadcast (`ray.put` + per-batch searchsorted/merge) — see
  pipelines/relational.py q_mkt_revenue / q_supplier_nation / anti-join.
* both large  → :func:`hash_join`: native ``Dataset.join`` (hash-partitioned,
  available in this Ray) when present, else the portable explicit pattern —
  bucket both sides by key hash, union, one pandas merge per bucket.
* as-of joins → sorted per-key ``map_groups`` (pipelines/relational.py
  q_click_last_purchase).

Skew: the explicit path salts nothing by itself — a hot key lands one bucket.
Callers with known-hot keys should pre-split them (`key → (key, salt)` on the
big side, replicate the small row per salt) before joining; we document
rather than auto-detect because salting replicates rows and must be undone
in the aggregate that follows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .hashing import splitmix64


def _bucket(t: pa.Table, key: str, nparts: int) -> pa.Table:
    col = t[key].to_numpy(zero_copy_only=False)
    if col.dtype.kind not in ("i", "u"):
        raise TypeError(f"hash_join key {key!r} must be integer (got {col.dtype})")
    with np.errstate(over="ignore"):
        b = (splitmix64(col.astype(np.uint64)) % np.uint64(nparts)).astype(np.int32)
    return t.append_column("_bucket", pa.array(b, pa.int32()))


def hash_join(left, right, on: str, right_on: str | None = None, how: str = "inner",
              nparts: int = 64, prefer_native: bool = True):
    """Hash-partitioned join of two Datasets on an integer key column."""
    right_on = right_on or on
    if prefer_native and hasattr(left, "join"):
        import ray

        # native join spawns num_partitions aggregator ACTORS; cap by cluster
        # CPUs and give them small fractional cpus, or a small cluster
        # deadlocks waiting for actors that can never schedule — and chained
        # joins (two pools alive at once) plus pinned engine actors must
        # still leave task slots free at 4 CPUs
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        parts = max(2, min(nparts, ncpu))
        return left.join(
            right,
            join_type=how,
            num_partitions=parts,
            on=(on,),
            right_on=(right_on,),
            aggregator_ray_remote_args={"num_cpus": 0.25},
        )

    # portable explicit fallback: tag side, bucket, union, merge per bucket
    def tag(side: str):
        def fn(t: pa.Table) -> pa.Table:
            key = on if side == "L" else right_on
            t = _bucket(t, key, nparts)
            return t.append_column("_side", pa.array([side] * t.num_rows, pa.string()))

        return fn

    lt = left.map_batches(tag("L"), batch_format="pyarrow")
    rt = right.map_batches(tag("R"), batch_format="pyarrow")
    both = lt.union(rt)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["_side"] == "L"].drop(columns=["_side", "_bucket"]).dropna(axis=1, how="all")
        r = g[g["_side"] == "R"].drop(columns=["_side", "_bucket"]).dropna(axis=1, how="all")
        return l.merge(r, left_on=on, right_on=right_on, how=how)

    return both.groupby("_bucket").map_groups(merge, batch_format="pandas")
