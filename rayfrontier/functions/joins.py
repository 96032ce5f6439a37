"""Large×large joins for Ray Data.

Three regimes (ray_guide.md "Joins and lookups" / SURVEY.md J-family):

* small side  → broadcast (`ray.put` + per-batch searchsorted/merge) — see
  pipelines/relational.py q_mkt_revenue / q_supplier_nation / anti-join.
* both large  → :func:`hash_join`: native ``Dataset.join`` (hash-partitioned,
  available in this Ray) when present, else the portable explicit pattern —
  bucket both sides by key hash, union, one pandas merge per bucket.
* as-of joins → sorted per-key ``map_groups`` (pipelines/relational.py
  q_click_last_purchase).

Skew: a hot key lands in one partition. Opt-in ``salt_keys=[...]`` pre-splits
the BIG (left) side's hot keys across ``salt_factor`` sub-partitions and
replicates the matching small-side rows once per salt; the join then matches
on (key, salt), so the output is row-for-row IDENTICAL to the unsalted join
(test-pinned) — no caller-side undo needed for inner/left joins. We take an
explicit key list rather than auto-detecting because hot keys are usually
known (the crawl's mega-domains, dedup's stop-shingles) and detection would
cost a scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .hashing import splitmix64


def _bucket(t: pa.Table, key: str, nparts: int, salt_col: str | None = None) -> pa.Table:
    col = t[key].to_numpy(zero_copy_only=False)
    if col.dtype.kind not in ("i", "u"):
        raise TypeError(f"hash_join key {key!r} must be integer (got {col.dtype})")
    with np.errstate(over="ignore"):
        h = splitmix64(col.astype(np.uint64))
        if salt_col is not None:
            # mix the salt so a hot key's sub-partitions land in different buckets
            h = splitmix64(h + t[salt_col].to_numpy(zero_copy_only=False).astype(np.uint64))
        b = (h % np.uint64(nparts)).astype(np.int32)
    return t.append_column("_bucket", pa.array(b, pa.int32()))


def _salt_sides(left, right, on: str, right_on: str, salt_keys, salt_factor: int):
    """Pre-split hot keys on the big side; replicate small-side hot rows.

    Left rows with a hot key get round-robin salts 0..salt_factor-1 (which
    salt a row gets is irrelevant to the result — every salt has a full
    replica of the right row); all other rows get salt 0. Right rows with a
    hot key are replicated once per salt. Inner/left joins then match each
    left row to exactly one replica — bit-identical output to unsalted.
    """
    hot = np.unique(np.asarray(list(salt_keys), dtype=np.int64))

    def salt_left(t: pa.Table) -> pa.Table:
        k = t[on].to_numpy(zero_copy_only=False).astype(np.int64)
        is_hot = np.isin(k, hot)
        salt = np.zeros(len(k), dtype=np.int32)
        n_hot = int(is_hot.sum())
        if n_hot:
            salt[is_hot] = (np.arange(n_hot) % salt_factor).astype(np.int32)
        return t.append_column("_salt", pa.array(salt, pa.int32()))

    def salt_right(t: pa.Table) -> pa.Table:
        k = t[right_on].to_numpy(zero_copy_only=False).astype(np.int64)
        is_hot = np.isin(k, hot)
        zero = pa.array(np.zeros(t.num_rows, np.int32), pa.int32())
        if not is_hot.any():
            return t.append_column("_salt_r", zero)
        cold = t.filter(pa.array(~is_hot)).append_column(
            "_salt_r", pa.array(np.zeros(int((~is_hot).sum()), np.int32), pa.int32())
        )
        hot_t = t.filter(pa.array(is_hot))
        reps = [
            hot_t.append_column(
                "_salt_r", pa.array(np.full(hot_t.num_rows, s, np.int32), pa.int32())
            )
            for s in range(salt_factor)
        ]
        return pa.concat_tables([cold] + reps)

    return (
        left.map_batches(salt_left, batch_format="pyarrow"),
        right.map_batches(salt_right, batch_format="pyarrow"),
    )


_SALT_COLS = ("_salt", "_salt_r")


def _drop_salt_table(t: pa.Table) -> pa.Table:
    return t.drop_columns([c for c in _SALT_COLS if c in t.column_names])


def hash_join(left, right, on: str, right_on: str | None = None, how: str = "inner",
              nparts: int = 64, prefer_native: bool = True,
              salt_keys=None, salt_factor: int = 8):
    """Hash-partitioned join of two Datasets on an integer key column.

    ``salt_keys``: optional iterable of known-hot key VALUES to pre-split
    across ``salt_factor`` sub-partitions (left side salted, right side
    replicated). Output is identical to the unsalted join; requires
    ``how`` in ('inner', 'left') since the right side is the replicated one.
    """
    right_on = right_on or on
    # materialize ONCE: a generator argument would be exhausted by the
    # emptiness test and silently disable the salting it asked for
    salt_keys = list(salt_keys) if salt_keys is not None else []
    salted = len(salt_keys) > 0
    if salted:
        if how not in ("inner", "left"):
            raise ValueError(
                "salt_keys replicates the RIGHT side, which is only lossless "
                f"for inner/left joins (got how={how!r})"
            )
        left, right = _salt_sides(left, right, on, right_on, salt_keys, salt_factor)
        lkeys, rkeys = (on, "_salt"), (right_on, "_salt_r")
    else:
        lkeys, rkeys = (on,), (right_on,)

    if prefer_native and hasattr(left, "join"):
        import ray

        # native join spawns num_partitions aggregator ACTORS; cap by cluster
        # CPUs and give them small fractional cpus, or a small cluster
        # deadlocks waiting for actors that can never schedule — and chained
        # joins (two pools alive at once) plus pinned engine actors must
        # still leave task slots free at 4 CPUs
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        parts = max(2, min(nparts, ncpu))
        # pandas-style names → Ray JoinType names
        native_how = {"left": "left_outer", "right": "right_outer", "outer": "full_outer"}.get(how, how)
        out = left.join(
            right,
            join_type=native_how,
            num_partitions=parts,
            on=lkeys,
            right_on=rkeys,
            aggregator_ray_remote_args={"num_cpus": 0.25},
        )
        if salted:
            out = out.map_batches(_drop_salt_table, batch_format="pyarrow")
        return out

    # portable explicit fallback: tag side, bucket, union, merge per bucket
    def tag(side: str):
        def fn(t: pa.Table) -> pa.Table:
            key = on if side == "L" else right_on
            salt_col = (lkeys[1] if side == "L" else rkeys[1]) if salted else None
            t = _bucket(t, key, nparts, salt_col)
            return t.append_column("_side", pa.array([side] * t.num_rows, pa.string()))

        return fn

    lt = left.map_batches(tag("L"), batch_format="pyarrow")
    rt = right.map_batches(tag("R"), batch_format="pyarrow")
    both = lt.union(rt)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["_side"] == "L"].drop(columns=["_side", "_bucket"]).dropna(axis=1, how="all")
        r = g[g["_side"] == "R"].drop(columns=["_side", "_bucket"]).dropna(axis=1, how="all")
        out = l.merge(r, left_on=list(lkeys), right_on=list(rkeys), how=how)
        if salted:
            out = out.drop(columns=[c for c in _SALT_COLS if c in out.columns])
        return out

    return both.groupby("_bucket").map_groups(merge, batch_format="pandas")
