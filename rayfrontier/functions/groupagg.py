"""High-cardinality groupby without the tiny-groups anti-pattern.

Ray Data's ``groupby(keys).aggregate(...)`` pays per-GROUP scheduling/Python
overhead: measured 161 s for a Count over 1.3M distinct ``(a, b)`` pairs on 32
CPUs — versus <1 s for the same aggregation done vectorized inside pandas.
Any aggregation whose group count scales with the DATA (content hashes,
candidate pairs, URLs) must instead:

  1. bucket rows into a FIXED number of coarse partitions by key hash
     (vectorized, map-side);
  2. ``groupby(part).map_groups(...)`` — 64 groups, not millions;
  3. run the real aggregation vectorized (pandas/pyarrow) inside each
     partition. Correct because the coarse key is a function of the group
     key: every row of a group lands in the same partition.

Use Ray's native groupby only when group count is small and bounded (status
codes, rule names, hosts-per-wave).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

from .blocks import from_pandas_bare
from .hashing import fnv1a64, splitmix64

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _part_of(t: pa.Table, keys: list[str], nparts: int) -> np.ndarray:
    acc = np.zeros(t.num_rows, dtype=np.uint64)
    for k in keys:
        col = t[k].to_numpy(zero_copy_only=False)
        if col.dtype.kind in ("i", "u"):
            vals = col.astype(np.uint64)
        else:
            # strings etc (rare path; prefer int keys): MUST be a deterministic
            # hash — Python's hash() is PYTHONHASHSEED-salted per process, so
            # the same key hashed in different Ray workers would land in
            # different partitions, silently splitting groups
            vals = np.fromiter(
                (fnv1a64(str(x).encode("utf-8", "surrogatepass")) for x in col),
                dtype=np.uint64,
                count=len(col),
            )
        with np.errstate(over="ignore"):
            acc = splitmix64(acc ^ vals)
    return (acc % np.uint64(nparts)).astype(np.int32)


def grouped_map(ds, key: str | list[str], fn, num_partitions: int | None = None):
    """``ds.groupby(key).map_groups(fn)`` over a HASH exchange instead of the
    default range sort.

    Why not the sort: range boundaries are quantile-sampled from the key
    values, and over a low-cardinality key (the 64-value coarse partition
    ids) duplicate boundaries are common → empty ranges → zero-row,
    zero-SCHEMA blocks out of both the Sort and the map_groups wrapper (Ray's
    group iterator yields nothing for an empty block), which the streaming
    executor reports as "RefBundle with a different schema" on every run.
    Hash partitioning sends each key to exactly one of ``num_partitions``
    occupied partitions — no empty ranges, stable schemas.

    The strategy flip rides a DETACHED DataContext copy (``_plan._context``)
    so the caller's lineage — which may share this dataset's plan context and
    native sort-based joins — is untouched. Aggregator actors get a tiny
    explicit CPU reservation: their default (cluster CPUs / partitions each)
    starves task operators on small clusters (the measured 4-CPU deadlock
    recipe, CLAUDE.md).
    """
    import copy as _copy

    import ray
    from ray.data.context import ShuffleStrategy

    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    P = num_partitions or max(2, ncpu // 4)
    ctx = _copy.deepcopy(ds.context)
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.05
    ds._plan._context = ctx
    return ds.groupby(key, num_partitions=P).map_groups(fn, batch_format="pyarrow")


def coarse_group_aggregate(
    ds,
    keys: list[str],
    agg: Callable[[pd.DataFrame], pd.DataFrame],
    nparts: int = 64,
):
    """Group ``ds`` by ``keys`` and apply the vectorized per-group aggregation
    ``agg`` (a pandas fn applied to each coarse PARTITION — it must do its own
    ``df.groupby(keys)`` inside, which is C-fast)."""

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column("_part", pa.array(_part_of(t, keys, nparts), pa.int32()))

    def run(t: pa.Table) -> pa.Table:
        # Arrow in, Arrow out: pandas-format blocks carry dict-shaped schemas
        # Ray can't hash (one warning per block, schema dedup skipped); the
        # pandas hop happens privately inside the fn
        out = agg(t.drop_columns(["_part"]).to_pandas())
        return from_pandas_bare(out)

    return grouped_map(ds.map_batches(add_part, batch_format="pyarrow"), "_part", run)


def pair_count(ds, nparts: int = 64):
    """count rows per (a, b) → columns (a, b, common)."""
    return coarse_group_aggregate(
        ds,
        ["a", "b"],
        lambda df: df.groupby(["a", "b"], as_index=False).size().rename(columns={"size": "common"}),
        nparts,
    )


def pair_distinct(ds, nparts: int = 64):
    """distinct (a, b) rows."""
    return coarse_group_aggregate(
        ds, ["a", "b"], lambda df: df.drop_duplicates(["a", "b"]), nparts
    )


def pair_min(ds, col: str, nparts: int = 64):
    return coarse_group_aggregate(
        ds, ["a", "b"], lambda df: df.groupby(["a", "b"], as_index=False)[col].min(), nparts
    )


def pair_max(ds, col: str, nparts: int = 64):
    return coarse_group_aggregate(
        ds, ["a", "b"], lambda df: df.groupby(["a", "b"], as_index=False)[col].max(), nparts
    )
