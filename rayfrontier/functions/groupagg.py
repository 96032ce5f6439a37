"""High-cardinality groupby without the tiny-groups anti-pattern.

Ray Data's ``groupby(keys).aggregate(...)`` pays per-GROUP scheduling/Python
overhead: measured 161 s for a Count over 1.3M distinct ``(a, b)`` pairs on 32
CPUs — versus <1 s for the same aggregation done vectorized inside pandas.
Any aggregation whose group count scales with the DATA (content hashes,
candidate pairs, URLs) must instead:

  1. bucket rows into a data-sized number of coarse partitions by key hash
     (vectorized, map-side; :func:`auto_nparts` — ~256 MiB of input per
     partition, floored at max(64, 2× cluster CPUs) so the count grows with
     the data instead of capping parallelism or per-task memory);
  2. ``groupby(part).map_groups(...)`` — tens-to-thousands of groups, not
     millions;
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
    """``ds.groupby(key).map_groups(fn)`` over the default range-sort exchange.

    A HASH_SHUFFLE exchange (detached-DataContext flip + aggregator actors)
    was shipped briefly to stop the streaming executor's cosmetic "RefBundle
    with a different schema: (empty)" warnings — quantile-sampled sort
    boundaries over a low-cardinality key (the 64-value coarse partition ids)
    duplicate → empty ranges → zero-schema blocks. Measured A/B at sf0.1 / 32
    CPUs it is 1.6–2.6× SLOWER end-to-end (docs_ngram_pairs 6.5 s vs 4.1 s,
    user_sessions 2.6 s vs 1.2 s, lineitem_quantiles 1.4 s vs 0.9 s): every
    exchange pays fresh aggregator-actor startup, and at num_partitions=32 it
    degrades 4× further. Per-query shuffles on plain sort tasks win at any
    scale where the exchange count matters; the empty-range warning is
    log-noise (zero-row bundles are handled correctly downstream) and is
    dropped by :func:`mute_empty_schema_warnings` instead.

    ``num_partitions`` is accepted for signature stability; the sort exchange
    sizes itself from the input block count.
    """
    del num_partitions
    mute_empty_schema_warnings()
    return ds.groupby(key).map_groups(fn, batch_format="pyarrow")


class _EmptySchemaFilter:
    def filter(self, record) -> bool:  # noqa: A003 - logging protocol
        return "RefBundle with a different schema" not in record.getMessage()


def mute_empty_schema_warnings() -> None:
    """Drop Ray Data's per-bundle "different schema: (empty)" WARNING — emitted
    for the zero-row blocks that empty sort ranges produce under a
    low-cardinality group key. The empty bundles are semantically fine (they
    carry no rows and concat away); the warning is per-run log spam. Attached
    to the emitting module logger so nothing else is silenced — Ray Data's
    lazy logging re-config resets LEVELS on its child loggers, which is why a
    plain ``setLevel(ERROR)`` on ``ray.data`` does not stick, but it leaves
    attached filters alone."""
    import logging

    lg = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    )
    if not any(isinstance(f, _EmptySchemaFilter) for f in lg.filters):
        lg.addFilter(_EmptySchemaFilter())


#: per-partition in-memory budget: one coarse partition is materialized as ONE
#: pandas DataFrame inside its map_groups task, so this bounds per-task heap.
TARGET_PARTITION_BYTES = 256 << 20


def auto_nparts(
    size_bytes: int | None = None,
    *,
    target_partition_bytes: int = TARGET_PARTITION_BYTES,
    floor: int = 64,
) -> int:
    """Coarse-partition count sized to the DATA, not a constant.

    A fixed nparts caps parallelism at that constant and grows per-task
    memory linearly with input (each partition is one in-task DataFrame).
    Scaling rule: enough partitions that each holds ~``target_partition_bytes``
    of input, floored at max(``floor``, 2× cluster CPUs) so small inputs still
    spread over the cluster. At 100 TB / 256 MiB that is ~400k partitions —
    fine, the partition id is just a hash-mod key.
    """
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    lo = max(floor, 2 * ncpu)
    if size_bytes is None or size_bytes <= 0:
        return lo
    import math

    return max(lo, math.ceil(size_bytes / target_partition_bytes))


def parquet_size_bytes(paths) -> int:
    """UNCOMPRESSED byte size of parquet file(s) from footer metadata only —
    no scan, no Dataset execution (``ds.size_bytes()`` would materialize a
    lazy pipeline mid-stream). Over-estimates column-pruned reads (counts all
    columns), which errs toward more partitions — the safe direction."""
    import pyarrow.parquet as pq

    if not isinstance(paths, (list, tuple)):
        paths = [paths]
    total = 0
    for p in paths:
        md = pq.ParquetFile(p).metadata
        for i in range(md.num_row_groups):
            total += md.row_group(i).total_byte_size
    return total


def coarse_group_aggregate(
    ds,
    keys: list[str],
    agg: Callable[[pd.DataFrame], pd.DataFrame],
    nparts: int | None = None,
    *,
    size_bytes: int | None = None,
):
    """Group ``ds`` by ``keys`` and apply the vectorized per-group aggregation
    ``agg`` (a pandas fn applied to each coarse PARTITION — it must do its own
    ``df.groupby(keys)`` inside, which is C-fast).

    ``nparts=None`` (default) sizes the partition count to the data via
    :func:`auto_nparts` — pass ``size_bytes`` (e.g. from
    :func:`parquet_size_bytes` on the source files) so the count grows with
    the input instead of pinning at the floor."""
    if nparts is None:
        nparts = auto_nparts(size_bytes)

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column("_part", pa.array(_part_of(t, keys, nparts), pa.int32()))

    def run(t: pa.Table) -> pa.Table:
        # Arrow in, Arrow out: pandas-format blocks carry dict-shaped schemas
        # Ray can't hash (one warning per block, schema dedup skipped); the
        # pandas hop happens privately inside the fn
        out = agg(t.drop_columns(["_part"]).to_pandas())
        return from_pandas_bare(out)

    return grouped_map(ds.map_batches(add_part, batch_format="pyarrow"), "_part", run)


def pair_count(ds, nparts: int | None = None, *, size_bytes: int | None = None):
    """count rows per (a, b) → columns (a, b, common)."""
    return coarse_group_aggregate(
        ds,
        ["a", "b"],
        lambda df: df.groupby(["a", "b"], as_index=False).size().rename(columns={"size": "common"}),
        nparts,
        size_bytes=size_bytes,
    )


def pair_distinct(ds, nparts: int | None = None, *, size_bytes: int | None = None):
    """distinct (a, b) rows."""
    return coarse_group_aggregate(
        ds, ["a", "b"], lambda df: df.drop_duplicates(["a", "b"]), nparts, size_bytes=size_bytes
    )


def pair_min(ds, col: str, nparts: int | None = None, *, size_bytes: int | None = None):
    return coarse_group_aggregate(
        ds,
        ["a", "b"],
        lambda df: df.groupby(["a", "b"], as_index=False)[col].min(),
        nparts,
        size_bytes=size_bytes,
    )


def pair_max(ds, col: str, nparts: int | None = None, *, size_bytes: int | None = None):
    return coarse_group_aggregate(
        ds,
        ["a", "b"],
        lambda df: df.groupby(["a", "b"], as_index=False)[col].max(),
        nparts,
        size_bytes=size_bytes,
    )
