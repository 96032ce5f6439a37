"""Arrow block hygiene helpers.

pyarrow 16 ``Schema.__hash__`` raises on schemas that carry key-value
metadata (the metadata is held as a dict). Parquet files written via pandas
embed a ``b'pandas'`` metadata blob, and ``pa.Table.from_pandas`` adds one
too — so every Ray Data groupby/sort reduce that tries to dedup block
schemas logs "Failed to hash the schemas" per block and skips the dedup.
Stripping the (semantically irrelevant) metadata at the read and after every
``from_pandas`` keeps schemas hashable; the strip itself is zero-copy.
"""

from __future__ import annotations

import pyarrow as pa


def bare(t: pa.Table) -> pa.Table:
    """Drop schema-level metadata (zero-copy)."""
    if t.schema.metadata:
        return t.replace_schema_metadata(None)
    return t


def from_pandas_bare(df, **kw) -> pa.Table:
    """``pa.Table.from_pandas`` without the pandas metadata blob."""
    return bare(pa.Table.from_pandas(df, preserve_index=False, **kw))


def read_parquet_bare(paths, columns=None, **kw):
    """``ray.data.read_parquet`` with a metadata-free schema.

    Passing an explicit stripped ``schema=`` keeps even the read task's own
    block concatenation free of unhashable schemas (a map_batches strip would
    run too late for those).
    """
    import pyarrow.parquet as pq
    import ray.data as rd

    first = paths[0] if isinstance(paths, (list, tuple)) else paths
    full = pq.read_schema(first)
    names = columns if columns is not None else full.names
    sch = pa.schema([full.field(c).remove_metadata() for c in names])
    return rd.read_parquet(paths, columns=columns, schema=sch, **kw)
