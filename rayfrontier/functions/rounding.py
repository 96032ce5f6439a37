"""Oracle-stable float quantization.

DuckDB's ``round(x, nd)`` computes ``copysign(floor(|x|*10^nd + 0.5), x) /
10^nd`` — every input within half a quantum of a lattice point maps to the
*same* double. ``pyarrow.compute.round`` does not: an input already within a
ULP of the lattice passes through unchanged, so two sums that differ only by
summation order can round to different doubles (observed on sf0.01
``sum(o_totalprice)``). All query outputs that feed the driver's value-hash
compare must round through :func:`quantize`, and the paired oracle SQL must
use DuckDB ``round`` with the same digit count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def quantize(values, ndigits: int) -> np.ndarray:
    """Round half-away-from-zero onto the 10^-ndigits lattice, DuckDB-style."""
    x = np.asarray(values, dtype=np.float64)
    scale = 10.0**ndigits
    return np.copysign(np.floor(np.abs(x) * scale + 0.5), x) / scale


def quantize_cols(t: pa.Table, cols: dict[str, int]) -> pa.Table:
    for c, nd in cols.items():
        i = t.schema.get_field_index(c)
        arr = t[c].to_numpy(zero_copy_only=False)
        t = t.set_column(i, c, pa.array(quantize(arr, nd), pa.float64()))
    return t
