"""Half-away-from-zero rounding, shared by every SQL-paired pipeline.

DuckDB's ``round()`` on DOUBLE rounds ties AWAY from zero
(``std::round(value * 10^d) / 10^d``), while ``np.round`` / Python
``round`` / pandas ``.round`` / Arrow's default round mode are
half-to-EVEN.  Round 1's only red CORRECTNESS cell was exactly this: a
tie at 0.8203125 rounded to 0.820312 by numpy and 0.820313 by DuckDB.
Every value that feeds a driver-compared (hash-exact) result must round
through these helpers so both sides agree bit-for-bit.

``tests/test_rounding.py`` fuzzes all three implementations (numpy
helper, Arrow kernel, DuckDB) against each other on tie-heavy inputs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def round_half_away(x, decimals: int):
    """numpy round-half-away-from-zero; mirrors DuckDB round() on DOUBLE.

    Accepts scalars or arrays; returns the same shape (Python float for
    scalar input).
    """
    p = 10.0 ** decimals
    scaled = np.asarray(x, dtype=np.float64) * p
    out = np.where(scaled >= 0, np.floor(scaled + 0.5), np.ceil(scaled - 0.5)) / p
    if np.isscalar(x) or getattr(x, "ndim", 1) == 0:
        return float(out)
    return out


def pc_round_half_away(arr: pa.Array | pa.ChunkedArray, decimals: int) -> pa.Array:
    """Arrow-array variant.  NOT ``pc.round(round_mode=...)``: Arrow's kernel
    multiplies by the reciprocal (``x * 10^-d``) where DuckDB divides
    (``.../10^d``), which differs by one ULP on values like sum(2-decimal
    cents) — e.g. Arrow 199.42000000000002 vs DuckDB 199.42.  Routing
    through the numpy helper keeps the divide and the bit-exact match."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    vals = arr.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    return pa.array(np.atleast_1d(round_half_away(vals, decimals)), pa.float64())
