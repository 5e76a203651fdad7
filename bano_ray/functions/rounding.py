"""SQL-compatible decimal rounding.

DuckDB's ``round(x, n)`` on DOUBLE rounds half away from zero on the scaled
value (``floor(x*10^n + 0.5)`` for positives), while Python's ``round`` and
numpy round half-to-even — the two diverge on values whose scaled double
representation sits exactly on a .5 boundary (observed on synthesized
coordinates: 44.5004235 → 44.500423 vs 44.500424).  Every rounded value the
oracle compares must go through these helpers.
"""

from __future__ import annotations

import math


def sql_round(x: float, ndigits: int) -> float:
    """Scalar round matching DuckDB/ANSI ROUND (half away from zero)."""
    s = x * (10.0 ** ndigits)
    r = math.floor(s + 0.5) if s >= 0 else math.ceil(s - 0.5)
    return r / (10.0 ** ndigits)


def sql_round_arr(arr, ndigits: int):
    """Arrow-array round matching DuckDB ROUND (verified element-identical
    to DuckDB on 50k uniform + boundary samples)."""
    import pyarrow.compute as pc

    return pc.round(arr, ndigits=ndigits, round_mode="half_towards_infinity")
