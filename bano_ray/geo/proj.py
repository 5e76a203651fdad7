"""Lambert-93 (EPSG:2154) conformal conic projection — the planar CRS the
reference's source data actually lives in (French cadastre/IGN deliver
Lambert-93 metres; bano reprojects to WGS84 on import).  This is the
inverse direction: WGS84 lon/lat → Lambert-93 (x, y) metres, the
projection step a tiling/rendering pipeline runs before rasterizing.

Determinism contract (the oracle gate): the per-row chain is
``sin/tan/ln/exp`` with the EXACT operation order of the SQL oracle, the
projection constants (n, a·F, r₀, e, λ₀) are module-level doubles embedded
into the SQL as full-precision literals, and the output is rounded to
integer MILLIMETRES — coordinates are ~10⁶ m, so a few ulps of libm skew
move the double by ~10⁻¹⁰ m, five orders below the 0.5 mm rounding
boundary.  Snyder's LCC-2SP formulas (public domain, USGS PP 1395).
"""

from __future__ import annotations

import numpy as np

# GRS80 ellipsoid + Lambert-93 parameters (legal French definition)
A = 6378137.0
F_INV = 298.257222101
E2 = 2.0 / F_INV - 1.0 / (F_INV * F_INV)
E = float(np.sqrt(E2))
X0, Y0 = 700000.0, 6600000.0
LON0 = float(np.radians(3.0))

# derived 2SP constants (φ1=44°, φ2=49°, φ0=46.5°), pinned as doubles so
# the engine and the SQL literal render identically


def _m(phi: float) -> float:
    return float(np.cos(phi) / np.sqrt(1.0 - E2 * np.sin(phi) ** 2))


def _t(phi: float) -> float:
    es = E * np.sin(phi)
    return float(np.tan(np.pi / 4.0 - phi / 2.0)
                 / np.exp((E / 2.0) * np.log((1.0 - es) / (1.0 + es))))


_P1, _P2, _P0 = (float(np.radians(d)) for d in (44.0, 49.0, 46.5))
N = float((np.log(_m(_P1)) - np.log(_m(_P2)))
          / (np.log(_t(_P1)) - np.log(_t(_P2))))
AF = float(A * _m(_P1) / (N * _t(_P1) ** N))
R0 = float(AF * _t(_P0) ** N)


def lambert93(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized WGS84 degrees → Lambert-93 (x, y) metres (float64).

    Operation order mirrors oracle.q_lambert93's SQL token-for-token."""
    latr = np.radians(lat)
    lonr = np.radians(lon)
    es = E * np.sin(latr)
    t = (np.tan(np.pi / 4.0 - latr / 2.0)
         / np.exp((E / 2.0) * np.log((1.0 - es) / (1.0 + es))))
    r = AF * np.exp(N * np.log(t))
    theta = N * (lonr - LON0)
    x = X0 + r * np.sin(theta)
    y = Y0 + R0 - r * np.cos(theta)
    return x, y


def lambert93_mm(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Integer-millimetre form: ``floor(v·1000 + 0.5)`` as int64 — the
    hash-exact output the oracle gate compares."""
    x, y = lambert93(lon, lat)
    return (np.floor(x * 1000.0 + 0.5).astype(np.int64),
            np.floor(y * 1000.0 + 0.5).astype(np.int64))
