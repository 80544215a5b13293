"""Slippy-map tile math and spherical-mercator projection.

Parity targets (SURVEY.md §2.7):

* ``tile_number(lat, lon, z)`` — reference Tyler.kt:128,
  application.kt:396, 564, 591 (the OSM slippy formula).
* ``tile_bbox(z, x, y)`` — reference Tile.kt:11, application.kt:384, 494.
* ``project(lon, lat)`` — WGS84 -> unit-square web mercator ([0,1]^2),
  the geojson-vt convention used before clipping
  (reference application.kt:435; SURVEY.md §2.9).

Pure-Python versions for the kernel/tests, numpy versions for the
Arrow-vectorized tile kernel, and Spark Column versions (built-in math
functions only — stays JVM-side).
"""

from __future__ import annotations

import math

import numpy as np


# ----------------------------------------------------------- scalar kernels

def tile_number(lat: float, lon: float, zoom: int) -> tuple[int, int]:
    """(xtile, ytile) of the tile containing (lat, lon) at ``zoom``."""
    n = 1 << zoom
    xt = int((lon + 180.0) / 360.0 * n)
    lat_r = math.radians(lat)
    yt = int((1.0 - math.asinh(math.tan(lat_r)) / math.pi) / 2.0 * n)
    # clamp like the standard formula does at the poles / antimeridian
    xt = min(max(xt, 0), n - 1)
    yt = min(max(yt, 0), n - 1)
    return xt, yt


def tile_bbox(zoom: int, x: int, y: int) -> tuple[float, float, float, float]:
    """(lon_min, lat_min, lon_max, lat_max) of tile (z, x, y)."""
    n = 1 << zoom

    def lon(xt: float) -> float:
        return xt / n * 360.0 - 180.0

    def lat(yt: float) -> float:
        return math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * yt / n))))

    return lon(x), lat(y + 1), lon(x + 1), lat(y)


def project(lon: float, lat: float) -> tuple[float, float]:
    """WGS84 degrees -> unit-square web mercator [0,1]^2 (geojson-vt)."""
    x = lon / 360.0 + 0.5
    sin = math.sin(math.radians(lat))
    # poles map to y=0 / y=1 (geojson-vt clamps the same way; in JS the
    # intermediate is +/-Infinity, which Python's log/division won't produce)
    if sin >= 1.0:
        return x, 0.0
    if sin <= -1.0:
        return x, 1.0
    y = 0.5 - 0.25 * math.log((1 + sin) / (1 - sin)) / math.pi
    return x, min(max(y, 0.0), 1.0)


def unproject(x: float, y: float) -> tuple[float, float]:
    """Inverse of :func:`project` (unit mercator -> lon/lat degrees)."""
    lon = (x - 0.5) * 360.0
    lat = math.degrees(2.0 * math.atan(math.exp((0.5 - y) * 2.0 * math.pi)) - math.pi / 2.0)
    return lon, lat


# ------------------------------------------------------------ numpy kernels

def project_np(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    x = lon / 360.0 + 0.5
    # keep sin off +/-1 so the log stays finite at the poles (then clipped)
    sin = np.clip(np.sin(np.radians(lat)), -1.0 + 1e-15, 1.0 - 1e-15)
    y = 0.5 - 0.25 * np.log((1 + sin) / (1 - sin)) / np.pi
    return x, np.clip(y, 0.0, 1.0)


def project_np_exact(lon: np.ndarray, lat: np.ndarray
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized twin of the SCALAR :func:`project`, bit-identical to it.

    ``np.sin`` matches libm ``math.sin`` bit-for-bit on float64 (verified
    over the data domain), but ``np.log``'s SIMD kernel differs from libm
    by one ulp on ~6% of inputs — enough to flip a round-half-even tile
    coordinate sitting on a .5 boundary. The vectorized MVT fast path
    must agree with the per-row parse/clip path EXACTLY, so the log runs
    through ``math.log`` elementwise (~150 ns/point — noise next to the
    ~50 us/row it replaces). Pole handling mirrors the scalar branches
    (sin >= 1 -> y=0, sin <= -1 -> y=1) instead of project_np's clamp."""
    x = lon / 360.0 + 0.5
    sin = np.sin(np.radians(lat))
    y = np.empty_like(sin)
    hi = sin >= 1.0
    lo = sin <= -1.0
    safe = ~(hi | lo)
    y[hi] = 0.0
    y[lo] = 1.0
    ratio = (1.0 + sin[safe]) / (1.0 - sin[safe])
    logs = np.fromiter((math.log(r) for r in ratio),
                       dtype=np.float64, count=len(ratio))
    y[safe] = np.clip(0.5 - 0.25 * logs / math.pi, 0.0, 1.0)
    return x, y


def tile_number_np(lat: np.ndarray, lon: np.ndarray, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    n = 1 << zoom
    xt = ((lon + 180.0) / 360.0 * n).astype(np.int64)
    yt = ((1.0 - np.arcsinh(np.tan(np.radians(lat))) / np.pi) / 2.0 * n).astype(np.int64)
    return np.clip(xt, 0, n - 1), np.clip(yt, 0, n - 1)


# ------------------------------------------------------------- Spark columns

def tile_x_col(lon_col, zoom: int):
    """Spark Column: slippy xtile of a longitude column at ``zoom``."""
    from pyspark.sql import functions as F

    lon = F.col(lon_col) if isinstance(lon_col, str) else lon_col
    n = 1 << zoom
    xt = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n))
    return F.least(F.greatest(xt, F.lit(0)), F.lit(n - 1)).cast("long")


def tile_y_col(lat_col, zoom: int):
    """Spark Column: slippy ytile of a latitude column at ``zoom``."""
    from pyspark.sql import functions as F

    lat = F.col(lat_col) if isinstance(lat_col, str) else lat_col
    n = 1 << zoom
    lat_r = F.radians(lat)
    yt = F.floor(
        (F.lit(1.0) - F.asinh(F.tan(lat_r)) / F.lit(math.pi)) / F.lit(2.0) * F.lit(n)
    )
    return F.least(F.greatest(yt, F.lit(0)), F.lit(n - 1)).cast("long")
