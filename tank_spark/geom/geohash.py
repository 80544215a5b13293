"""Geohash encode/decode — the reference's geohash.kt surface.

DEAD CODE in the reference (GeoHashUtils has zero call sites; SURVEY.md
§2.7 documented the skip through r12) — implemented in r13 so the
reference inventory is total. Both engines implement the same public
Wikipedia algorithm the reference cites; semantics matched exactly:

* fixed 12-character precision by default (geohash.kt PRECISION);
* the bisection comparison is strict ``value > mid`` (geohash.kt:45,54)
  — a coordinate exactly on a bisection boundary takes the LOW cell;
* decode returns the CELL CENTER as (lat, lon) (geohash.kt:108-110).

The bisection endpoints are exactly representable doubles (±180/±90
halved repeatedly), so encode/decode are bit-deterministic.

This is planning-level math like the rest of geom/ — not a hot loop
anywhere (no reference call sites to be hot). SQL registration rides
``functions.geo.register_sql_functions`` as a documented-slow-path UDF,
same as the WKT helpers.
"""

from __future__ import annotations

BASE_32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_DECODE_MAP = {c: i for i, c in enumerate(BASE_32)}
PRECISION = 12  # geohash.kt:15
_BITS = (16, 8, 4, 2, 1)


def encode(latitude: float, longitude: float,
           precision: int = PRECISION) -> str:
    """Encode (lat, lon) to a geohash string (geohash.kt:31-73)."""
    lat_lo, lat_hi = -90.0, 90.0
    lng_lo, lng_hi = -180.0, 180.0
    out: list[str] = []
    is_even = True
    bit = 0
    ch = 0
    while len(out) < precision:
        if is_even:
            mid = (lng_lo + lng_hi) / 2.0
            if longitude > mid:
                ch |= _BITS[bit]
                lng_lo = mid
            else:
                lng_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2.0
            if latitude > mid:
                ch |= _BITS[bit]
                lat_lo = mid
            else:
                lat_hi = mid
        is_even = not is_even
        if bit < 4:
            bit += 1
        else:
            out.append(BASE_32[ch])
            bit = 0
            ch = 0
    return "".join(out)


def decode(geohash: str) -> tuple[float, float]:
    """Decode a geohash to its cell-center (lat, lon)
    (geohash.kt:81-113). Raises KeyError on non-base32 characters, like
    the reference's null-asserted map lookup."""
    lat_lo, lat_hi = -90.0, 90.0
    lng_lo, lng_hi = -180.0, 180.0
    is_even = True
    for c in geohash:
        cd = _DECODE_MAP[c]
        for mask in _BITS:
            if is_even:
                if cd & mask:
                    lng_lo = (lng_lo + lng_hi) / 2.0
                else:
                    lng_hi = (lng_lo + lng_hi) / 2.0
            else:
                if cd & mask:
                    lat_lo = (lat_lo + lat_hi) / 2.0
                else:
                    lat_hi = (lat_lo + lat_hi) / 2.0
            is_even = not is_even
    return (lat_lo + lat_hi) / 2.0, (lng_lo + lng_hi) / 2.0
